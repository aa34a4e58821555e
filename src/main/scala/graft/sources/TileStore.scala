package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * Raster tile ingestion + spatially-partitioned tile storage — the
 * reference's `tileFile` CSV loader (STSparkContext.scala:460-531),
 * `objectTiles` (:533-553) and partitioned `RasterRDD.save`
 * (RasterRDD.scala:87-134), re-expressed on Spark sources.
 *
 * CSV format, one tile per line: `ulx,uly,width,height,pixel_width,v1,...,
 * v_{width*height}` (row-major from the top row — the reference's layout;
 * trailing SMA fields are tolerated and ignored, we recompute stats from
 * the data column instead of trusting the file).
 *
 * The parquet store replaces the reference's Kryo `objectTiles`: tiles are
 * written partitioned by the grid cell of their anchor, so a query box
 * prunes whole cell directories at file-listing time (same layout contract
 * as [[CellStore]]; parquet column stats cover everything else).
 */
object TileStore {

  /** Write tiles as the reference's CSV tile format. Null pixels are
    * written as the literal `null` (concat_ws would silently DROP a null
    * element, shifting every later pixel by one slot); `loadCsv`'s long
    * cast turns the literal back into a null pixel. */
  def saveCsv(tiles: DataFrame, path: String): Unit =
    tiles.select(concat_ws(",",
        col("ulx"), col("uly"), col("width"), col("height"), col("pixel_width"),
        concat_ws(",", transform(col("data"),
          x => coalesce(x.cast("string"), lit("null"))))).as("value"))
      .write.mode("overwrite").text(path)

  /** Load the reference CSV tile format (extra trailing fields ignored). */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(split(col("value"), ",").as("__a"))
      .select(
        element_at(col("__a"), 1).cast("double").as("ulx"),
        element_at(col("__a"), 2).cast("double").as("uly"),
        element_at(col("__a"), 3).cast("int").as("width"),
        element_at(col("__a"), 4).cast("int").as("height"),
        element_at(col("__a"), 5).cast("double").as("pixel_width"),
        col("__a"))
      .select(col("ulx"), col("uly"), col("width"), col("height"), col("pixel_width"),
        transform(slice(col("__a"), lit(6), col("width") * col("height")),
          x => x.cast("long")).as("data"))

  /** Storage element types for the pixel column — the reference's
    * `Tile[U]` axis (reference src/main/scala/dbis/stark/raster/
    * Tile.scala:15-18 supports Byte/Int/Double tiles). The COMPUTE path
    * stays `array<long>` everywhere (one kernel set, like the reference's
    * generic ops); the element type is a STORAGE codec: `byte` packs
    * pixels into a parquet BINARY (1 byte/pixel — 8× smaller than
    * array<long> for imagery), `int` stores array<int>, `long` is the
    * historical layout. The choice is frozen in a `_graft_tile_elem`
    * sidecar and decoding is transparent to every reader. */
  val ElemTypes: Set[String] = Set("byte", "int", "long")
  private val ElemSidecar = "_graft_tile_elem"

  /** Pack long pixels into bytes — loud on overflow and on null pixels
    * (a 1-byte codec has no null slot; keep `long` for nullable data). */
  private def packBytes = udf { xs: Seq[java.lang.Long] =>
    if (xs == null) null
    else {
      val out = new Array[Byte](xs.length)
      var i = 0
      while (i < xs.length) {
        val v = xs(i)
        require(v != null,
          "TileStore: elementType=byte cannot store null pixels — use long")
        require(v >= Byte.MinValue && v <= Byte.MaxValue,
          s"TileStore: pixel value $v does not fit elementType=byte")
        out(i) = v.toByte; i += 1
      }
      out
    }
  }

  private def unpackBytes = udf { bs: Array[Byte] =>
    if (bs == null) null
    else {
      val out = new Array[Long](bs.length)
      var i = 0
      while (i < bs.length) { out(i) = bs(i).toLong; i += 1 }
      out
    }
  }

  /** Encode the long compute representation into the stored element type. */
  private def encodeData(elementType: String): Column = elementType match {
    case "byte" => packBytes(col("data"))
    case "int" => transform(col("data"), x =>
      when(x.isNull, raise_error(lit(
          "TileStore: elementType=int cannot store null pixels — use long")))
        .when(x.between(Int.MinValue.toLong, Int.MaxValue.toLong), x.cast("int"))
        .otherwise(raise_error(concat(lit("TileStore: pixel value "), x,
          lit(" does not fit elementType=int"))).cast("int")))
    case "long" => col("data")
  }

  /** Decode a stored pixel column back to the `array<long>` compute
    * representation. The element type is derived from the parquet schema
    * itself — `binary` ⇔ byte, `array<int>` ⇔ int, `array<long>` ⇔ long —
    * never from the sidecar, so a crash between the data overwrite and
    * the sidecar write cannot make a reader skip (or misapply) decoding:
    * the store is self-describing. */
  private def decodeData(df: DataFrame): DataFrame =
    elemTypeOf(df.schema("data").dataType) match {
      case "byte" => df.withColumn("data", unpackBytes(col("data")))
      case "int" => df.withColumn("data", transform(col("data"), _.cast("long")))
      case "long" => df
    }

  private def elemTypeOf(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case BinaryType => "byte"
      case ArrayType(IntegerType, _) => "int"
      case ArrayType(LongType, _) => "long"
      case other => throw new IllegalStateException(
        s"TileStore: unrecognized pixel column type $other — not a tile store")
    }
  }

  /** The store's pixel element type, derived from the data column's
    * parquet type (the authoritative record — see [[decodeData]]). The
    * `_graft_tile_elem` sidecar is still written as a human/tooling
    * breadcrumb but is never load-bearing. */
  def storedElemType(spark: SparkSession, path: String): String =
    elemTypeOf(spark.read.parquet(path).schema("data").dataType)

  /** Save tiles as parquet partitioned by the anchor's grid cell; one file
    * per cell directory (repartition before write — essential at scale).
    * `elementType` picks the pixel storage width (see [[ElemTypes]]). */
  def save(tiles: DataFrame, path: String, cellSize: Double,
           elementType: String = "long"): Unit = {
    require(ElemTypes.contains(elementType),
      s"TileStore.save: elementType must be one of $ElemTypes, got $elementType")
    require(!tiles.columns.exists(c =>
      c.equalsIgnoreCase("part_tcx") || c.equalsIgnoreCase("part_tcy")),
      "TileStore.save: input must not contain columns named part_tcx/part_tcy")
    tiles
      .withColumn("data", encodeData(elementType))
      .withColumn("part_tcx", floor(col("ulx") / cellSize).cast("int"))
      .withColumn("part_tcy", floor(col("uly") / cellSize).cast("int"))
      .repartition(col("part_tcx"), col("part_tcy"))
      .write.mode("overwrite")
      .partitionBy("part_tcx", "part_tcy")
      .parquet(path)
    // breadcrumb only: readers derive the element type from the parquet
    // schema (self-describing), so a crash before this line leaves a
    // fully readable store, not a long-misread byte store
    Sidecar.writeText(tiles.sparkSession, s"$path/$ElemSidecar", elementType)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    decodeData(spark.read.parquet(path).drop("part_tcx", "part_tcy"))

  /**
   * Load only tiles whose extent STRICTLY overlaps the query box (positive
   * area — touching tiles carry no overlapping pixels). Partition pruning
   * happens on the anchor-cell directory columns: a tile's anchor is its
   * upper-left corner, so anchors of overlapping tiles lie in
   * [x0 - maxTileSpan, x1] × [y0, y1 + maxTileSpan]; `maxTileSpan` is the
   * largest tile extent in world units the store may contain. The exact
   * bounds refine runs on the pruned scan only.
   */
  def loadIntersecting(spark: SparkSession, path: String,
                       x0: Double, y0: Double, x1: Double, y1: Double,
                       cellSize: Double, maxTileSpan: Double): DataFrame = {
    val cx0 = math.floor((x0 - maxTileSpan) / cellSize).toInt
    val cx1 = math.floor(x1 / cellSize).toInt
    val cy0 = math.floor(y0 / cellSize).toInt
    val cy1 = math.floor((y1 + maxTileSpan) / cellSize).toInt
    // decode AFTER the metadata-only filters: pruning and the extent
    // refine never touch the pixel column, whatever width it is stored at
    decodeData(
      spark.read.parquet(path)
        .filter(col("part_tcx") >= cx0 && col("part_tcx") <= cx1 &&
                col("part_tcy") >= cy0 && col("part_tcy") <= cy1)
        .drop("part_tcx", "part_tcy")
        .filter(col("ulx") < x1 &&
                col("ulx") + col("width") * col("pixel_width") > x0 &&
                col("uly") > y0 &&
                col("uly") - col("height") * col("pixel_width") < y1))
  }
}
