package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  /** Save tiles as parquet partitioned by the anchor's grid cell; one file
    * per cell directory (repartition before write — essential at scale). */
  def save(tiles: DataFrame, path: String, cellSize: Double): Unit = {
    require(!tiles.columns.exists(c =>
      c.equalsIgnoreCase("part_tcx") || c.equalsIgnoreCase("part_tcy")),
      "TileStore.save: input must not contain columns named part_tcx/part_tcy")
    tiles
      .withColumn("part_tcx", floor(col("ulx") / cellSize).cast("int"))
      .withColumn("part_tcy", floor(col("uly") / cellSize).cast("int"))
      .repartition(col("part_tcx"), col("part_tcy"))
      .write.mode("overwrite")
      .partitionBy("part_tcx", "part_tcy")
      .parquet(path)
  }

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("part_tcx", "part_tcy")

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
    spark.read.parquet(path)
      .filter(col("part_tcx") >= cx0 && col("part_tcx") <= cx1 &&
              col("part_tcy") >= cy0 && col("part_tcy") <= cy1)
      .drop("part_tcx", "part_tcy")
      .filter(col("ulx") < x1 &&
              col("ulx") + col("width") * col("pixel_width") > x0 &&
              col("uly") > y0 &&
              col("uly") - col("height") * col("pixel_width") < y1)
  }
}
