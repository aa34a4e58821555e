package graft.operators

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Raster (tile) algebra — the reference's `RasterRDD` surface (reference
 * src/main/scala/dbis/stark/raster package: Tile, RasterRDD,
 * RasterFilterVectorRDD, RasterJoinVectorRDD, RasterJoinRDD, rasterize)
 * re-expressed on DataFrames.
 *
 * A tile is an open struct of columns — `ulx, uly` (upper-left anchor),
 * `width, height` (pixels), `pixel_width`, `data` (row-major from the top
 * row, `array<long>`) — so Catalyst prunes/pushes through tile metadata and
 * only pixel-touching operators read `data`. All pixel manipulation uses
 * codegen'd built-ins (`transform`/`zip_with`/`aggregate`/`element_at`);
 * nothing is a UDF.
 *
 * Pixel/grid contract: pixel (row r from top, col c) of a tile covers
 * x ∈ [ulx + c·pw, +pw), y ∈ [uly − (r+1)·pw, uly − r·pw).
 */
object Raster {

  val tileCols: Seq[String] = Seq("ulx", "uly", "width", "height", "pixel_width", "data")

  /**
   * Vector→raster: grid points into W×H-pixel tiles, pixel value = point
   * count (reference `rasterize`, PlainSpatialRDDFunctions.scala:639-669).
   * Only non-empty tiles are produced. One shuffle (groupBy tile+pixel),
   * then a map-side array assembly per tile.
   */
  def rasterize(df: DataFrame, xCol: Column, yCol: Column,
                pixelWidth: Double, tileW: Int, tileH: Int): DataFrame = {
    require(pixelWidth > 0, s"rasterize: pixelWidth must be positive, got $pixelWidth")
    require(tileW > 0 && tileH > 0,
      s"rasterize: tile dimensions must be positive, got ${tileW}x$tileH")
    val gx = floor(xCol / pixelWidth).cast("long")
    val gy = floor(yCol / pixelWidth).cast("long")
    val tx = floor(gx / tileW).cast("long")
    val ty = floor(gy / tileH).cast("long")
    val pix = ((lit(tileH - 1) - (gy - ty * tileH)) * tileW + (gx - tx * tileW)).cast("int")
    df.groupBy(tx.as("__tx"), ty.as("__ty"), pix.as("__pix"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__tx"), col("__ty"))
      .agg(map_from_entries(collect_list(struct(col("__pix"), col("__c")))).as("__m"))
      .select(
        (col("__tx") * (tileW * pixelWidth)).as("ulx"),
        ((col("__ty") + 1) * (tileH * pixelWidth)).as("uly"),
        lit(tileW).as("width"), lit(tileH).as("height"),
        lit(pixelWidth).as("pixel_width"),
        transform(sequence(lit(0), lit(tileW * tileH - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("data"))
  }

  /** Tile bounding box as an stobj — the SQL-registered `st_geomfromtile`
    * (reference sql/raster/RasterFunction.scala) over the open tile struct. */
  def tileGeom(df: DataFrame): Column = {
    GraftFunctions.register(df.sparkSession)
    stf.st_geomfromtile(col("ulx"), col("uly"), col("width"), col("height"),
      col("pixel_width"))
  }

  /**
   * Filter + clip to a pixel-aligned box (reference raster filter: keep
   * tiles matching the query, output = MBR of tile ∩ query;
   * RasterFilterVectorRDD.scala:10-53). The box must be pixel-aligned;
   * result tiles are the per-tile sub-rectangles.
   */
  def filterClip(tiles: DataFrame, x0: Double, y0: Double, x1: Double, y1: Double): DataFrame = {
    val pw = col("pixel_width")
    val ix0 = greatest(col("ulx"), lit(x0))
    val ix1 = least(col("ulx") + col("width") * pw, lit(x1))
    val iy0 = greatest(col("uly") - col("height") * pw, lit(y0))
    val iy1 = least(col("uly"), lit(y1))
    // quotients are exact integers in real arithmetic (pixel-aligned box
    // contract) — round, don't truncate: a one-ulp-low double quotient
    // under a truncating cast would shear off a row/column
    val nw = round((ix1 - ix0) / pw).cast("int")
    val nh = round((iy1 - iy0) / pw).cast("int")
    val c0 = round((ix0 - col("ulx")) / pw).cast("int")
    val r0 = round((col("uly") - iy1) / pw).cast("int")
    tiles.filter(ix1 > ix0 && iy1 > iy0)
      .select(ix0.as("__ulx"), iy1.as("__uly"), nw.as("__w"), nh.as("__h"), pw.as("__pw"),
        c0.as("__c0"), r0.as("__r0"), col("width").as("__ow"), col("data").as("__d"))
      .select(col("__ulx").as("ulx"), col("__uly").as("uly"),
        col("__w").as("width"), col("__h").as("height"), col("__pw").as("pixel_width"),
        transform(sequence(lit(0), col("__w") * col("__h") - 1),
          i => element_at(col("__d"),
            (col("__r0") + floor(i / col("__w")).cast("int")) * col("__ow") +
            col("__c0") + pmod(i, col("__w")) + 1)).as("data"))
  }

  /**
   * Filter + clip against an ARBITRARY vector geometry with default fill —
   * the reference's raster-filter-by-vector (RasterFilterVectorRDD.scala:
   * 10-53 + RasterUtils.getPixels:128-205). Tiles whose bounds satisfy
   * `pred` against `qry` emit one tile over the MBR of (tile ∩ qry); pixels
   * outside the geometry get `default`. Pixel match mode follows the
   * reference: rectangle-intersects for [[JoinPredicate.Intersects]],
   * rectangle-contained-in-qry for every other predicate.
   *
   * The per-tile kernel is [[graft.functions.RasterOps.clipTile]] (one
   * prepared-geometry probe per pixel, one eval per tile); the tile-level
   * gate stays a codegen'd predicate so partition pruning over a cell store
   * still applies before any pixel work.
   */
  def filterGeom(tiles: DataFrame, qry: Column,
                 pred: JoinPredicate = JoinPredicate.Intersects,
                 default: Long = 0L): DataFrame = {
    GraftFunctions.register(tiles.sparkSession)
    val isIntersects = pred == JoinPredicate.Intersects
    tiles
      .filter(pred.apply(tileGeom(tiles), qry))
      .select(stf.st_clip_tile(col("ulx"), col("uly"), col("width"), col("height"),
        col("pixel_width"), col("data"), qry, lit(isIntersects), lit(default)).as("__ct"))
      .filter(col("__ct").isNotNull)
      .select(tileCols.map(c => col("__ct." + c).as(c)): _*)
  }

  /** Per-tile stats: min / max / lower-median / zero-pixel count — the
    * reference's SMA accessors r_min/r_max/r_median + countValue. */
  def withTileStats(tiles: DataFrame): DataFrame =
    tiles
      .withColumn("t_min", array_min(col("data")))
      .withColumn("t_max", array_max(col("data")))
      .withColumn("t_median",
        element_at(sort_array(col("data")), ((size(col("data")) + 1) / 2).cast("int")))
      .withColumn("zero_pixels",
        size(filter(col("data"), v => v === 0L)).cast("long"))

  /** Count pixels equal to `v` across the whole raster (reference
    * `countValue`; SMA-style skip happens via min/max prefilter). */
  def countValue(tiles: DataFrame, v: Long): DataFrame =
    tiles
      .filter(array_min(col("data")) <= v && array_max(col("data")) >= v)
      // coalesce: when the SMA prefilter removes every tile the sum over
      // zero rows is null, but the reference returns 0
      .select(coalesce(sum(size(filter(col("data"), x => x === v))), lit(0L))
        .cast("long").as("cnt"))

  /** Does any tile contain value v (reference `hasValue`). */
  def hasValue(tiles: DataFrame, v: Long): Boolean =
    !tiles.filter(array_min(col("data")) <= v && array_max(col("data")) >= v)
      .filter(exists(col("data"), x => x === v)).isEmpty

  /** Raster-wide histogram by pixel value (reference CalcRasterHistogram —
    * bucket width 1; per-tile partial maps merge in the groupBy). */
  def valueHistogram(tiles: DataFrame): DataFrame =
    tiles.select(explode(col("data")).as("pixel_value"))
      .groupBy(col("pixel_value")).agg(count(lit(1)).as("cnt"))

  /**
   * [[valueHistogram]]'s fast path for BYTE-valued rasters (the reference's
   * `createByteHistogram`, RasterUtils.scala:53-71): pixel values fit
   * [-128, 127], so each tile folds locally into a fixed 256-slot count
   * array in one pass — no per-pixel explode — and the shuffle carries at
   * most 256 keys per task. Output schema and rows are identical to
   * [[valueHistogram]] (zero-count values omitted); a pixel outside the
   * byte range fails loudly rather than silently mis-binning.
   */
  def byteValueHistogram(tiles: DataFrame): DataFrame = {
    val localCounts = udf { xs: Seq[Long] =>
      val out = new Array[Long](256)
      if (xs != null) xs.foreach { v =>
        require(v >= Byte.MinValue && v <= Byte.MaxValue,
          s"byteValueHistogram: pixel value $v outside the byte range — " +
          "use valueHistogram for wider rasters")
        out((v + 128).toInt) += 1
      }
      out
    }
    tiles.select(posexplode(localCounts(col("data"))).as(Seq("__slot", "__n")))
      .filter(col("__n") > 0)
      .groupBy((col("__slot") - 128).cast("long").as("pixel_value"))
      .agg(sum(col("__n")).as("cnt"))
  }

  /**
   * Equi-width bucket histogram over the whole raster (reference
   * `createByteHistogram`, RasterUtils.scala:53-71, distributed): global
   * [min, max] in one scan, step = floor((max-min)/buckets) + 1 — the
   * smallest width that places the MAX value inside bucket `buckets-1`
   * (a ceil((max-min)/buckets) step drops every max-valued pixel whenever
   * the range is an exact multiple of the bucket count). Bucket i spans
   * [min + step·i, min(min + step·(i+1) - 1, max)]. All `buckets` rows are
   * emitted, zero-count ones included, exactly like the reference
   * (trailing buckets past max keep their nominal bounds).
   *
   * Two jobs total: a scalar min/max agg (broadcast back as a 1-row cross
   * join, no driver round-trip in the plan) and one explode+groupBy with
   * map-side partial aggregation.
   */
  def bucketHistogram(tiles: DataFrame, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val mm = tiles.agg(min(array_min(col("data"))).as("__mn"),
                       max(array_max(col("data"))).as("__mx"))
    val step = floor((col("__mx") - col("__mn")) / buckets).cast("long") + 1L
    val counts = tiles.select(explode(col("data")).as("__v"))
      .crossJoin(broadcast(mm))
      .groupBy(floor((col("__v") - col("__mn")) / step).cast("long").as("__bi"))
      .agg(count(lit(1)).as("cnt"))
    mm.select(explode(sequence(lit(0L), lit(buckets - 1L))).as("__bi"),
        col("__mn"), col("__mx"))
      .join(counts, Seq("__bi"), "left")
      .select(
        (col("__mn") + step * col("__bi")).as("bucket_lo"),
        least(col("__mn") + step * (col("__bi") + 1) - 1, col("__mx")).as("bucket_hi"),
        coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** Keep tiles containing ALL the given pixel values (reference
    * `withValues`, RasterRDD.scala:148-155) — SMA-style min/max prefilter
    * first, then the exact per-value membership tests. */
  def withValues(tiles: DataFrame, vs: Long*): DataFrame = {
    require(vs.nonEmpty, "withValues needs at least one value")
    tiles
      .filter(array_min(col("data")) <= vs.min && array_max(col("data")) >= vs.max)
      .filter(vs.map(v => array_contains(col("data"), lit(v))).reduce(_ && _))
  }

  /**
   * Raster ⋈ vector: tiles whose bounds satisfy the spatial predicate
   * against a vector geometry (reference RasterJoinVectorRDD). Joined via
   * the cell-replicate spatial join on the tile bounding geometry.
   */
  def joinVector(tiles: DataFrame, vec: DataFrame, vecGeom: Column,
                 pred: JoinPredicate, cellSize: Double): DataFrame = {
    val withGeom = tiles.withColumn("__tgeo", tileGeom(tiles))
    SpatialJoin.join(withGeom, vec, col("__tgeo"), vecGeom, pred, cellSize)
      .drop("__tgeo")
  }

  /**
   * Load a directory of image files as tiles — the reference's
   * `loadNanoFiles` (STSparkContext.scala:561-621: binaryFiles + grayscale
   * decode, position encoded in the file name as `x_y`). Spark-native:
   * `binaryFile` source → per-partition ImageIO decode (JDK built-in) →
   * tile structs. Pixel value = grayscale level; tile anchor from the
   * file-name coordinates times the image extent.
   */
  def fromImageFiles(spark: org.apache.spark.sql.SparkSession, dir: String,
                     pixelWidth: Double): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("ulx", DoubleType, nullable = false),
      StructField("uly", DoubleType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("pixel_width", DoubleType, nullable = false),
      StructField("data", ArrayType(LongType, containsNull = false), nullable = false)))
    // tolerate stray directory content: files whose basename is not the
    // `tx_ty` position encoding, or that no ImageIO reader can decode
    // (.DS_Store, READMEs...), are skipped instead of poisoning the load
    // strict decimal groups: the permissive [0-9.]+ form also matched
    // multi-dot names like "1.2.3_4" and then crashed toDouble — exactly
    // the stray-file poisoning this filter exists to prevent
    val position = """(-?[0-9]+(?:\.[0-9]+)?)_(-?[0-9]+(?:\.[0-9]+)?)""".r
    spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("content"))
      .mapPartitions { it =>
        it.flatMap { r =>
          val path = r.getString(0)
          val name = path.substring(path.lastIndexOf('/') + 1)
          val dot = name.lastIndexOf('.')
          val base = if (dot < 0) name else name.substring(0, dot)
          base match {
            case position(txs, tys) =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
              if (img == null) Iterator.empty
              else {
                val tx = txs.toDouble; val ty = tys.toDouble
                val w = img.getWidth; val h = img.getHeight
                val data = new Array[Long](w * h)
                var p = 0
                while (p < data.length) {
                  // row-major from the top row; grayscale level from the raster
                  data(p) = img.getRaster.getSample(p % w, p / w, 0).toLong
                  p += 1
                }
                Iterator.single(
                  Row(tx * w * pixelWidth, (ty + 1) * h * pixelWidth, w, h, pixelWidth, data))
              }
            case _ => Iterator.empty
          }
        }
      }(Encoders.row(schema))
  }

  /** Raster ⋈ vector through the per-cell STRtree path (reference's
    * index-accelerated raster join) — same output as [[joinVector]]. */
  def joinVectorIndexed(tiles: DataFrame, vec: DataFrame, vecGeom: String,
                        pred: JoinPredicate, cellSize: Double): DataFrame = {
    val withGeom = tiles.withColumn("__tgeo", tileGeom(tiles))
    SpatialJoin.joinIndexed(withGeom, vec, "__tgeo", vecGeom, pred, cellSize)
      .drop("__tgeo")
  }

  /** Raster ⋈ vector with a per-match tile aggregate (reference
    * `joinWithAggregate`, RasterRDD.scala:70-81) — e.g. max pixel per
    * matched region. */
  def joinVectorAgg(tiles: DataFrame, vec: DataFrame, vecGeom: Column,
                    pred: JoinPredicate, cellSize: Double,
                    agg: Column => Column): DataFrame =
    joinVector(tiles, vec, vecGeom, pred, cellSize)
      .withColumn("tile_agg", agg(col("data")))

  /**
   * Raster ⋈ raster, identical-grid fast path: pixel-level combine of
   * co-located tiles. Tiles match on identical bounds (equi-join —
   * hash-partitioned, no cartesian); `combine` merges pixel pairs.
   * Misaligned grids produce no matches here by construction — use
   * [[joinRasterIntersecting]] for the general intersecting-tile join.
   */
  def joinRaster(a: DataFrame, b: DataFrame,
                 combine: (Column, Column) => Column): DataFrame = {
    val keys = Seq("ulx", "uly", "width", "height", "pixel_width")
    a.as("l").join(b.as("r"), keys)
      .select((keys.map(col) :+
        zip_with(col("l.data"), col("r.data"), combine).as("data")): _*)
  }

  /**
   * General raster ⋈ raster over *intersecting* tiles (reference
   * RasterJoinRDD.scala:20-66 + RasterUtils.mbrToTile:225-243): every pair
   * of tiles with overlapping bounds emits one tile over the intersection
   * MBR at the LEFT side's pixel width; each output pixel samples both
   * parents at the pixel's upper-left position and merges with `combine`.
   *
   * Spark-first shape: the pairing is the same cell-replicate hash join as
   * [[SpatialJoin.join]] (cells exploded from tile bounds, reference-point
   * dedup — no distinct, no cartesian), and the pixel assembly is pure
   * codegen'd built-ins (`transform` + `element_at`). Touching-only pairs
   * (zero-area intersection) are dropped — the reference would emit a
   * zero-pixel tile for them, which carries no information.
   */
  def joinRasterIntersecting(a: DataFrame, b: DataFrame, cellSize: Double,
                             combine: (Column, Column) => Column): DataFrame = {
    GraftFunctions.register(a.sparkSession)
    val r = b.select(tileCols.map(c => col(c).as("r_" + c)): _*)
    val cs = lit(cellSize)
    def box(p: String) =
      stf.st_box(col(p + "ulx"), col(p + "uly") - col(p + "height") * col(p + "pixel_width"),
        col(p + "ulx") + col(p + "width") * col(p + "pixel_width"), col(p + "uly"))
    val l2 = a.withColumn("__rjcell_l", explode(stf.st_cells(box(""), cs)))
    val r2 = r.withColumn("__rjcell_r", explode(stf.st_cells(box("r_"), cs)))
    val joined = l2.join(r2,
        l2("__rjcell_l") === r2("__rjcell_r") &&
        stf.st_ref_cell(box(""), box("r_"), cs, l2("__rjcell_l")))
      .drop("__rjcell_l", "__rjcell_r")
    val ix0 = greatest(col("ulx"), col("r_ulx"))
    val ix1 = least(col("ulx") + col("width") * col("pixel_width"),
                    col("r_ulx") + col("r_width") * col("r_pixel_width"))
    val iy1 = least(col("uly"), col("r_uly"))
    val iy0 = greatest(col("uly") - col("height") * col("pixel_width"),
                       col("r_uly") - col("r_height") * col("r_pixel_width"))
    joined.filter(ix1 > ix0 && iy1 > iy0)
      .select(ix0.as("__jx"), iy1.as("__jy"),
        // ceil covers a genuinely-fractional overlap (sub-pixel-misaligned
        // parents) with a whole output pixel; the 1e-9 guard keeps a
        // one-ulp-high quotient from manufacturing a nonexistent pixel
        // column when grids ARE aligned (ANSI element_at would throw)
        ceil((ix1 - ix0) / col("pixel_width") - 1e-9).cast("int").as("__jw"),
        ceil((iy1 - iy0) / col("pixel_width") - 1e-9).cast("int").as("__jh"),
        col("pixel_width").as("__jpw"),
        col("ulx").as("__lx"), col("uly").as("__ly"), col("width").as("__lw"),
        col("data").as("__ld"),
        col("r_ulx").as("__rx"), col("r_uly").as("__ry"), col("r_width").as("__rw"),
        col("r_pixel_width").as("__rpw"), col("r_data").as("__rd"))
      .select(col("__jx").as("ulx"), col("__jy").as("uly"), col("__jw").as("width"),
        col("__jh").as("height"), col("__jpw").as("pixel_width"),
        transform(sequence(lit(0), col("__jw") * col("__jh") - 1), idx => {
          // pixel upper-left position in world coordinates
          val posX = col("__jx") + pmod(idx, col("__jw")) * col("__jpw")
          val posY = col("__jy") - floor(idx / col("__jw")) * col("__jpw")
          // containing-pixel floor (reference sampling rule), with the
          // same 1e-9 guard so an aligned-grid quotient one ulp BELOW its
          // true integer cannot slip into the previous pixel
          val lv = element_at(col("__ld"),
            floor((col("__ly") - posY) / col("__jpw") + 1e-9).cast("int") * col("__lw") +
            floor((posX - col("__lx")) / col("__jpw") + 1e-9).cast("int") + 1)
          val rv = element_at(col("__rd"),
            floor((col("__ry") - posY) / col("__rpw") + 1e-9).cast("int") * col("__rw") +
            floor((posX - col("__rx")) / col("__rpw") + 1e-9).cast("int") + 1)
          combine(lv, rv)
        }).as("data"))
  }
}
