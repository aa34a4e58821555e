package graft.operators

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import scala.collection.mutable

/**
 * Spatial / temporal partitioning operators — the reference's partitioner
 * suite (reference src/main/scala/dbis/stark/spatial/partitioner: grid, BSP
 * cost-based, temporal range, spatio-temporal composite; SURVEY §2.10),
 * re-expressed as *computed partition-key columns* + `repartition`. Physical
 * co-location then comes from Spark's hash/range exchange, and any
 * downstream cell-key join or aggregation reuses the shuffle.
 */
object Partitioners {

  /** Fixed uniform grid: partition key = grid cell of the geometry centroid
    * (reference SpatialGridPartitioner). */
  def gridPartition(df: DataFrame, geo: Column, cellSize: Double,
                    numPartitions: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn("part_cell", stf.st_cell(geo, lit(cellSize)))
      .repartition(numPartitions, col("part_cell"))
  }

  /** Temporal range partitioning on a long epoch column (reference
    * TemporalRangePartitioner): `repartitionByRange` samples bounds. */
  def temporalRangePartition(df: DataFrame, tCol: Column,
                             numPartitions: Int): DataFrame =
    df.repartitionByRange(numPartitions, tCol)

  /** Two-level spatio-temporal composite key (reference SpatioTempPartitioner):
    * spatial cell + time bucket. */
  def spatioTemporalPartition(df: DataFrame, geo: Column, tCol: Column,
                              cellSize: Double, timeBucket: Long,
                              numPartitions: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn("part_cell", stf.st_cell(geo, lit(cellSize)))
      .withColumn("part_tbucket", floor(tCol / timeBucket).cast("long"))
      .repartition(numPartitions, col("part_cell"), col("part_tbucket"))
  }

  /**
   * STR (Sort-Tile-Recursive) packing — the R-tree bulk-load leaf rule
   * (reference RTreePartitioner.scala:11-118 samples the data into an
   * R-tree and partitions by its leaf MBRs; STR packing is exactly how an
   * STRtree forms leaves, computed here declaratively and exactly): rows
   * ordered by (x, tie) split into s = ceil(√P) equal-count vertical
   * slices, each slice ordered by (y, tie) split into s runs — near-square,
   * count-balanced spatial partitions.
   *
   * The only global step is the distributed range-partitioned sort +
   * `zipWithIndex` for slice assignment (no driver collect); runs use a
   * window partitioned by slice. Both levels size groups by the SQL-standard
   * ntile rule, so an external oracle reproduces the exact partition ids.
   */
  def strPartition(df: DataFrame, xCol: Column, yCol: Column, tieBreak: Column,
                   numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val s = math.ceil(math.sqrt(numPartitions)).toInt
    val spark = df.sparkSession
    // ntile group of 0-based idx among n rows: first n%s groups get one extra
    def tile(idx: Column, n: Column): Column = {
      val q = floor(n / s).cast("long")
      val r = pmod(n, lit(s.toLong))
      when(idx < r * (q + 1), floor(idx / (q + 1)))
        .otherwise(r + floor((idx - r * (q + 1)) / greatest(q, lit(1L))))
        .cast("long")
    }
    val n = df.count()
    val sorted = df.sort(xCol, tieBreak)
    val schema = sorted.schema.add("__gidx", org.apache.spark.sql.types.LongType, nullable = false)
    val idxd = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      }, schema)
    import org.apache.spark.sql.expressions.Window
    val wSlice = Window.partitionBy(col("__part_slice"))
    idxd.withColumn("__part_slice", tile(col("__gidx"), lit(n)))
      .withColumn("__sidx",
        (row_number().over(wSlice.orderBy(yCol, tieBreak)) - 1).cast("long"))
      .withColumn("__scnt", count(lit(1)).over(wSlice))
      .withColumn("part_str", col("__part_slice") * s + tile(col("__sidx"), col("__scnt")))
      .drop("__gidx", "__part_slice", "__sidx", "__scnt")
      .repartition(s * s, col("part_str"))
  }

  /** A BSP split: right-open rectangle in cell-index space with its cost. */
  final case class BspRegion(x0: Int, y0: Int, x1: Int, y1: Int, cost: Long)

  /**
   * Cost-based binary space partitioning (reference BSPartitioner/BSP2, the
   * MR-DBSCAN strategy): build a per-cell count histogram (one distributed
   * groupBy), then recursively split the cell grid on the driver along cell
   * boundaries, always splitting the most expensive region at the boundary
   * that best balances cost, until every region's cost <= maxCost or it is
   * a single cell. Returns the regions; [[bspPartition]] applies them.
   */
  def bspRegions(df: DataFrame, xCol: Column, yCol: Column, cellSize: Double,
                 maxCost: Long): Seq[BspRegion] = {
    val hist = df.groupBy(
        floor(xCol / cellSize).cast("int").as("cx"),
        floor(yCol / cellSize).cast("int").as("cy"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    if (hist.isEmpty) return Seq.empty
    val xs = hist.keys.map(_._1); val ys = hist.keys.map(_._2)
    val (xMin, yMin) = (xs.min, ys.min)
    val (w, h) = (xs.max - xMin + 1, ys.max - yMin + 1)

    // 2-D prefix sums over the occupied bounding box: every split-candidate
    // cost query is O(1) instead of O(area) — the driver-side recursion
    // stays cheap even for fine cell grids.
    val pre = Array.ofDim[Long](w + 1, h + 1)
    for (x <- 0 until w; y <- 0 until h)
      pre(x + 1)(y + 1) = hist.getOrElse((x + xMin, y + yMin), 0L) +
        pre(x)(y + 1) + pre(x + 1)(y) - pre(x)(y)

    def cost(x0: Int, y0: Int, x1: Int, y1: Int): Long = {
      val a = x0 - xMin; val b = y0 - yMin; val c = x1 - xMin; val d = y1 - yMin
      pre(c)(d) - pre(a)(d) - pre(c)(b) + pre(a)(b)
    }

    val out = mutable.ArrayBuffer.empty[BspRegion]
    val queue = mutable.Stack(BspRegion(xs.min, ys.min, xs.max + 1, ys.max + 1,
      cost(xs.min, ys.min, xs.max + 1, ys.max + 1)))
    while (queue.nonEmpty) {
      val r = queue.pop()
      val splittable = (r.x1 - r.x0) > 1 || (r.y1 - r.y0) > 1
      if (r.cost <= maxCost || !splittable) out += r
      else {
        // candidate splits along both axes; pick the most balanced
        val cands =
          (r.x0 + 1 until r.x1).map { sx =>
            val c1 = cost(r.x0, r.y0, sx, r.y1)
            (math.abs(2 * c1 - r.cost),
              BspRegion(r.x0, r.y0, sx, r.y1, c1),
              BspRegion(sx, r.y0, r.x1, r.y1, r.cost - c1))
          } ++
          (r.y0 + 1 until r.y1).map { sy =>
            val c1 = cost(r.x0, r.y0, r.x1, sy)
            (math.abs(2 * c1 - r.cost),
              BspRegion(r.x0, r.y0, r.x1, sy, c1),
              BspRegion(r.x0, sy, r.x1, r.y1, r.cost - c1))
          }
        val (_, a, b) = cands.minBy(_._1)
        queue.push(a); queue.push(b)
      }
    }
    out.toSeq
  }

  /** Apply BSP: broadcast the region list, assign each row its region index,
    * repartition by it. Rows outside every region (cells with no histogram
    * entry can't exist by construction) would get -1. */
  def bspPartition(df: DataFrame, xCol: Column, yCol: Column, cellSize: Double,
                   maxCost: Long): DataFrame = {
    val regions = bspRegions(df, xCol, yCol, cellSize, maxCost)
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      regions.toArray.map(r => (r.x0, r.y0, r.x1, r.y1)))
    val assign = udf { (x: Double, y: Double) =>
      val cx = math.floor(x / cellSize).toInt
      val cy = math.floor(y / cellSize).toInt
      val rs = bc.value
      var i = 0
      var found = -1
      while (found < 0 && i < rs.length) {
        val r = rs(i)
        if (cx >= r._1 && cx < r._3 && cy >= r._2 && cy < r._4) found = i
        i += 1
      }
      found
    }
    df.withColumn("part_id", assign(xCol, yCol))
      .repartition(math.max(regions.size, 1), col("part_id"))
  }
}
