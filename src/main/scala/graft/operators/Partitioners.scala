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
    val sorted = df.sort(xCol, tieBreak)
    val schema = sorted.schema.add("__gidx", org.apache.spark.sql.types.LongType, nullable = false)
    // localCheckpoint: downstream actions reuse ONE materialized sort+index
    // instead of re-running the sort per action, and n is taken from the
    // same materialization the indexes came from (a separate df.count()
    // could disagree if the input is nondeterministic)
    val idxd = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      }, schema).localCheckpoint()
    val n = idxd.count()
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
                 maxCost: Long): Seq[BspRegion] =
    bspRegionsFromHist(cellHistogram(df, xCol, yCol, cellSize), maxCost)

  /** Per-cell count histogram — one distributed groupBy, collected (cell
    * count is the driver-memory bound, same contract as before). */
  private def cellHistogram(df: DataFrame, xCol: Column, yCol: Column,
                            cellSize: Double): Map[(Int, Int), Long] =
    df.groupBy(
        floor(xCol / cellSize).cast("int").as("cx"),
        floor(yCol / cellSize).cast("int").as("cy"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap

  private def bspRegionsFromHist(hist: Map[(Int, Int), Long],
                                 maxCost: Long): Seq[BspRegion] = {
    if (hist.isEmpty) return Seq.empty
    val cells = hist.toArray
    val xs = hist.keys.map(_._1); val ys = hist.keys.map(_._2)

    // Sparse marginal scans over the OCCUPIED cells only: a dense
    // prefix-sum array over the bounding box is O(area) driver memory —
    // two far-apart points with a fine cellSize would try to allocate the
    // whole empty grid. Splitting a region costs O(occupied-in-region +
    // region width + region height) with O(occupied) memory; the recursion
    // total is O(occupied × depth) — the histogram, never the bbox.
    val out = mutable.ArrayBuffer.empty[BspRegion]
    val queue = mutable.Stack(BspRegion(xs.min, ys.min, xs.max + 1, ys.max + 1,
      hist.valuesIterator.sum))
    while (queue.nonEmpty) {
      val r = queue.pop()
      val splittable = (r.x1 - r.x0) > 1 || (r.y1 - r.y0) > 1
      if (r.cost <= maxCost || !splittable) out += r
      else {
        val mx = mutable.LongMap.empty[Long]
        val my = mutable.LongMap.empty[Long]
        cells.foreach { case ((cx, cy), c) =>
          if (cx >= r.x0 && cx < r.x1 && cy >= r.y0 && cy < r.y1) {
            mx(cx) = mx.getOrElse(cx, 0L) + c
            my(cy) = my.getOrElse(cy, 0L) + c
          }
        }
        // candidate splits along both axes; pick the most balanced
        // (x candidates first, earliest boundary wins ties — the order the
        // dense-prefix formulation had)
        var best: (Long, BspRegion, BspRegion) = null
        var run = 0L
        var sx = r.x0 + 1
        while (sx < r.x1) {
          run += mx.getOrElse(sx - 1, 0L)
          val bal = math.abs(2 * run - r.cost)
          if (best == null || bal < best._1)
            best = (bal, BspRegion(r.x0, r.y0, sx, r.y1, run),
              BspRegion(sx, r.y0, r.x1, r.y1, r.cost - run))
          sx += 1
        }
        run = 0L
        var sy = r.y0 + 1
        while (sy < r.y1) {
          run += my.getOrElse(sy - 1, 0L)
          val bal = math.abs(2 * run - r.cost)
          // best == null when the region has width 1 (no x candidates) —
          // then a y split MUST be taken or we'd NPE on skewed single-column data
          if (best == null || bal < best._1)
            best = (bal, BspRegion(r.x0, r.y0, r.x1, sy, run),
              BspRegion(r.x0, sy, r.x1, r.y1, r.cost - run))
          sy += 1
        }
        queue.push(best._2); queue.push(best._3)
      }
    }
    out.toSeq
  }

  /** Apply BSP: broadcast the region list, assign each row its region index,
    * repartition by it. Rows outside every region (cells with no histogram
    * entry can't exist by construction) would get -1. */
  def bspPartition(df: DataFrame, xCol: Column, yCol: Column, cellSize: Double,
                   maxCost: Long): DataFrame = {
    val hist = cellHistogram(df, xCol, yCol, cellSize)
    val regions = bspRegionsFromHist(hist, maxCost)
    val spark = df.sparkSession
    // resolve each OCCUPIED cell to its region once on the driver (cells
    // are already collected for the histogram) and broadcast the map —
    // row assignment is then one hash lookup, not a linear region scan
    val cellRegion: Map[Long, Int] = hist.keys.map { case (cx, cy) =>
      val idx = regions.indexWhere(r =>
        cx >= r.x0 && cx < r.x1 && cy >= r.y0 && cy < r.y1)
      ((cx.toLong << 32) | (cy.toLong & 0xffffffffL), idx)
    }.toMap
    val bc = spark.sparkContext.broadcast(cellRegion)
    val assign = udf { (x: Double, y: Double) =>
      val cx = math.floor(x / cellSize).toInt
      val cy = math.floor(y / cellSize).toInt
      bc.value.getOrElse((cx.toLong << 32) | (cy.toLong & 0xffffffffL), -1)
    }
    df.withColumn("part_id", assign(xCol, yCol))
      .repartition(math.max(regions.size, 1), col("part_id"))
  }
}
