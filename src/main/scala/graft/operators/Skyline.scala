package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import scala.collection.mutable.ArrayBuffer

/**
 * 2-dimensional skyline (minimize both dimensions).
 *
 * Dominance: a dominates b iff a is <= in both dims and strictly < in at
 * least one (reference src/main/scala/dbis/stark/spatial/Skyline.scala:12-22).
 *
 * Parallelization = local-skyline-then-merge, the common core of all four
 * reference variants (reference PlainSpatialRDDFunctions.scala:425-586):
 * a per-partition skyline shrinks each partition to its non-dominated
 * frontier, then a single-partition merge finishes. `skylineAngular`
 * first repartitions by polar angle of (x, y) — the reference's
 * AngularPartitioner (partitioner/AngularPartitioner.scala:66-103) — which
 * balances frontier work because dominance is rare across angle buckets.
 */
object Skyline {

  private def dominates(ax: Double, ay: Double, bx: Double, by: Double): Boolean =
    (ax <= bx && ay < by) || (ax < bx && ay <= by)

  /** Numeric field as double regardless of the concrete numeric type —
    * the documented contract is "numeric columns", not "double columns". */
  private def numAt(r: Row, i: Int): Double = r.get(i) match {
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"skyline: expected a numeric column, got ${other.getClass.getSimpleName}")
  }

  /** Insert-unless-dominated local skyline over (x, y) keyed rows. */
  private def localSkyline(iter: Iterator[Row], xi: Int, yi: Int): Iterator[Row] = {
    val frontier = new ArrayBuffer[(Double, Double, Row)]()
    iter.foreach { r =>
      if (!r.isNullAt(xi) && !r.isNullAt(yi)) {
        val x = numAt(r, xi); val y = numAt(r, yi)
        var dominated = false
        var i = 0
        while (i < frontier.length && !dominated) {
          val f = frontier(i)
          if (dominates(f._1, f._2, x, y)) dominated = true
          else if (dominates(x, y, f._1, f._2)) {
            // swap-remove the newly dominated frontier point
            frontier(i) = frontier(frontier.length - 1)
            frontier.remove(frontier.length - 1)
          } else i += 1
        }
        if (!dominated) frontier += ((x, y, r))
      }
    }
    frontier.iterator.map(_._3)
  }

  /**
   * Partition-dominance pruning (reference PlainSpatialRDDFunctions.scala:
   * 456-482): a partition whose frontier's MIN corner is dominated by some
   * other partition's frontier MAX corner is dropped entirely — every point
   * of the other partition is componentwise <= its max corner, so it
   * dominates every point of the pruned one. Mutual pruning is impossible
   * (Bmax <= Amin and Amax <= Bmin forces all four corners equal, which
   * fails dominance strictness), so at least one partition always survives.
   * Input: (pid, minX, minY, maxX, maxY) per non-empty local frontier.
   */
  private[graft] def prunePartitions(
      bounds: Seq[(Int, Double, Double, Double, Double)]): Set[Int] =
    bounds.iterator.filter { case (pid, minx, miny, _, _) =>
      bounds.exists { case (opid, _, _, omaxx, omaxy) =>
        opid != pid && dominates(omaxx, omaxy, minx, miny)
      }
    }.map(_._1).toSet

  /** Local frontiers → pruned → single-partition merge. The frontier union
    * is small (bounded by the per-partition skylines), so the localCheckpoint
    * that lets us both scan its bounds and merge it costs little; only the
    * per-partition corner scalars reach the driver. On adversarial
    * anti-correlated data the pruning bounds the repartition(1) merge input
    * to the undominated partitions' frontiers. */
  private def mergeFrontiers(local: DataFrame, xCol: String, yCol: String,
                             xi: Int, yi: Int): DataFrame = {
    require(!local.columns.exists(_.equalsIgnoreCase("__sky_pid")),
      "skyline: input must not contain a column named __sky_pid")
    val enc = Encoders.row(local.schema)
    val frontier = local.localCheckpoint()
    val withPid = frontier.withColumn("__sky_pid", org.apache.spark.sql.functions.spark_partition_id())
    val bounds = withPid.groupBy(col("__sky_pid"))
      .agg(min(col(xCol)), min(col(yCol)), max(col(xCol)), max(col(yCol)))
      .collect().map { r =>
        def d(i: Int) = r.get(i).asInstanceOf[java.lang.Number].doubleValue()
        (r.getInt(0), d(1), d(2), d(3), d(4))
      }.toSeq
    val pruned = prunePartitions(bounds)
    val kept =
      if (pruned.isEmpty) frontier
      else withPid.filter(!col("__sky_pid").isInCollection(pruned)).drop("__sky_pid")
    kept.repartition(1).mapPartitions(it => localSkyline(it, xi, yi))(enc)
  }

  /**
   * Skyline of `df` over numeric columns `xCol`, `yCol` (minimized).
   * Two-level: local skyline per partition, partition-dominance pruning,
   * then single-partition merge.
   *
   * EAGER: calling this materializes the local-frontier pass immediately
   * (the pruning decision needs the per-partition corner scalars on the
   * driver before the merge plan can be built) — same driver/executor
   * split as DBSCAN.cluster and ngramJaccardPairs. Callers composing
   * lazily-built pipelines should invoke it at execution time, not plan
   * time.
   */
  def skyline(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)
    val enc = Encoders.row(df.schema)
    val local = df.mapPartitions(it => localSkyline(it, xi, yi))(enc)
    mergeFrontiers(local, xCol, yCol, xi, yi)
  }

  /** Angular-partitioned variant: repartition by atan2 slice first. Slice
    * width is pi/2/buckets — `buckets` slices over the first quadrant, the
    * distance-space home of the reference's AngularPartitioner — but the
    * slice id is NOT clamped: off-quadrant angles produce their own ids,
    * and `repartition` hashes every id into the `buckets` partitions, so
    * data anywhere on the circle spreads instead of piling into one edge
    * bucket. */
  def skylineAngular(df: DataFrame, xCol: String, yCol: String, buckets: Int = 16): DataFrame = {
    val xi = df.schema.fieldIndex(xCol)
    val yi = df.schema.fieldIndex(yCol)
    val enc = Encoders.row(df.schema)
    val bucket = floor(atan2(col(yCol), col(xCol)) / lit(math.Pi / 2 / buckets))
    val local = df.repartition(buckets, bucket)
      .mapPartitions(it => localSkyline(it, xi, yi))(enc)
    mergeFrontiers(local, xCol, yCol, xi, yi)
  }

  /** Reference `skylineAngularNoPart`: the angular algorithm without the
    * angular repartition — over whatever partitions the input already has,
    * it reduces to local-skyline-then-merge, i.e. exactly [[skyline]]
    * (identical results to [[skylineAngular]] by the skyline's
    * partition-independence). */
  def skylineAngularNoPart(df: DataFrame, xCol: String, yCol: String): DataFrame =
    skyline(df, xCol, yCol)

  /**
   * Spatio-temporal skyline: minimize (spatial distance, temporal distance)
   * to a reference object — the reference's `skyline(ref, ...)` entry point
   * (Plain:425-494). Adds the two distance columns, then runs [[skyline]].
   */
  def stSkyline(df: DataFrame, stoCol: Column, ref: Column): DataFrame = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(df.sparkSession)
    // interval midpoint; a right-open interval (t_end null) uses its start,
    // an instant (t_end == t_start) is unchanged
    def mid(c: Column): Column =
      (stf.st_tstart(c) + coalesce(stf.st_tend(c), stf.st_tstart(c))).cast("double") / 2
    // a side with NO temporal component has no defined temporal distance —
    // fail loudly instead of letting null distances silently drop rows
    // (with a time-less ref every row would vanish)
    val tdist = when(stf.st_tstart(stoCol).isNull || stf.st_tstart(ref).isNull,
        raise_error(lit("stSkyline: both the data column and the reference " +
          "need a temporal component (st_with_time/st_with_instant)")))
      .otherwise(abs(mid(stoCol) - mid(ref)))
    val withD = df
      .withColumn("spatial_dist", stf.st_centroid_distance(stoCol, ref))
      .withColumn("temporal_dist", tdist)
    skyline(withD, "spatial_dist", "temporal_dist")
  }
}
