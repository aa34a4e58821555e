package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.storage.StorageLevel

/**
 * Distributed DBSCAN over 2-d points — the reference's
 * `cluster(minPts, epsilon, ...)` operator (MR-DBSCAN, He et al.; reference
 * src/main/scala/dbis/stark/dbscan/DBScan.scala:21-542), re-expressed as
 * DataFrame joins:
 *
 *  1. eps-sized grid cells; each point is *owned* by its cell and
 *     *replicated* to the 3×3 cell neighborhood (the epsilon halo). Every
 *     ordered neighbor pair then meets in exactly one cell — one shuffle
 *     join computes all exact eps-neighbor pairs, no cross-partition query.
 *  2. core = neighbor count (self included) >= minPts.
 *  3. cluster ids: iterative min-label propagation over core-core edges
 *     PLUS pointer jumping (label <- label(label)) — O(log diameter)
 *     rounds, every round a pair of small joins. This replaces the
 *     reference's driver-side transitive closure, which its own code flags
 *     as unscalable (DBScan.scala:164-168 "FIXME: Bad!").
 *  4. border points join the minimum cluster id among their core
 *     neighbors; everything else is noise (cluster_id = -1).
 *
 * Cluster id = min core point id of the component — deterministic, and the
 * border rule (min over neighboring cores) is deterministic too, so results
 * are exactly reproducible (and SQL-oracle-checkable).
 */
object DBSCAN {

  /**
   * @param eps     neighborhood radius (predicate: squared distance <= eps²,
   *                exact for integral coordinates)
   * @param minPts  core threshold, self included
   * @return `id` (the id column widened to long) + `cluster_id` (-1 = noise)
   */
  def cluster(df: DataFrame, idCol: Column, xCol: Column, yCol: Column,
              eps: Double, minPts: Int): DataFrame = {
    val spark = df.sparkSession
    val eps2 = eps * eps

    // the CC machinery reads ids as primitive longs — widen any integral id
    // here so int-keyed inputs work instead of class-casting in executors
    val pts = df.select(idCol.cast("long").as("__id"), xCol.as("__x"), yCol.as("__y"))
    def cellOf(x: Column, y: Column, dx: Int, dy: Int): Column =
      (floor(x / eps).cast("long") + dx) * 4294967296L + (floor(y / eps).cast("long") + dy)

    val owned = pts.withColumn("__cell", cellOf(col("__x"), col("__y"), 0, 0))
    val halo = pts.withColumn("__cell", explode(array(
      (for (dx <- -1 to 1; dy <- -1 to 1)
        yield cellOf(col("__x"), col("__y"), dx, dy)): _*)))

    // every ordered eps-neighbor pair (a, b) — incl. (a, a) — exactly once
    val nbr = owned.as("l").join(halo.as("r"), col("l.__cell") === col("r.__cell"))
      .filter((col("l.__x") - col("r.__x")) * (col("l.__x") - col("r.__x")) +
              (col("l.__y") - col("r.__y")) * (col("l.__y") - col("r.__y")) <= eps2)
      .select(col("l.__id").as("__a"), col("r.__id").as("__b"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val core = nbr.groupBy(col("__a")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= minPts).select(col("__a").as("__id"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // deliberately NOT persisted: consumed exactly once (the CC repartition
    // below) — a persist would write the edge list to storage just to read
    // it back a single time
    val coreEdges = nbr
      .join(core.withColumnRenamed("__id", "__a"), "__a")
      .join(core.withColumnRenamed("__id", "__b"), "__b")
      .select(col("__a"), col("__b"))

    // connected components over core-core edges — two-level distributed CC
    // (per-partition union-find contraction, then Pregel on the quotient
    // graph; see ConnectedComponents). This replaces the reference's
    // driver-side transitive closure and labels each component with its min
    // core id — exactly the deterministic cluster-id contract. Every core
    // point appears (nbr includes the (a,a) self-pair).
    val coreClusters = ConnectedComponents
      .run(coreEdges, numPartitions = spark.sparkContext.defaultParallelism)
      .withColumnRenamed("__comp", "__cid")
    // border: non-core point with >= 1 core neighbor -> min neighbor cluster
    val borderClusters = nbr.join(core.withColumnRenamed("__id", "__a"),
        Seq("__a"), "left_anti") // a is not core
      .join(coreClusters.select(col("__id").as("__b"), col("__cid")), "__b")
      .groupBy(col("__a")).agg(min(col("__cid")).as("__cid"))
      .withColumnRenamed("__a", "__id")

    val out = pts.select(col("__id"))
      .join(coreClusters.withColumnRenamed("__cid", "__c1"), Seq("__id"), "left")
      .join(borderClusters.withColumnRenamed("__cid", "__c2"), Seq("__id"), "left")
      .select(col("__id").as("id"),
        coalesce(col("__c1"), col("__c2"), lit(-1L)).as("cluster_id"))
      // materialize (small: one row per point), then free the large
      // neighbor/core intermediates so repeated clustering calls don't
      // accumulate executor storage
      .localCheckpoint()
    nbr.unpersist(); core.unpersist()
    out
  }
}
