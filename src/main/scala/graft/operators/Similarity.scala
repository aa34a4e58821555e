package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`).
 *
 *  - [[bruteTopK]]: exact baseline — broadcast the (small) query set, score
 *    every corpus vector, per-query window top-k. One corpus scan, no
 *    shuffle of the corpus itself (ranking shuffles only n_queries × n rows
 *    of (id, id, score)).
 *  - [[ivfTopK]]: IVF — seeded KMeans coarse quantizer; corpus vectors are
 *    assigned to their nearest centroid cell once (materialize/persist for
 *    repeated querying), queries probe the `nprobe` nearest cells only.
 *    Recall < 1 by construction; throughput scales with nprobe/nlist.
 */
object Similarity {

  /** Exact top-k: for each query row, the k nearest corpus rows by cosine.
    * Ties broken by corpus id — fully deterministic output. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
                corpusVec: Column, queryVec: Column, k: Int): DataFrame = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
      .withColumn("__cn", stf.vec_norm(col("__cv")))
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .withColumn("__qn", stf.vec_norm(col("__qv")))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("__rn", rn).filter(col("__rn") <= k)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Fit the coarse quantizer: KMeans(nlist, seed) on a deterministic
    * representative sample of the `__features` column — the ONE training
    * recipe shared by the live and persisted IVF paths (they must stay in
    * lockstep or a persisted index diverges from the live plan). */
  private def fitQuantizer(c: DataFrame, rowCount: Long, nlist: Int, seed: Long) = {
    val trainFrac = math.min(1.0, math.max(0.1, 20.0 * nlist / math.max(rowCount, 1L)))
    new KMeans().setK(nlist).setSeed(seed).setMaxIter(5)
      .setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(if (trainFrac < 1.0) c.sample(withReplacement = false, trainFrac, seed) else c)
  }

  /** Per-query probe set: indexes of the `nprobe` nearest centroids. */
  private def probeCellsUdf(centroids: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
                            nprobe: Int) = udf { (qv: Seq[Float]) =>
    val cs = centroids.value
    val dists = cs.indices.map { i =>
      val cvec = cs(i)
      var d = 0.0; var j = 0
      while (j < cvec.length) { val diff = qv(j) - cvec(j); d += diff * diff; j += 1 }
      (d, i)
    }
    dists.sorted.take(nprobe).map(_._2).toArray
  }

  /**
   * IVF top-k: KMeans(nlist, seed) coarse cells; each query probes the
   * nprobe nearest cells. nprobe == nlist degenerates to exact search.
   * Output: (query_id, neighbor_id, rank).
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, corpusId: Column, queryId: Column,
              corpusVec: Column, queryVec: Column, k: Int,
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
      .withColumn("__features", array_to_vector(col("__cv").cast("array<double>")))
    val model = fitQuantizer(c, corpus.count(), nlist, seed)
    val assigned = model.transform(c).drop("__features")
    val bc = spark.sparkContext.broadcast(model.clusterCenters.map(_.toArray))
    val probeCells = probeCellsUdf(bc, nprobe)
    val q = queries.select(queryId.as("query_id"), queryVec.as("__qv"))
      .withColumn("__qcell", explode(probeCells(col("__qv"))))

    import graft.functions.stf
    graft.functions.GraftFunctions.register(spark)
    val scored = assigned.withColumn("__cn", stf.vec_norm(col("__cv")))
      .join(broadcast(q.withColumn("__qn", stf.vec_norm(col("__qv")))),
        col("__cell") === col("__qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  // ---- persisted IVF index ----
  // The scale contract of IVF is train-once / assign-once / query-many:
  // at 100 TB the corpus assignment is the expensive pass, and a query
  // batch should read only its probed cells. These two methods persist
  // the assignment as parquet range-partitioned and sorted by cell id —
  // a query's probe set reaches the reader as a pushed IN filter, so
  // non-probed cells are never read — with the centroids in an
  // underscore-hidden parquet sidecar (same layout idea as
  // [[graft.sources.IndexStore]]).

  /** Train the coarse quantizer and persist the assigned corpus
    * (`__cell`, `neighbor_id`, `__cv`, `__cn`) under `<path>/corpus` plus
    * a `_graft_centroids` parquet sidecar. A top-level `_SUCCESS` marker
    * is written LAST so an interrupted build is redone by write-once
    * wrappers, never half-read. */
  def buildIvfIndex(corpus: DataFrame, path: String, corpusId: Column,
                    corpusVec: Column, nlist: Int = 16, seed: Long = 42L): Unit = {
    import graft.functions.stf
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("__cv"))
      .withColumn("__features", array_to_vector(col("__cv").cast("array<double>")))
    val model = fitQuantizer(c, corpus.count(), nlist, seed)
    model.transform(c).drop("__features")
      .withColumn("__cn", stf.vec_norm(col("__cv")))
      .repartitionByRange(col("__cell")).sortWithinPartitions(col("__cell"))
      .write.mode("overwrite").parquet(path + "/corpus")
    val spark = corpus.sparkSession
    import spark.implicits._
    model.clusterCenters.map(_.toArray).zipWithIndex
      .map { case (v, i) => (i, v) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path + "/_graft_centroids")
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
  }

  /** Query a [[buildIvfIndex]] store: each query probes its `nprobe`
    * nearest cells; only those cells are read from the store (pushed IN
    * filter over the sorted cell column). `nprobe` ≥ nlist reads
    * everything and equals [[bruteTopK]] exactly. The query batch is
    * collected once (it is broadcast-small by contract), so its upstream
    * plan never executes twice. */
  def ivfTopKIndexed(queries: DataFrame, path: String, queryId: Column,
                     queryVec: Column, k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import graft.functions.stf
    graft.functions.GraftFunctions.register(spark)
    val centroids = spark.read.parquet(path + "/_graft_centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
    val bc = spark.sparkContext.broadcast(centroids)
    val probeCells = probeCellsUdf(bc, nprobe)
    // materialize the (small) query batch once: probe-set collection and
    // the join below must not re-run a possibly expensive upstream plan
    val qBatch = queries.select(queryId.as("query_id"), queryVec.as("__qv")).collect()
    val qSchema = queries.select(queryId.as("query_id"), queryVec.as("__qv")).schema
    val q = spark.createDataFrame(java.util.Arrays.asList(qBatch: _*), qSchema)
      .withColumn("__qcell", explode(probeCells(col("__qv"))))
      .withColumn("__qn", stf.vec_norm(col("__qv")))
    val cells = q.select(col("__qcell")).distinct().collect().map(_.getInt(0))
    val scored = spark.read.parquet(path + "/corpus")
      .filter(col("__cell").isin(cells.map(Int.box).toIndexedSeq: _*))
      .join(broadcast(q),
        col("__cell") === col("__qcell") && col("neighbor_id") =!= col("query_id"))
      .withColumn("__cos", stf.vec_dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")))
    val rn = row_number().over(
      Window.partitionBy(col("query_id")).orderBy(col("__cos").desc, col("neighbor_id")))
    scored.withColumn("rank", rn).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }
}
