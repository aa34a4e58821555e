package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * IVF-NSW graph index: the local kernel's determinism and degenerate
 * exhaustiveness, the store's degenerate-exact contract vs a local brute
 * rank, approximate-config recall with the visited-cost bound, takedown
 * through traversable tombstones, and the compaction graph rebuild.
 */
class GraphAnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random unit-ish vectors: 300 x 8 dims. */
  private def vectors(n: Int = 300, dim: Int = 8): Seq[(Long, Array[Float])] =
    (0L until n.toLong).map { i =>
      val rnd = new scala.util.Random(i * 7919 + 13)
      (i, Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    }

  private def df(vs: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    vs.map { case (i, v) => (i, v.toSeq) }.toDF("vec_id", "embedding")
  }

  /** Local euclidean brute top-k over float-to-double exact arithmetic. */
  private def brute(vs: Seq[(Long, Array[Float])], qs: Seq[(Long, Array[Float])],
                    k: Int, excluded: Set[Long] = Set.empty): Set[(Long, Long, Int)] =
    qs.flatMap { case (qid, qv) =>
      vs.filter(c => c._1 != qid && !excluded(c._1))
        .map { case (cid, cv) =>
          val d = cv.zip(qv).map { case (a, b) =>
            (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum
          (d, cid)
        }.sorted.take(k).zipWithIndex
        .map { case ((_, cid), r) => (qid, cid, r + 1) }
    }.toSet

  test("local kernel: degenerate beam visits everything; build is deterministic and connected") {
    val vs = vectors(80)
    val ids = vs.map(_._1).toArray
    val vecs = vs.map(_._2.map(_.toDouble)).toArray
    val adj = Similarity.nswBuildLocal(ids, vecs, m = 6, efC = 24)
    assert(Similarity.nswBuildLocal(ids, vecs, 6, 24).zip(adj)
      .forall { case (a, b) => a.sameElements(b) },
      "two builds must produce identical adjacency")
    // connectivity: BFS from node 0 reaches all
    val seen = scala.collection.mutable.Set(0)
    val queue = scala.collection.mutable.Queue(0)
    while (queue.nonEmpty) {
      adj(queue.dequeue()).foreach { w =>
        if (!seen(w)) { seen += w; queue += w }
      }
    }
    assert(seen.size == ids.length, "cell graph must be connected by construction")
    // degenerate search: ef >= n visits all nodes and equals brute sort
    val q = vecs(17)
    val (hits, visited) = Similarity.nswSearchLocal(ids, vecs,
      adj.map(_.toIndexedSeq), q, ef = 1000, nNodes = ids.length)
    assert(visited == ids.length)
    val want = vecs.indices.map(i => (vecs(i).zip(q)
      .map { case (a, b) => (a - b) * (a - b) }.sum, i)).sorted
    assert(hits == want)
  }

  test("store: degenerate config == euclidean brute; approximate recall + visited bound") {
    val vs = vectors()
    val corpus = df(vs)
    val dir = java.nio.file.Files.createTempDirectory("nsw").toString
    Similarity.buildNswIndex(corpus, dir, col("vec_id"), col("embedding"),
      nlist = 6, m = 6, efC = 24)
    val qs = vs.take(8)
    val queries = df(qs)
    val got = Similarity.nswTopKIndexed(queries, dir, col("vec_id"),
        col("embedding"), k = 5, nprobe = 6, efSearch = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute(vs, qs, 5), "degenerate IVF-NSW must equal brute top-5")
    // approximate config: recall floor + the visited-cost cap
    val approx = Similarity.nswTopKIndexed(queries, dir, col("vec_id"),
        col("embedding"), k = 5, nprobe = 3, efSearch = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = brute(vs, qs, 5).map(t => (t._1, t._2))
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"approximate recall $recall")
    val visited = Similarity.nswProbeStats(queries, dir, col("vec_id"),
        col("embedding"), nprobe = 3, efSearch = 32)
      .agg(max(col("n_visited"))).collect()(0).getLong(0)
    assert(visited <= vs.size * 6 / 10, s"visited $visited of ${vs.size}")
  }

  test("streaming NSW serve == the batch reader from the same frozen store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vs = vectors(120)
    val dir = java.nio.file.Files.createTempDirectory("nswgate").toString
    Similarity.buildNswIndex(df(vs), s"$dir/store", col("vec_id"),
      col("embedding"), nlist = 4, m = 6, efC = 24)
    val qs = vs.take(5)
    val batch = Similarity.nswTopKIndexed(df(qs), s"$dir/store",
        col("vec_id"), col("embedding"), k = 5, nprobe = 2, efSearch = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = graft.streaming.EventStreams.annTopKNsw(
      input.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$dir/store", k = 5, nprobe = 2, efSearch = 32,
      outPath = s"$dir/out", checkpoint = s"$dir/ckpt")
    try {
      input.addData(qs.map { case (i, v) => (i, v.toSeq) }: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/out")
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == batch && got.nonEmpty)
    } finally q.stop()
  }

  test("takedown: tombstoned ids filtered from results but still traversable; compact rebuilds graphs") {
    import spark.implicits._
    val vs = vectors()
    val corpus = df(vs)
    val dir = java.nio.file.Files.createTempDirectory("nswdel").toString
    Similarity.buildNswIndex(corpus, dir, col("vec_id"), col("embedding"),
      nlist = 4, m = 6, efC = 24)
    val qs = vs.take(6)
    val queries = df(qs)
    // delete three ids that appear in the pre-delete top-5 answers
    val pre = Similarity.nswTopKIndexed(queries, dir, col("vec_id"),
        col("embedding"), k = 5, nprobe = 4, efSearch = 1 << 20)
      .collect().map(_.getLong(1)).distinct.take(3)
    Similarity.deleteFromAnnStore(pre.toSeq.toDF("vec_id"), col("vec_id"),
      dir, batchId = 0L)
    val want = brute(vs, qs, 5, excluded = pre.toSet)
    val got = Similarity.nswTopKIndexed(queries, dir, col("vec_id"),
        col("embedding"), k = 5, nprobe = 4, efSearch = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want, "post-delete degenerate must equal brute over the live rows")
    // compact: rebuilds the cell graphs over live rows only
    Similarity.compactAnnStore(spark, dir)
    val adjIds = spark.read.parquet(dir + "/corpus")
      .select(explode(col("__adj"))).collect().map(_.getLong(0)).toSet
    assert(pre.forall(!adjIds.contains(_)),
      "compacted adjacency must not reference tombstoned ids")
    val postCompact = Similarity.nswTopKIndexed(queries, dir, col("vec_id"),
        col("embedding"), k = 5, nprobe = 4, efSearch = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(postCompact == want, "compaction must preserve the degenerate-exact answers")
    // the params sidecar survives compaction
    assert(graft.sources.Sidecar.readText(spark, dir + "/_graft_nsw_params")
      .trim == "m 6 efc 24")
  }

  test("production regime pin: 2,000-vector-cell beam quality and sub-linear visited cost (r13)") {
    // Lifts dev/nsw_regime.scala's big-cell row into CI (SCALE.md
    // "IVF-NSW regimes": recall 0.955, avg visited 606 of 2,000 at
    // ef=64 on this exact configuration) — a walk or tie-break
    // regression at production cell sizes must fail the SUITE, not a
    // hand-run script. One cell (nlist = 1) over the real sf0.1
    // embedding table, so the number is beam quality unconfounded by
    // IVF routing — the q235 shape at 4x the cell size.
    val e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    val n = e.count()
    assert(n >= 1500, s"sf0.1 embeddings shrank beneath the regime this pins: n=$n")
    val dir = java.nio.file.Files.createTempDirectory("nswregime").toString
    Similarity.buildNswIndex(e, dir, col("vec_id"), col("embedding"),
      nlist = 1, m = 8, efC = 32)
    val qs = e.filter(col("vec_id") < 20)
    val approx = Similarity.nswTopKIndexed(qs, dir, col("vec_id"),
        col("embedding"), k = 10, nprobe = 1, efSearch = 64)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val d2 = graft.functions.stf.vec_dist2(col("q.embedding"), col("c.embedding"))
    val exact = qs.as("q").crossJoin(e.as("c"))
      .filter(col("c.vec_id") =!= col("q.vec_id"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q.vec_id"))
          .orderBy(d2, col("c.vec_id"))))
      .filter(col("rank") <= 10)
      .select(col("q.vec_id"), col("c.vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.93, f"big-cell beam recall regressed: $recall%.3f < 0.93")
    val stats = Similarity.nswProbeStats(qs, dir, col("vec_id"),
        col("embedding"), nprobe = 1, efSearch = 64)
      .agg(max(col("n_visited")), avg(col("n_visited"))).collect()(0)
    val maxV = stats.getLong(0); val avgV = stats.getDouble(1)
    assert(maxV <= 1L + 64L * 2 * 8, // entry node + efSearch slots x 2m
      s"absolute beam-cost cap broken: max visited $maxV > 1025")
    assert(avgV <= 0.45 * n, // measured 0.30 at this regime — margin, not slack
      f"visited fraction regressed: ${avgV / n}%.3f of $n")
  }
}
