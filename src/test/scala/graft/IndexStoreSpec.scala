package graft

import graft.functions.stf
import graft.operators.{JoinPredicate, SpatialJoin, SpatialOps}
import graft.sources.IndexStore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Persisted-index store: filters and joins answered from serialized
 * per-cell R-trees must equal the live plans exactly (reference persists
 * `RDD[Index]` via saveAsObjectFile / loadIndexed, STSparkContext.scala:
 * 307-377 — same write-once-query-many contract). Boundary-heavy random
 * data (coordinates snapped to cell boundaries) like DifferentialJoinSpec.
 */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rnd = new scala.util.Random(11)
  private val cellSize = 10.0

  private lazy val boxes = {
    import spark.implicits._
    (0 until 120).map { i =>
      val x0 = rnd.nextInt(16) * 5.0; val y0 = rnd.nextInt(16) * 5.0
      (i.toLong, x0, y0, x0 + (rnd.nextInt(4) + 1) * 5.0, y0 + (rnd.nextInt(4) + 1) * 5.0)
    }.toDF("bid", "x0", "y0", "x1", "y1")
      .withColumn("bgeo", stf.st_box(col("x0"), col("y0"), col("x1"), col("y1")))
      .select("bid", "bgeo")
  }

  private lazy val pts = {
    import spark.implicits._
    (0 until 200).map { i =>
      (i.toLong, rnd.nextInt(20) * 5.0, rnd.nextInt(20) * 5.0)
    }.toDF("pid", "px", "py")
      .withColumn("pgeo", stf.st_point(col("px"), col("py")))
  }

  private lazy val storePath = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_index_store_spec"
    IndexStore.saveIndexed(pts, p, "pgeo", cellSize)
    p
  }

  test("schema sidecar round-trips") {
    assert(IndexStore.loadSchema(spark, storePath) == pts.schema)
  }

  test("persisted filter equals the live predicate filter") {
    val qry = "POLYGON ((12.5 12.5, 62.5 12.5, 62.5 47.5, 12.5 47.5, 12.5 12.5))"
    val live: Map[JoinPredicate, org.apache.spark.sql.DataFrame] = Map(
      JoinPredicate.Intersects ->
        SpatialOps.intersects(pts, col("pgeo"), stf.st_geomfromwkt(qry)),
      JoinPredicate.ContainedBy ->
        SpatialOps.containedBy(pts, col("pgeo"), stf.st_geomfromwkt(qry)),
      JoinPredicate.CoveredBy ->
        SpatialOps.coveredBy(pts, col("pgeo"), stf.st_geomfromwkt(qry)))
    for ((pred, expected) <- live) {
      val got = IndexStore.filter(spark, storePath, qry, pred)
        .select("pid").collect().map(_.getLong(0)).toSet
      val exp = expected.select("pid").collect().map(_.getLong(0)).toSet
      assert(got == exp, s"pred=$pred missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("spatio-temporal persisted filter applies the §2.2 gate") {
    import spark.implicits._
    val timed = (0 until 100).map { i =>
      (i.toLong, (i % 20) * 5.0, (i / 20) * 5.0, i * 10L)
    }.toDF("id", "x", "y", "t")
      .withColumn("geo", stf.st_with_instant(stf.st_point(col("x"), col("y")), col("t")))
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_index_store_timed"
    IndexStore.saveIndexed(timed, p, "geo", cellSize)
    val qry = "POLYGON ((0 0, 95 0, 95 95, 0 95, 0 0))"
    // closed query interval [200, 600]: only instants inside it intersect
    val got = IndexStore.filter(spark, p, qry, JoinPredicate.Intersects,
        200L, 600L)
      .select("id").collect().map(_.getLong(0)).toSet
    val exp = SpatialOps.intersects(timed, col("geo"),
        stf.st_with_time(stf.st_geomfromwkt(qry), lit(200L), lit(600L)))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == exp && got.nonEmpty,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    // presence mismatch: un-timed query against timed rows matches nothing
    assert(IndexStore.filter(spark, p, qry, JoinPredicate.Intersects)
      .count() == 0)
  }

  test("persisted join equals the declarative cell join") {
    for (pred <- Seq(JoinPredicate.Intersects, JoinPredicate.Contains)) {
      val got = IndexStore.join(boxes, storePath, "bgeo", pred)
        .select(col("bid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = SpatialJoin.join(boxes, pts, col("bgeo"), col("pgeo"), pred, cellSize)
        .select(col("bid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp, s"pred=$pred missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("persisted IVF index with full probe equals brute-force top-k") {
    import graft.operators.Similarity
    import spark.implicits._
    val dim = 8
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_ivf_store_spec"
    Similarity.buildIvfIndex(emb, p, col("vec_id"), col("embedding"), nlist = 8)
    val q = emb.filter(col("vec_id") < 5)
    val got = Similarity.ivfTopKIndexed(q, p, col("vec_id"), col("embedding"),
        k = 3, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exp = Similarity.bruteTopK(emb, q, col("vec_id"), col("vec_id"),
        col("embedding"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exp, s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    // partial probe: at most k per query, all from the probed cells
    val part = Similarity.ivfTopKIndexed(q, p, col("vec_id"), col("embedding"),
        k = 3, nprobe = 2)
    val counts = part.groupBy(col("query_id")).count().collect().map(_.getLong(1))
    assert(counts.nonEmpty && counts.forall(_ <= 3))
  }

  test("persisted PQ store equals the inline pqTopK (codes round-trip, ragged codebooks)") {
    import graft.operators.Similarity
    import spark.implicits._
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_pq_store_spec"
    // m=4, ksub=16, trained: the persisted codes + sidecar codebooks must
    // reproduce the inline path exactly (same training recipe, same sample)
    Similarity.buildPqIndex(emb, p, col("vec_id"), col("embedding"),
      m = 4, ksub = 16, iters = 2, sampleN = 150)
    val q = emb.filter(col("vec_id") < 5)
    val got = Similarity.pqTopKIndexed(q, p, col("vec_id"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exp = Similarity.pqTopK(emb, q, col("vec_id"), col("vec_id"),
        col("embedding"), col("embedding"), k = 3, m = 4, ksub = 16, iters = 2,
        sampleN = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == exp && got.nonEmpty,
      s"missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
  }

  test("ANN takedown: tombstoned vectors vanish from every store's serving") {
    import graft.operators.Similarity
    import spark.implicits._
    val dim = 8
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding")
    val remaining = emb.filter(col("vec_id") % 9 =!= 4)
    val victims = emb.filter(col("vec_id") % 9 === 4).select(col("vec_id"))
    val q = emb.filter(col("vec_id") < 5)
    val tmp = System.getProperty("java.io.tmpdir")

    // IVF: forget == brute over the remaining corpus (full probe)
    val ivf = s"$tmp/graft_ivf_del_spec"
    Similarity.buildIvfIndex(emb, ivf, col("vec_id"), col("embedding"), nlist = 8)
    Similarity.deleteFromAnnStore(victims, col("vec_id"), ivf, batchId = 0L)
    val gotIvf = Similarity.ivfTopKIndexed(q, ivf, col("vec_id"), col("embedding"),
        k = 3, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expIvf = Similarity.bruteTopK(remaining, q, col("vec_id"), col("vec_id"),
        col("embedding"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotIvf == expIvf && gotIvf.nonEmpty)

    // PQ: forget == a store REBUILT over the remaining corpus (identical
    // codebooks: same bounded deterministic sample would differ, so train
    // lossless where codes are exact)
    val n = 150
    val pq = s"$tmp/graft_pq_del_spec"
    Similarity.buildPqIndex(emb, pq, col("vec_id"), col("embedding"),
      m = 4, ksub = n, iters = 0, sampleN = n)
    Similarity.deleteFromAnnStore(victims, col("vec_id"), pq, batchId = 0L)
    val pq2 = s"$tmp/graft_pq_del_spec2"
    Similarity.buildPqIndex(remaining, pq2, col("vec_id"), col("embedding"),
      m = 4, ksub = n, iters = 0, sampleN = n)
    val gotPq = Similarity.pqTopKIndexed(q, pq, col("vec_id"), col("embedding"), k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expPq = Similarity.pqTopKIndexed(q, pq2, col("vec_id"), col("embedding"), k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPq == expPq && gotPq.nonEmpty)

    // IVF-PQ: same differential through the composed reader
    val ipq = s"$tmp/graft_ipq_del_spec"
    Similarity.buildIvfPqIndex(emb, ipq, col("vec_id"), col("embedding"),
      nlist = 4, m = 4, ksub = n, iters = 0, sampleN = n)
    Similarity.deleteFromAnnStore(victims, col("vec_id"), ipq, batchId = 0L)
    val ipq2 = s"$tmp/graft_ipq_del_spec2"
    Similarity.buildIvfPqIndex(remaining, ipq2, col("vec_id"), col("embedding"),
      nlist = 4, m = 4, ksub = n, iters = 0, sampleN = n)
    val gotIpq = Similarity.ivfPqTopKIndexed(q, ipq, col("vec_id"), col("embedding"),
        k = 3, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expIpq = Similarity.ivfPqTopKIndexed(q, ipq2, col("vec_id"), col("embedding"),
        k = 3, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotIpq == expIpq && gotIpq.nonEmpty)

    // binary: search AND the id-free-block gate forget the victims
    val bin = s"$tmp/graft_bin_del_spec"
    Similarity.buildBinaryIndex(emb, bin, col("vec_id"), col("embedding"),
      dim = dim, bits = 64, salt = "bdel")
    Similarity.deleteFromAnnStore(victims, col("vec_id"), bin, batchId = 0L)
    val bin2 = s"$tmp/graft_bin_del_spec2"
    Similarity.buildBinaryIndex(remaining, bin2, col("vec_id"), col("embedding"),
      dim = dim, bits = 64, salt = "bdel")
    val gotB = Similarity.binaryTopKIndexed(q, bin, col("vec_id"), col("embedding"),
        k = 3, cand = 1000)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expB = Similarity.binaryTopKIndexed(q, bin2, col("vec_id"), col("embedding"),
        k = 3, cand = 1000)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotB == expB && gotB.nonEmpty)
    val gateGot = Similarity.dropSeenHamming(emb, col("vec_id"), col("embedding"),
        bin, maxHamming = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val gateExp = Similarity.dropSeenHamming(emb, col("vec_id"), col("embedding"),
        bin2, maxHamming = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(gateGot == gateExp)
    // compaction: every layout folds to one reserved-id segment with
    // identical serving (run BEFORE the rebuild check below reuses ivf)
    Similarity.compactAnnStore(spark, ivf)
    val gotIvfC = Similarity.ivfTopKIndexed(q, ivf, col("vec_id"), col("embedding"),
        k = 3, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotIvfC == expIvf)
    assert(!new java.io.File(s"$ivf/tombstones").exists())
    Similarity.compactAnnStore(spark, pq)
    val gotPqC = Similarity.pqTopKIndexed(q, pq, col("vec_id"), col("embedding"), k = 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotPqC == expPq)
    Similarity.compactAnnStore(spark, ipq)
    val gotIpqC = Similarity.ivfPqTopKIndexed(q, ipq, col("vec_id"), col("embedding"),
        k = 3, nprobe = 4)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotIpqC == expIpq)
    Similarity.compactAnnStore(spark, bin)
    val gotBC = Similarity.binaryTopKIndexed(q, bin, col("vec_id"), col("embedding"),
        k = 3, cand = 1000)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotBC == expB)
    val gateGotC = Similarity.dropSeenHamming(emb, col("vec_id"), col("embedding"),
        bin, maxHamming = 3)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(gateGotC == gateExp)
    // a rebuild clears the tombstones
    Similarity.buildIvfIndex(emb, ivf, col("vec_id"), col("embedding"), nlist = 8)
    val cleared = Similarity.ivfTopKIndexed(q, ivf, col("vec_id"), col("embedding"),
        k = 3, nprobe = 8)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expFull = Similarity.bruteTopK(emb, q, col("vec_id"), col("vec_id"),
        col("embedding"), col("embedding"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cleared == expFull)
    intercept[IllegalArgumentException] {
      Similarity.deleteFromAnnStore(victims, col("vec_id"), ivf, batchId = -1L)
    }
  }

  test("ANN lifecycle fuzz: random ingest/forget/compact/replay histories == brute over remaining") {
    import graft.operators.Similarity
    import spark.implicits._
    val dim = 8
    val frnd = new scala.util.Random(23)
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.fill(dim)((frnd.nextDouble() * 2 - 1).toFloat))
    }
    val emb = vecs.toDF("vec_id", "embedding").localCheckpoint()
    val byId = vecs.toMap
    val queries = emb.filter(col("vec_id") < 5)
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"annfuzz$trial").toString
      Similarity.trainIvfCentroids(emb, dir, col("vec_id"), col("embedding"), nlist = 8)
      val inStore = scala.collection.mutable.Set.empty[Long]
      val pending = scala.collection.mutable.Queue(frnd.shuffle(vecs.map(_._1)): _*)
      var batch = 0L
      var delBatch = 0L
      for (step <- 1 to 6) {
        frnd.nextInt(3) match {
          case 0 | 1 => // ingest a random slice of not-yet-ingested vectors
            val n = 1 + frnd.nextInt(math.max(pending.size, 1))
            val ids = (1 to math.min(n, pending.size)).map(_ => pending.dequeue()).toSet
            if (ids.nonEmpty) {
              Similarity.appendIvfBatch(emb.filter(col("vec_id").isin(ids.toSeq: _*)),
                col("vec_id"), col("embedding"), dir, batch)
              inStore ++= ids; batch += 1
            }
          case 2 if inStore.nonEmpty => // forget a random subset (+ replay)
            val victims = frnd.shuffle(inStore.toSeq).take(1 + frnd.nextInt(inStore.size))
            val vdf = emb.filter(col("vec_id").isin(victims: _*)).select(col("vec_id"))
            Similarity.deleteFromAnnStore(vdf, col("vec_id"), dir, delBatch)
            if (frnd.nextBoolean()) // crash-replayed delete must be a no-op
              Similarity.deleteFromAnnStore(vdf, col("vec_id"), dir, delBatch)
            inStore --= victims; delBatch += 1
          case _ => ()
        }
        if (step == 3 && batch > 0) { // mid-history compaction
          Similarity.compactAnnStore(spark, dir)
          batch = 0L; delBatch = 0L
        }
      }
      if (batch > 0 && inStore.nonEmpty) {
        // full probe == exact COSINE top-k over the REMAINING vectors
        // (the IVF tier's metric — it equals bruteTopK exactly), whatever
        // the grow/forget/compact/replay interleaving was
        val got = Similarity.ivfTopKIndexed(queries, dir, col("vec_id"),
            col("embedding"), k = 3, nprobe = 8)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        def cos(a: Long, b: Long): Double = {
          val (x, y) = (byId(a).map(_.toDouble), byId(b).map(_.toDouble))
          val dot = x.indices.map(j => x(j) * y(j)).sum
          dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
        }
        val want = (0L until 5L).flatMap { qid =>
          inStore.toSeq.filter(_ != qid)
            .map(cid => (qid, cid, cos(qid, cid)))
            .sortBy(t => (-t._3, t._2)).take(3).map(t => (t._1, t._2))
        }.toSet
        assert(got == want, s"trial $trial (${inStore.size} remaining) diverged")
      }
    }
  }

  test("OPQ store lifecycle: train/add, forget, and compaction all carry the rotation") {
    import graft.operators.Similarity
    import spark.implicits._
    val dim = 16
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("vec_id", "embedding").localCheckpoint()
    val q = emb.filter(col("vec_id") < 5)
    val tmp = java.nio.file.Files.createTempDirectory("opq_life").toString
    def serve(path: String, ivf: Boolean): Set[(Long, Long, Int)] =
      (if (ivf) Similarity.ivfPqTopKIndexed(q, path, col("vec_id"),
          col("embedding"), k = 3, nprobe = 4)
       else Similarity.pqTopKIndexed(q, path, col("vec_id"), col("embedding"), k = 3))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

    // 1) IVF-PQ train/add under the frozen rotation == one-pass OPQ build
    Similarity.buildIvfPqIndex(emb, s"$tmp/one", col("vec_id"), col("embedding"),
      nlist = 4, m = 4, ksub = 16, iters = 2, opq = true)
    Similarity.trainIvfPqModel(emb, s"$tmp/seg", col("vec_id"), col("embedding"),
      nlist = 4, m = 4, ksub = 16, iters = 2, opq = true)
    Similarity.appendIvfPqBatch(emb.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), s"$tmp/seg", batchId = 0L)
    Similarity.appendIvfPqBatch(emb.filter(col("vec_id") % 2 === 1),
      col("vec_id"), col("embedding"), s"$tmp/seg", batchId = 1L)
    assert(serve(s"$tmp/seg", ivf = true) == serve(s"$tmp/one", ivf = true))
    assert(serve(s"$tmp/one", ivf = true).nonEmpty)

    // 2) forget on an OPQ store (lossless degenerate so codes are exact):
    //    tombstoned ids vanish, serving == a rebuild over the remaining
    val remaining = emb.filter(col("vec_id") % 9 =!= 4)
    Similarity.buildPqIndex(emb, s"$tmp/del", col("vec_id"), col("embedding"),
      m = 4, ksub = 150, iters = 0, sampleN = 150, opq = true)
    Similarity.deleteFromAnnStore(emb.filter(col("vec_id") % 9 === 4)
      .select(col("vec_id")), col("vec_id"), s"$tmp/del", batchId = 0L)
    Similarity.buildPqIndex(remaining, s"$tmp/del2", col("vec_id"), col("embedding"),
      m = 4, ksub = 150, iters = 0, sampleN = 150, opq = true)
    assert(serve(s"$tmp/del", ivf = false) == serve(s"$tmp/del2", ivf = false))

    // 3) compaction folds the forgotten store and CARRIES the rotation
    //    sidecars (_graft_pca_* ride the _graft_* sweep) — serve unchanged
    val before = serve(s"$tmp/del", ivf = false)
    Similarity.compactAnnStore(spark, s"$tmp/del")
    assert(graft.sources.Sidecar.exists(spark, s"$tmp/del/_graft_pca_mean"),
      "compaction must carry the OPQ rotation sidecar")
    assert(serve(s"$tmp/del", ivf = false) == before)

    // 4) a non-OPQ rebuild over an OPQ store clears the stale rotation
    Similarity.buildPqIndex(emb, s"$tmp/del", col("vec_id"), col("embedding"),
      m = 4, ksub = 150, iters = 0, sampleN = 150)
    assert(!graft.sources.Sidecar.exists(spark, s"$tmp/del/_graft_pca_mean"),
      "plain rebuild must drop the previous OPQ sidecars")
  }

  test("persisted kNN equals the live kNN (expand rounds + degenerate k >= n)") {
    import graft.operators.KNN
    // k large enough that the first ring can't conclude — forces expansion
    for (k <- Seq(3, 25)) {
      val got = IndexStore.knn(spark, storePath, 42.0, 57.0, k,
          tieBreak = Seq("pid"))
        .select(col("pid")).collect().map(_.getLong(0)).toSet
      val exp = KNN.knn(pts, col("pgeo"), stf.st_point(lit(42.0), lit(57.0)), k,
          tieBreak = Seq(col("pid")))
        .select(col("pid")).collect().map(_.getLong(0)).toSet
      assert(got == exp, s"k=$k missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
    // k >= store size: every row comes back exactly once (replica dedup)
    val all = IndexStore.knn(spark, storePath, 42.0, 57.0, k = 5000)
      .select(col("pid")).collect().map(_.getLong(0))
    assert(all.length == pts.count() && all.toSet.size == all.length)
  }

  test("persisted kNN join equals the live knnJoin (incl. k >= store size)") {
    import graft.operators.KNN
    import spark.implicits._
    val queries = (0 until 40).map { i =>
      (1000L + i, rnd.nextInt(25) * 4.0, rnd.nextInt(25) * 4.0)
    }.toDF("qid", "qx", "qy")
      .withColumn("qgeo", stf.st_point(col("qx"), col("qy")))
    for (k <- Seq(4, 250)) { // 250 > 200 stored rows: terminal round
      val got = IndexStore.knnJoin(queries, storePath, "qgeo", "qid", k,
          tieBreak = "pid")
        .select(col("qid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exp = KNN.knnJoin(queries, pts, "qgeo", "pgeo", leftId = "qid",
          k = k, tieBreak = "pid")
        .select(col("qid"), col("pid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == exp && got.nonEmpty,
        s"k=$k missing=${(exp -- got).take(5)} extra=${(got -- exp).take(5)}")
    }
  }

  test("knnJoin rejects case-insensitive column collisions with the store") {
    import spark.implicits._
    // 'PID' collides with the stored 'pid' under Spark's default
    // case-insensitive resolution — the guard must fire up front, not let
    // the join die later with an ambiguous-reference analysis error
    val queries = Seq((1L, 0.0, 0.0)).toDF("PID", "qx", "qy")
      .withColumn("qgeo", stf.st_point(col("qx"), col("qy")))
    val e = intercept[IllegalArgumentException] {
      IndexStore.knnJoin(queries, storePath, "qgeo", "PID", 2, tieBreak = "pid")
    }
    assert(e.getMessage.contains("PID"))
  }

  test("query regions outside the stored extent return empty, not errors") {
    val far = "POLYGON ((5000 5000, 5100 5000, 5100 5100, 5000 5100, 5000 5000))"
    assert(IndexStore.filter(spark, storePath, far,
      JoinPredicate.Intersects).count() == 0)
    import spark.implicits._
    val farBox = Seq((9L, 5000.0, 5000.0)).toDF("bid", "x", "y")
      .withColumn("bgeo", stf.st_box(col("x"), col("y"), col("x") + 50, col("y") + 50))
      .select("bid", "bgeo")
    assert(IndexStore.join(farBox, storePath, "bgeo",
      JoinPredicate.Intersects).count() == 0)
  }

  test("null geometries are skipped at save and never crash a query") {
    import spark.implicits._
    val withNulls = (0 until 20).map { i =>
      (i.toLong, i * 5.0, i * 5.0)
    }.toDF("id", "x", "y")
      .withColumn("geo", when(col("id") % 4 === 0, lit(null))
        .otherwise(stf.st_point(col("x"), col("y"))))
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_index_store_nulls"
    IndexStore.saveIndexed(withNulls, p, "geo", cellSize)
    val qry = "POLYGON ((-1 -1, 96 -1, 96 96, -1 96, -1 -1))"
    val got = IndexStore.filter(spark, p, qry, JoinPredicate.Intersects)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == (0 until 20).filter(_ % 4 != 0).map(_.toLong).toSet)
  }

  test("persisted join output schema is left ++ stored columns") {
    val out = IndexStore.join(boxes, storePath, "bgeo", JoinPredicate.Intersects)
    assert(out.columns.toSeq == Seq("bid", "bgeo", "pid", "px", "py", "pgeo"))
  }

  test("persisted kNN finds an extended geometry whose home cell is outside the probe box") {
    import spark.implicits._
    // a long line spanning cells (0,0)..(9,0) at y=50 (home cell (0,0))
    // plus points near (500,60): the probe box around (500,60) reads only
    // the middle cells — replica dedup by HOME cell would silently drop
    // the line even though its centroid (500,50) is the true nearest
    val path = java.nio.file.Files.createTempDirectory("graft_knn_ext").toString
    val geoms = (Seq((1L, "LINESTRING (0 50, 1000 50)")) ++
        (2L to 5L).map(i => (i, s"POINT (${495 + i} 60)")))
      .toDF("gid", "__wkt")
      .withColumn("ggeo", stf.st_geomfromwkt(col("__wkt"))).drop("__wkt")
    IndexStore.saveIndexed(geoms, path, "ggeo", cellSize = 100.0)
    // k=5 must return all four points AND the line (centroid (500,50),
    // distance 10 — nearer than anything else in the store)
    val got = IndexStore.knn(spark, path, 500.0, 60.0, k = 5, tieBreak = Seq("gid"))
      .select(col("gid")).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L),
      s"line (centroid distance 10) missing from kNN result: $got")
  }

  test("persisted kNN keeps expanding when all trees are touched but the box excludes entries") {
    import spark.implicits._
    // cell (0,0): 10 points at x<50; cell (1,0): one point at (199,50).
    // The round-1 box around (150,50) touches BOTH cells yet contains only
    // the single point — 'all trees read' must not terminate the search
    val path = java.nio.file.Files.createTempDirectory("graft_knn_term").toString
    val far = (1L to 10L).map(i => (i, 2.0 + i, 50.0))
    val near = Seq((11L, 199.0, 50.0))
    val df = (far ++ near).toDF("gid", "gx", "gy")
      .withColumn("ggeo", stf.st_point(col("gx"), col("gy")))
    IndexStore.saveIndexed(df, path, "ggeo", cellSize = 100.0)
    val got = IndexStore.knn(spark, path, 150.0, 50.0, k = 5, tieBreak = Seq("gid"))
      .select(col("gid")).collect().map(_.getLong(0))
    assert(got.length == 5, s"expected 5 rows, got ${got.length}: ${got.toSeq}")
  }

  test("quadtree store equals the R-tree store on filter, join and kNN") {
    val qp = s"${System.getProperty("java.io.tmpdir")}/graft_index_store_spec_quad"
    IndexStore.saveIndexed(pts, qp, "pgeo", cellSize, index = "quadtree")
    assert(IndexStore.loadIndexKind(spark, qp) == "quadtree")
    assert(IndexStore.loadIndexKind(spark, storePath) == "rtree")
    val qry = "POLYGON ((12.5 12.5, 62.5 12.5, 62.5 47.5, 12.5 47.5, 12.5 12.5))"
    for (pred <- Seq(JoinPredicate.Intersects, JoinPredicate.ContainedBy)) {
      val r = IndexStore.filter(spark, storePath, qry, pred)
        .select(col("pid")).collect().map(_.getLong(0)).toSet
      val q = IndexStore.filter(spark, qp, qry, pred)
        .select(col("pid")).collect().map(_.getLong(0)).toSet
      assert(q == r, s"filter $pred: quadtree store != rtree store")
    }
    val rj = IndexStore.join(boxes, storePath, "bgeo", JoinPredicate.Contains)
      .select(col("bid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qj = IndexStore.join(boxes, qp, "bgeo", JoinPredicate.Contains)
      .select(col("bid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(qj == rj && rj.nonEmpty)
    val rk = IndexStore.knn(spark, storePath, 33.0, 27.0, k = 7, tieBreak = Seq("pid"))
      .select(col("pid")).collect().map(_.getLong(0)).toSeq
    val qk = IndexStore.knn(spark, qp, 33.0, 27.0, k = 7, tieBreak = Seq("pid"))
      .select(col("pid")).collect().map(_.getLong(0)).toSeq
    assert(qk == rk)
    // the expand-radius kNN JOIN probes stored trees through the same
    // SpatialIndex interface — quadtree store must match the R-tree store
    val rkj = IndexStore.knnJoin(boxes, storePath, "bgeo", "bid", k = 3, tieBreak = "pid")
      .select(col("bid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val qkj = IndexStore.knnJoin(boxes, qp, "bgeo", "bid", k = 3, tieBreak = "pid")
      .select(col("bid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(qkj == rkj && rkj.nonEmpty)
  }

  test("persisted kNN join drops null-geometry left rows in every path") {
    import spark.implicits._
    val queries = Seq((1L, Some(5.0)), (2L, None)).toDF("qid", "qx")
      .withColumn("qgeo", when(col("qx").isNotNull,
        stf.st_point(col("qx"), lit(5.0))))
      .drop("qx")
    // k >= store size forces the terminal cross join — the path that used
    // to emit k arbitrary null-distance pairs for the null-geometry row
    val out = IndexStore.knnJoin(queries, storePath, "qgeo", "qid", k = 5000)
    assert(out.filter(col("qid") === 2L).count() == 0,
      "null-geometry left row must produce no pairs")
    assert(out.filter(col("qid") === 1L).count() > 0)
  }

}
