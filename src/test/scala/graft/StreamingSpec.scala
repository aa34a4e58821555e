package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Structured Streaming end-to-end: MemoryStream -> transform -> memory sink. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("windowed type counts aggregate a micro-batch stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.windowedTypeCounts(events)
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:01:00")
      val t1 = Timestamp.valueOf("2024-01-01 00:02:00")
      val t2 = Timestamp.valueOf("2024-01-01 00:07:00")
      input.addData((t0, "click", 1.0), (t1, "click", 2.0), (t2, "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts")
        .select(col("event_type"), col("cnt"), col("total_value")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("click", 2L, 3.0), ("view", 1L, 5.0)))
    } finally q.stop()
  }

  test("streaming exact dedup drops repeated content within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "text")
    val q = EventStreams.dedupExact(docs, col("text"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:01:00")
      input.addData((t, 1L, "alpha"), (t, 2L, "alpha"), (t, 3L, "beta"))
      q.processAllAvailable()
      input.addData((t, 4L, "alpha"), (t, 5L, "gamma")) // alpha still in horizon
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select(col("doc_id")).collect()
        .map(_.getLong(0)).toSet
      // one survivor per distinct text; doc 1 or 2 for alpha (intra-batch
      // order is nondeterministic), 3 for beta, 5 for gamma — never 4
      assert(!ids.contains(4L) && ids.contains(3L) && ids.contains(5L))
      assert(ids.size == 3 && (ids.contains(1L) || ids.contains(2L)))
    } finally q.stop()
  }

  test("stream-static spatial join: the cell join runs per micro-batch") {
    import graft.functions.stf
    import graft.operators.JoinPredicate
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val regions = Seq((1L, 0.0, 0.0, 10.0, 10.0), (2L, 20.0, 20.0, 30.0, 30.0))
      .toDF("region_id", "x0", "y0", "x1", "y1")
      .select(col("region_id"),
        stf.st_box(col("x0"), col("y0"), col("x1"), col("y1")).as("r_geo"))
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("pt_id", "x", "y")
      .withColumn("p_geo", stf.st_point(col("x"), col("y")))
    val q = EventStreams.spatialJoinStatic(pts, regions, col("p_geo"), col("r_geo"),
        JoinPredicate.CoveredBy, cellSize = 8.0)
      .writeStream.format("memory").queryName("geo_join")
      .outputMode("append").start()
    try {
      input.addData((1L, 5.0, 5.0), (2L, 25.0, 25.0), (3L, 15.0, 15.0))
      q.processAllAvailable()
      input.addData((4L, 1.0, 9.0))
      q.processAllAvailable()
      val got = spark.table("geo_join").select(col("pt_id"), col("region_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 1L), (2L, 2L), (4L, 1L)))
    } finally q.stop()
  }

  test("streaming ingest lands in the declaratively-prunable cell store layout") {
    import graft.functions.stf
    import org.apache.spark.sql.execution.FileSourceScanExec
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_stream_cellstore"
    val path = s"$base/store"
    val ckpt = s"$base/ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))

    val day = 86400000000L
    val input = MemoryStream[(Long, Double, Double, Long)]
    val events = input.toDF().toDF("ev_id", "x", "y", "et")
    val q = EventStreams.ingestCellStore(events, col("x"), col("y"),
      cellSize = 10.0, path = path, checkpoint = ckpt,
      tCol = Some(col("et")), timeBucket = day)
    val rows = Seq(
      (1L, 5.0, 5.0, 1L * day + 7), (2L, 25.0, 25.0, 1L * day + 9),
      (3L, 5.0, 7.0, 3L * day + 1), (4L, 45.0, 45.0, 1L * day + 2))
    try {
      input.addData(rows.take(2): _*)
      q.processAllAvailable()
      input.addData(rows.drop(2): _*)  // a second micro-batch appends
      q.processAllAvailable()
    } finally q.stop()

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan
        .collect { case f: FileSourceScanExec => f }.head.metrics("numFiles").value
    }
    val all = spark.read.parquet(path)
    assert(all.count() == rows.length, "exactly-once append across micro-batches")

    // one st_* predicate over the plain read prunes BOTH directory levels
    val pruned = all.filter(stf.st_intersects(
      stf.st_with_instant(stf.st_point(col("x"), col("y")), col("et")),
      stf.st_with_time(stf.st_geomfromwkt("POLYGON ((0.5 0.5, 9.5 0.5, 9.5 9.5, 0.5 9.5, 0.5 0.5))"),
        lit(1L * day), lit(2L * day))))
    assert(pruned.select(col("ev_id")).collect().map(_.getLong(0)).toSet == Set(1L),
      "spatial box + day-1 window keeps only event 1")
    val prunedFiles = scannedFiles(pruned)
    val totalFiles = scannedFiles(spark.read.parquet(path))
    assert(prunedFiles < totalFiles,
      s"stream-written store not pruned: $prunedFiles of $totalFiles files")
  }

  test("stream-stream spatio-temporal join matches within cell and time window") {
    import graft.functions.stf
    import graft.operators.JoinPredicate
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vehIn = MemoryStream[(Long, Double, Double, Timestamp)]
    val incIn = MemoryStream[(Long, Double, Double, Timestamp)]
    val veh = vehIn.toDF().toDF("veh_id", "vx", "vy", "vts")
      .withColumn("v_geo", stf.st_point(col("vx"), col("vy")))
    // incidents carry a 10-unit box around their location
    val inc = incIn.toDF().toDF("inc_id", "ix", "iy", "its")
      .withColumn("i_geo",
        stf.st_box(col("ix") - 5.0, col("iy") - 5.0, col("ix") + 5.0, col("iy") + 5.0))
    val joined = EventStreams.spatialJoinStreamStream(veh, inc,
        col("v_geo"), col("i_geo"), JoinPredicate.CoveredBy, cellSize = 8.0,
        leftTsCol = "vts", rightTsCol = "its",
        watermark = "10 minutes", joinWindow = "5 minutes")
      .select(col("veh_id"), col("inc_id"))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      val t = Timestamp.valueOf("2024-01-01 00:10:00")
      val tFar = Timestamp.valueOf("2024-01-01 00:30:00") // outside join window
      vehIn.addData((1L, 5.0, 5.0, t), (2L, 50.0, 50.0, t), (3L, 6.0, 6.0, tFar))
      incIn.addData((100L, 5.0, 5.0, t), (200L, 80.0, 80.0, t))
      q.processAllAvailable()
      val got = spark.table("ss_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // veh 1 is inside incident 100's box at a matching time; veh 3 is
      // inside the box but 20 minutes late; veh 2 is elsewhere
      assert(got == Set((1L, 100L)))
    } finally q.stop()
  }

  test("streaming spatial filter applies st_* predicates per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double, Double)]
    val df = input.toDF().toDF("id", "x", "y")
    val filtered = EventStreams.spatialFilter(
      df.withColumn("geo", graft.functions.stf.st_point(col("x"), col("y"))),
      graft.functions.stf.st_containedby(col("geo"),
        graft.functions.stf.st_geomfromwkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")))
    val q = filtered.select("id").writeStream.format("memory")
      .queryName("spatial_stream").outputMode("append").start()
    try {
      input.addData((1L, 5.0, 5.0), (2L, 15.0, 5.0), (3L, 1.0, 9.0))
      q.processAllAvailable()
      val ids = spark.table("spatial_stream").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming ingest drops store-seen spans per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_ingest").toString
    // store knows the span "a b c d e"
    graft.operators.Dedup.buildSpanStore(
      Seq((1L, "a b c d e f")).toDF("id", "t"), col("t"), k = 5, s"$tmp/store")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventStreams.ingestDropSeenSpans(docs, "doc_id", "text",
      k = 5, s"$tmp/store", s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData((10L, "a b c d e zz"), (11L, "p q r s t u"))
      q.processAllAvailable()
      input.addData((12L, "v w x y z a a"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 12L)) // 10 shared "a b c d e" with the store
    } finally q.stop()
  }

  test("streaming near-dup gate drops store near-dups per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("mhgate").toString
    graft.operators.Dedup.buildMinhashStore(
      Seq((1L, "the quick brown fox jumps over the lazy dog again today"))
        .toDF("id", "t"), col("id"), col("t"), s"$tmp/store")
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = EventStreams.ingestDropNearDups(docs, "doc_id", "text",
      s"$tmp/store", s"$tmp/out", s"$tmp/ckpt")
    try {
      // 10 is an exact copy of the stored doc (J = 1 -> dropped);
      // 11 shares nothing (kept)
      input.addData((10L, "the quick brown fox jumps over the lazy dog again today"),
        (11L, "unrelated words entirely disjoint from anything stored here"))
      q.processAllAvailable()
      // 12 appends three tokens: 9 shared 3-gram shingles of 12 total,
      // J = 9/12 = 0.75 < 4/5 -> kept
      input.addData((12L, "the quick brown fox jumps over the lazy dog again today yes yes yes"))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$tmp/out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 12L))
    } finally q.stop()
  }

  test("streaming kNN join against frozen stored trees matches the batch knnJoin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.stf
    val rnd = new scala.util.Random(31)
    val stored = (0 until 150).map { i =>
      (i.toLong, rnd.nextInt(20) * 5.0, rnd.nextInt(20) * 5.0)
    }.toDF("sid", "sx", "sy")
      .withColumn("sgeo", stf.st_point(col("sx"), col("sy")))
    val dir = java.nio.file.Files.createTempDirectory("knnstream").toString
    graft.sources.IndexStore.saveIndexed(stored, dir, "sgeo", cellSize = 25.0)
    val probes = (0 until 30).map { i =>
      (1000L + i, rnd.nextDouble() * 100, rnd.nextDouble() * 100)
    }
    val probeDf = probes.toDF("qid", "qx", "qy")
      .withColumn("qgeo", stf.st_point(col("qx"), col("qy")))
    val want = graft.sources.IndexStore
      .knnJoin(probeDf, dir, "qgeo", "qid", k = 3)
      .select(col("qid"), col("sid"), col("knn_dist")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val outPath = java.nio.file.Files.createTempDirectory("knnout").toString
    val input = MemoryStream[(Long, Double, Double)]
    val stream = input.toDF().toDF("qid", "qx", "qy")
      .withColumn("qgeo", stf.st_point(col("qx"), col("qy")))
    val q = graft.streaming.EventStreams.knnJoinStored(stream, "qgeo", "qid",
      dir, k = 3, outPath,
      java.nio.file.Files.createTempDirectory("knnck").toString)
    try {
      input.addData(probes.take(12).toIndexedSeq)
      q.processAllAvailable()
      input.addData(probes.drop(12).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.read.parquet(outPath)
        .select(col("qid"), col("sid"), col("knn_dist")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("streaming DBSCAN classify assigns points against the frozen model per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("dbscangate").toString
    // two 3-point columns 8 apart -> clusters 0 and 10 at eps=2/minPts=3
    val train = Seq(
      (0L, 0.0, 0.0), (1L, 0.0, 1.0), (2L, 0.0, 2.0),
      (10L, 8.0, 0.0), (11L, 8.0, 1.0), (12L, 8.0, 2.0)).toDF("id", "x", "y")
    graft.operators.DBSCAN.saveModel(
      graft.operators.DBSCAN.model(train, col("id"), col("x"), col("y"), 2.0, 3),
      s"$tmp/model", eps = 2.0, minPts = 3)
    val input = MemoryStream[(Long, Double, Double)]
    val pts = input.toDF().toDF("pid", "px", "py")
    val q = EventStreams.classifyDbscan(pts, "pid", "px", "py",
      s"$tmp/model", s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData((100L, 0.5, 1.0), (101L, 8.5, 1.0), (102L, 50.0, 50.0))
      q.processAllAvailable()
      input.addData((103L, 0.0, 3.5)) // within eps of core (0,2) -> cluster 0
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 0L, 101L -> 10L, 102L -> -1L, 103L -> 0L))
      // the stream labels equal the batch predictStored labels exactly
      val batch = graft.operators.DBSCAN.predictStored(spark, s"$tmp/model",
          Seq((100L, 0.5, 1.0), (101L, 8.5, 1.0), (102L, 50.0, 50.0),
            (103L, 0.0, 3.5)).toDF("pid", "px", "py"),
          col("pid"), col("px"), col("py"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(batch == got)
    } finally q.stop()
  }

  test("streaming n-dim DBSCAN classify matches the stored-model batch labels") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("dbscanvecgate").toString
    val train = Seq(
      (0L, Array(0f, 0f, 0f)), (1L, Array(0f, 0f, 1f)), (2L, Array(0f, 0f, 2f)),
      (10L, Array(0f, 0f, 30f)), (11L, Array(0f, 0f, 31f)),
      (12L, Array(0f, 0f, 32f))).toDF("id", "v")
    graft.operators.DBSCAN.saveModelVec(
      graft.operators.DBSCAN.modelVec(train, col("id"), col("v"),
        dims = 3, eps = 1.5, minPts = 2),
      s"$tmp/model", dims = 3, eps = 1.5, minPts = 2)
    assert(graft.operators.DBSCAN.loadModelVecMeta(spark, s"$tmp/model") == ((3, 1.5, 2)))
    val input = MemoryStream[(Long, Array[Float])]
    val pts = input.toDF().toDF("pid", "pv")
    val q = EventStreams.classifyDbscanVec(pts, "pid", "pv",
      s"$tmp/model", s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData((100L, Array(0f, 0f, 1.4f)), (101L, Array(0f, 0f, 30.5f)),
        (102L, Array(99f, 99f, 99f)))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 0L, 101L -> 10L, 102L -> -1L))
    } finally q.stop()
  }

  test("streaming classify routes HIGH-dim stored models through the pivot kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("dbscanhdgate").toString
    // two 16-d blobs, model built by the PIVOT kernel and frozen at
    // dims=16 — predictVecStored must route past the grid cap, so the
    // same classifyDbscanVec gate serves high-dim models unchanged
    val train = ((0 until 6).map(i =>
        (i.toLong, Array.fill(16)(0f).updated(0, i * 0.2f))) ++
      (10 until 16).map(i =>
        (i.toLong, Array.fill(16)(30f).updated(1, i * 0.2f)))).toDF("id", "v")
    graft.operators.DBSCAN.saveModelVec(
      graft.operators.DBSCAN.modelVecPivot(train, col("id"), col("v"),
        dims = 16, eps = 2.0, minPts = 3),
      s"$tmp/model", dims = 16, eps = 2.0, minPts = 3)
    val probes = Seq(
      (100L, Array.fill(16)(0.2f)),   // blob A
      (101L, Array.fill(16)(30f).updated(1, 2.5f)), // blob B center-ish
      (102L, Array.fill(16)(500f)))   // noise
    val batch = graft.operators.DBSCAN.predictVecStored(spark, s"$tmp/model",
        probes.toDF("pid", "pv"), col("pid"), col("pv"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.classifyDbscanVec(input.toDF().toDF("pid", "pv"),
      "pid", "pv", s"$tmp/model", s"$tmp/out", s"$tmp/ckpt")
    try {
      input.addData(probes: _*)
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == batch)
      assert(got(102L) == -1L && got(100L) != -1L && got(101L) != -1L)
      assert(got(100L) != got(101L)) // the blobs stay distinct clusters
    } finally q.stop()
  }

  test("streaming cosine gate drops embedding near-dups per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("clgate").toString
    // one stored direction (1, 0); tables=48/planes=1 -> every non-oppositie
    // vector collides in some table w.h.p., exact refine decides
    graft.operators.Dedup.buildCosineLshStore(
      Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v"), col("id"), col("v"),
      s"$tmp/store", tables = 48, planes = 1)
    val input = MemoryStream[(Long, Array[Float])]
    val vecs = input.toDF().toDF("vec_id", "vec")
    val q = EventStreams.ingestDropSeenCosine(vecs, "vec_id", "vec",
      s"$tmp/store", s"$tmp/out", s"$tmp/ckpt", threshold = 0.9)
    try {
      // 10 is nearly parallel to the stored vector (cos ~ 0.995 -> dropped);
      // 11 is orthogonal (cos 0 -> kept)
      input.addData((10L, Array(1.0f, 0.1f)), (11L, Array(0.0f, 1.0f)))
      q.processAllAvailable()
      // 12 at 45 degrees: cos ~ 0.707 < 0.9 -> kept
      input.addData((12L, Array(1.0f, 1.0f)))
      q.processAllAvailable()
      val kept = spark.read.parquet(s"$tmp/out").select("vec_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(11L, 12L))
    } finally q.stop()
  }

  test("streaming binary-index ingest folds micro-batches; the streaming Hamming gate matches batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("binary_ingest").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val all = embs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (odds1, odds2) = all.filter(_._1 % 2 == 1).splitAt(100)
    val input = MemoryStream[(Long, Array[Float])]
    val docs = input.toDF().toDF("vec_id", "embedding")
    val q = EventStreams.ingestBinaryIndex(docs, "vec_id", "embedding",
      s"$tmp/idx", s"$tmp/ckpt", dim = 64, bits = 128, salt = "sb1")
    try {
      input.addData(odds1.toIndexedSeq); q.processAllAvailable()
      input.addData(odds2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // the folded store holds exactly the codes one batch pass computes
    val streamedCodes = spark.read.parquet(s"$tmp/idx/codes")
      .select("id", "code").collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    val direct = graft.operators.Similarity
      .signQuantize(embs.filter(col("vec_id") % 2 === 1), col("embedding"),
        dim = 64, bits = 128, salt = "sb1")
      .select(col("vec_id"), col("code"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet
    assert(streamedCodes == direct && streamedCodes.nonEmpty)
    // the streaming gate lands exactly what the batch gate keeps
    val gateIn = MemoryStream[(Long, Array[Float])]
    val gq = EventStreams.ingestDropSeenHamming(
      gateIn.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      s"$tmp/idx", s"$tmp/out", s"$tmp/ckpt_g", maxHamming = 3)
    try { gateIn.addData(all.toIndexedSeq); gq.processAllAvailable() } finally gq.stop()
    val landed = spark.read.parquet(s"$tmp/out").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val batchKept = graft.operators.Similarity
      .dropSeenHamming(embs, col("vec_id"), col("embedding"), s"$tmp/idx", 3)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(landed == batchKept && landed.nonEmpty && !landed.exists(_ % 2 == 1))
    // a restart with different params would mix two bit spaces -> refuse
    val err1 = intercept[IllegalArgumentException] {
      EventStreams.ingestBinaryIndex(docs, "vec_id", "embedding",
        s"$tmp/idx", s"$tmp/ckpt2", dim = 64, bits = 128, salt = "OTHER")
    }
    assert(err1.getMessage.contains("bit spaces"))
    // flat-store guard: a batch-built index refuses the streaming layout
    graft.operators.Similarity.buildBinaryIndex(embs, s"$tmp/flat",
      col("vec_id"), col("embedding"), dim = 64, bits = 128, salt = "sb1")
    val err2 = intercept[IllegalArgumentException] {
      EventStreams.ingestBinaryIndex(docs, "vec_id", "embedding",
        s"$tmp/flat", s"$tmp/ckpt3", dim = 64, bits = 128, salt = "sb1")
    }
    assert(err2.getMessage.contains("BATCH-built"))
  }

  test("streaming IVF ingest under frozen centroids == one-pass batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.Similarity.trainIvfCentroids(embs, s"$tmp/stream",
      col("vec_id"), col("embedding"), nlist = 8)
    val all = embs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.ingestIvfStore(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/stream", s"$tmp/ckpt")
    val (h1, h2) = all.splitAt(all.length / 2)
    try {
      input.addData(h1.toIndexedSeq); q.processAllAvailable()
      input.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // one-pass reference build with the SAME quantizer (same seed/sample)
    graft.operators.Similarity.buildIvfIndex(embs, s"$tmp/batch",
      col("vec_id"), col("embedding"), nlist = 8)
    val queries = embs.filter(col("vec_id") < 5)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = top(graft.operators.Similarity.ivfTopKIndexed(
      queries, s"$tmp/stream", col("vec_id"), col("embedding"), k = 5, nprobe = 3))
    val onePass = top(graft.operators.Similarity.ivfTopKIndexed(
      queries, s"$tmp/batch", col("vec_id"), col("embedding"), k = 5, nprobe = 3))
    assert(streamed == onePass && streamed.nonEmpty)
    // guards: a batch-built store refuses streaming; no quantizer refuses too
    val docs = input.toDF().toDF("vec_id", "embedding")
    val err1 = intercept[IllegalArgumentException] {
      EventStreams.ingestIvfStore(docs, "vec_id", "embedding",
        s"$tmp/batch", s"$tmp/ck2")
    }
    assert(err1.getMessage.contains("BATCH-built"))
    val err2 = intercept[IllegalArgumentException] {
      EventStreams.ingestIvfStore(docs, "vec_id", "embedding",
        s"$tmp/fresh", s"$tmp/ck3")
    }
    assert(err2.getMessage.contains("quantizer"))
  }

  test("streaming PQ ingest under frozen codebooks == one-pass batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("pq_ingest").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.Similarity.trainPqCodebooks(embs, s"$tmp/stream",
      col("vec_id"), col("embedding"), m = 8, ksub = 16, iters = 2)
    val all = embs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.ingestPqStore(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/stream", s"$tmp/ckpt")
    val (h1, h2) = all.splitAt(all.length / 2)
    try {
      input.addData(h1.toIndexedSeq); q.processAllAvailable()
      input.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    graft.operators.Similarity.buildPqIndex(embs, s"$tmp/batch",
      col("vec_id"), col("embedding"), m = 8, ksub = 16, iters = 2)
    val queries = embs.filter(col("vec_id") < 5)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = top(graft.operators.Similarity.pqTopKIndexed(
      queries, s"$tmp/stream", col("vec_id"), col("embedding"), k = 5))
    val onePass = top(graft.operators.Similarity.pqTopKIndexed(
      queries, s"$tmp/batch", col("vec_id"), col("embedding"), k = 5))
    assert(streamed == onePass && streamed.nonEmpty)
    val docs = input.toDF().toDF("vec_id", "embedding")
    val err1 = intercept[IllegalArgumentException] {
      EventStreams.ingestPqStore(docs, "vec_id", "embedding",
        s"$tmp/batch", s"$tmp/ck2")
    }
    assert(err1.getMessage.contains("BATCH-built"))
    val err2 = intercept[IllegalArgumentException] {
      EventStreams.ingestPqStore(docs, "vec_id", "embedding",
        s"$tmp/fresh", s"$tmp/ck3")
    }
    assert(err2.getMessage.contains("codebooks"))
  }

  test("streaming IVF-PQ ingest under a frozen model == one-pass batch build") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("ivfpq_ingest").toString
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.operators.Similarity.trainIvfPqModel(embs, s"$tmp/stream",
      col("vec_id"), col("embedding"), nlist = 4, m = 8, ksub = 16, iters = 2)
    val all = embs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val input = MemoryStream[(Long, Array[Float])]
    val q = EventStreams.ingestIvfPqStore(input.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/stream", s"$tmp/ckpt")
    val (h1, h2) = all.splitAt(all.length / 2)
    try {
      input.addData(h1.toIndexedSeq); q.processAllAvailable()
      input.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    graft.operators.Similarity.buildIvfPqIndex(embs, s"$tmp/batch",
      col("vec_id"), col("embedding"), nlist = 4, m = 8, ksub = 16, iters = 2)
    val queries = embs.filter(col("vec_id") < 5)
    def top(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val streamed = top(graft.operators.Similarity.ivfPqTopKIndexed(
      queries, s"$tmp/stream", col("vec_id"), col("embedding"), k = 5, nprobe = 2))
    val onePass = top(graft.operators.Similarity.ivfPqTopKIndexed(
      queries, s"$tmp/batch", col("vec_id"), col("embedding"), k = 5, nprobe = 2))
    assert(streamed == onePass && streamed.nonEmpty)
    val docs = input.toDF().toDF("vec_id", "embedding")
    val err1 = intercept[IllegalArgumentException] {
      EventStreams.ingestIvfPqStore(docs, "vec_id", "embedding",
        s"$tmp/batch", s"$tmp/ck2")
    }
    assert(err1.getMessage.contains("BATCH-built"))
    val err2 = intercept[IllegalArgumentException] {
      EventStreams.ingestIvfPqStore(docs, "vec_id", "embedding",
        s"$tmp/fresh", s"$tmp/ck3")
    }
    assert(err2.getMessage.contains("model"))
  }

  test("streaming MinHash/cosine-LSH store ingests fold to the one-pass builds") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("lsh_ingest").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    // --- MinHash: stream the even docs in two batches ---
    val evenDocs = docs.filter(col("doc_id") % 2 === 0)
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val mhIn = MemoryStream[(Long, String)]
    val mq = EventStreams.ingestMinhashStore(mhIn.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp/mh", s"$tmp/ck_mh")
    val (d1, d2) = evenDocs.splitAt(evenDocs.length / 2)
    try {
      mhIn.addData(d1.toIndexedSeq); mq.processAllAvailable()
      mhIn.addData(d2.toIndexedSeq); mq.processAllAvailable()
    } finally mq.stop()
    graft.operators.Dedup.buildMinhashStore(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), s"$tmp/mh_batch")
    val odd = docs.filter(col("doc_id") % 2 === 1)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(graft.operators.Dedup.dropSeenNearDups(odd, col("doc_id"), col("text"), s"$tmp/mh"))
      == ids(graft.operators.Dedup.dropSeenNearDups(odd, col("doc_id"), col("text"), s"$tmp/mh_batch")))
    // param-mismatch refusal
    val err = intercept[IllegalArgumentException] {
      EventStreams.ingestMinhashStore(mhIn.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$tmp/mh", s"$tmp/ck_mh2", bands = 16)
    }
    assert(err.getMessage.contains("hash spaces"))
    // --- cosine LSH: stream the even vectors in two batches ---
    val evenVecs = embs.filter(col("vec_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val clIn = MemoryStream[(Long, Array[Float])]
    val cq = EventStreams.ingestCosineLshStore(clIn.toDF().toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$tmp/cl", s"$tmp/ck_cl", tables = 48, planes = 3)
    val (v1, v2) = evenVecs.splitAt(evenVecs.length / 2)
    try {
      clIn.addData(v1.toIndexedSeq); cq.processAllAvailable()
      clIn.addData(v2.toIndexedSeq); cq.processAllAvailable()
    } finally cq.stop()
    graft.operators.Dedup.buildCosineLshStore(embs.filter(col("vec_id") % 2 === 0),
      col("vec_id"), col("embedding"), s"$tmp/cl_batch", tables = 48, planes = 3)
    val oddV = embs.filter(col("vec_id") % 2 === 1)
    def vids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(vids(graft.operators.Dedup.dropSeenCosine(oddV, col("vec_id"), col("embedding"), s"$tmp/cl", 0.42))
      == vids(graft.operators.Dedup.dropSeenCosine(oddV, col("vec_id"), col("embedding"), s"$tmp/cl_batch", 0.42)))
    // flat-store refusal (the batch build wrote a root marker)
    val err2 = intercept[IllegalArgumentException] {
      EventStreams.ingestCosineLshStore(clIn.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", s"$tmp/cl_batch", s"$tmp/ck_cl2", tables = 48, planes = 3)
    }
    assert(err2.getMessage.contains("BATCH-built"))
  }

  test("streaming tokenization from frozen BPE/WordPiece/unigram stores matches batch apply") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("tok_stream").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.operators.Bpe.buildMergeStore(
      graft.operators.Bpe.learnBpe(docs, col("text"), numMerges = 20), s"$tmp/bpe")
    graft.operators.Wordpiece.buildVocabStore(
      graft.operators.Wordpiece.learnVocab(docs, col("text"), 60, 4), s"$tmp/wp", 4)
    val rows = docs.select("doc_id", "text").limit(40).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q1 = EventStreams.tokenizeBpe(input.toDF().toDF("doc_id", "text"),
      "text", s"$tmp/bpe", s"$tmp/out_bpe", s"$tmp/ck1")
    val input2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.tokenizeWordpiece(input2.toDF().toDF("doc_id", "text"),
      "text", s"$tmp/wp", s"$tmp/out_wp", s"$tmp/ck2")
    val input3 = MemoryStream[(Long, String)]
    val q3 = EventStreams.tokenizeUnigram(input3.toDF().toDF("doc_id", "text"),
      "text", s"$tmp/wp", s"$tmp/out_ug", s"$tmp/ck3")
    try {
      input.addData(rows.toIndexedSeq); q1.processAllAvailable()
      input2.addData(rows.toIndexedSeq); q2.processAllAvailable()
      input3.addData(rows.toIndexedSeq); q3.processAllAvailable()
    } finally { q1.stop(); q2.stop(); q3.stop() }
    def byId(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("doc_id"), col(c)).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val batchDf = spark.createDataFrame(rows.toIndexedSeq).toDF("doc_id", "text")
    assert(byId(spark.read.parquet(s"$tmp/out_bpe"), "bpe_tokens") ==
      byId(graft.operators.Bpe.applyBpeStored(batchDf, col("text"), s"$tmp/bpe"), "bpe_tokens"))
    assert(byId(spark.read.parquet(s"$tmp/out_wp"), "wp_tokens") ==
      byId(graft.operators.Wordpiece.applyWordpieceStored(batchDf, col("text"), s"$tmp/wp"), "wp_tokens"))
    // the unigram twin serves from the SAME frozen store
    assert(byId(spark.read.parquet(s"$tmp/out_ug"), "ug_tokens") ==
      byId(graft.operators.Unigram.applyUnigramStored(batchDf, col("text"), s"$tmp/wp"), "ug_tokens"))
  }

  test("text scrub pipeline (normalize -> redact -> fingerprint) runs per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the scrub ops are stateless codegen'd projections, so they compose
    // onto readStream unchanged — this pins that no op silently demands a
    // batch-only feature (no window/collect/localCheckpoint in the path)
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val scrubbed = graft.operators.TextAnalysis.withFingerprints(
      graft.operators.TextAnalysis.redactPii(
        graft.operators.TextAnalysis.normalizeText(docs, col("text")),
        col("text_norm")),
      col("text_redacted"))
    val q = scrubbed.writeStream.format("memory").queryName("scrub_out")
      .outputMode("append").start()
    try {
      input.addData((1L, "  Mail ME at Bob@Example.com  NOW "), (2L, "plain"))
      q.processAllAvailable()
      val got = spark.table("scrub_out")
        .select(col("doc_id"), col("text_redacted"), col("fp_winnow")).collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
      assert(got(1L)._1 == "mail me at <EMAIL> now")
      assert(got(2L)._1 == "plain")
      // fingerprints computed in-stream match the batch kernel on the same text
      assert(got(2L)._2 ==
        graft.functions.TextOps.rollingMinFp(
          org.apache.spark.unsafe.types.UTF8String.fromString("plain")))
    } finally q.stop()
  }

  test("streaming BM25 gate scores micro-batches with frozen index stats") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("bm25stream").toString
    graft.operators.TextSearch.buildTextIndex(docs, dir, col("doc_id"), col("text"))
    val terms = Seq("spark", "hash")
    // batch ground truth from the SAME store: every doc's exact score
    val want = graft.operators.TextSearch
      .bm25TopKExactIndexed(spark, dir, terms, k = 100000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val gated = graft.streaming.EventStreams.scoreBm25Indexed(
      stream, "text", dir, terms, minScoreE8 = Some(0L))
    val q = gated.writeStream.format("memory").queryName("bm25_out")
      .outputMode("append").start()
    try {
      val batch = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      input.addData(batch.take(25).toIndexedSeq)
      input.addData(batch.drop(25).toIndexedSeq) // two micro-batches
      q.processAllAvailable()
      val got = spark.table("bm25_out")
        .select(col("doc_id"), col("score_e8")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the stream keeps exactly the docs the batch mode scores > 0, with
      // identical integer scores — frozen stats make batches comparable
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming inverted-index ingest == one-pass build through BM25 serving") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val terms = Seq("spark", "hash", "join")
    // ground truth: a one-pass FLAT build over the same corpus
    val flat = java.nio.file.Files.createTempDirectory("textflat2").toString
    graft.operators.TextSearch.buildTextIndex(docs, flat, col("doc_id"), col("text"))
    val want = graft.operators.TextSearch
      .bm25TopKExactIndexed(spark, flat, terms, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("textseg2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("textsegck").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.EventStreams.ingestTextIndex(
      stream, "doc_id", "text", dir, ckpt)
    try {
      val batch = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      input.addData(batch.take(30).toIndexedSeq)
      q.processAllAvailable()
      input.addData(batch.drop(30).toIndexedSeq) // second segment
      q.processAllAvailable()
      val got = graft.operators.TextSearch
        .bm25TopKExactIndexed(spark, dir, terms, k = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want && got.nonEmpty)
    } finally q.stop()
    // flat-store refusal: the stream must not append into a flat build
    val e = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestTextIndex(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", flat,
        java.nio.file.Files.createTempDirectory("textsegck2").toString)
    }
    assert(e.getMessage.contains("flat store"))
  }

  test("streaming takedown feed: deletes drain into the text index without rebuild") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("textdelstream").toString
    graft.operators.TextSearch.appendTextBatch(docs, col("doc_id"), col("text"),
      dir, batchId = 0L)
    val terms = Seq("spark", "hash")
    // ground truth: one-pass build over the remaining corpus
    val flat = java.nio.file.Files.createTempDirectory("textdelflat").toString
    graft.operators.TextSearch.buildTextIndex(docs.filter(col("doc_id") % 5 =!= 2),
      flat, col("doc_id"), col("text"))
    val want = graft.operators.TextSearch
      .bm25TopKExactIndexed(spark, flat, terms, k = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val input = MemoryStream[Long]
    val q = graft.streaming.EventStreams.ingestDeletes(
      input.toDF().toDF("doc_id"), "doc_id", dir,
      java.nio.file.Files.createTempDirectory("textdelck").toString, kind = "text")
    try {
      val victims = docs.filter(col("doc_id") % 5 === 2)
        .select(col("doc_id")).collect().map(_.getLong(0))
      input.addData(victims.take(10).toIndexedSeq)
      q.processAllAvailable()
      input.addData(victims.drop(10).toIndexedSeq) // two delete batches
      q.processAllAvailable()
      val got = graft.operators.TextSearch
        .bm25TopKExactIndexed(spark, dir, terms, k = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want && got.nonEmpty)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestDeletes(
        input.toDF().toDF("doc_id"), "doc_id", dir,
        java.nio.file.Files.createTempDirectory("textdelck2").toString,
        kind = "nosuch")
    }
  }

  test("streaming LM-store ingest == one-pass build through the fluency scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val want = graft.operators.TextAnalysis
      .withBigramFluency(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dir = java.nio.file.Files.createTempDirectory("lmseg2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lmsegck").toString
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val q = graft.streaming.EventStreams.ingestLmStore(stream, "text", dir, ckpt)
    try {
      val batch = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      input.addData(batch.take(20).toIndexedSeq)
      q.processAllAvailable()
      input.addData(batch.drop(20).toIndexedSeq)
      q.processAllAvailable()
      val got = graft.operators.TextAnalysis
        .withBigramFluencyIndexed(docs, col("doc_id"), col("text"), dir)
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
    // the streaming GATE serves from the segmented store identically
    val gateGot = graft.streaming.EventStreams
      .scoreFluencyIndexed(docs, "text", dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gateGot == want)
    // flat-store refusal
    val flat = java.nio.file.Files.createTempDirectory("lmflat2").toString
    graft.operators.TextAnalysis.buildLmStore(docs, flat, col("text"))
    val e = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestLmStore(
        input.toDF().toDF("doc_id", "text"), "text", flat,
        java.nio.file.Files.createTempDirectory("lmsegck2").toString)
    }
    assert(e.getMessage.contains("flat store"))
  }

  test("streaming fluency gate scores micro-batches with the frozen LM store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lmstream").toString
    graft.operators.TextAnalysis.buildLmStore(docs, dir, col("text"))
    // live self-scored ground truth: the frozen store was trained on the
    // same corpus, so the stream must reproduce it exactly
    val want = graft.operators.TextAnalysis
      .withBigramFluency(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val gated = graft.streaming.EventStreams.scoreFluencyIndexed(stream, "text", dir)
    val q = gated.writeStream.format("memory").queryName("fl_out")
      .outputMode("append").start()
    try {
      input.addData(docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("fl_out")
        .select(col("doc_id"), col("n_bigrams"), col("fluency_e6")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == want)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming counting-bloom ingest + delete feed == the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Sketches
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("cbstream").toString
    Sketches.initCountingBloomStore(spark, dir, mBits = 1L << 16, k = 5)
    val rows = docs.filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val qIn = graft.streaming.EventStreams.ingestCountingBloom(
      input.toDF().toDF("doc_id", "text"), "text", dir,
      java.nio.file.Files.createTempDirectory("cbck1").toString)
    try {
      input.addData(rows.take(20).toIndexedSeq); qIn.processAllAvailable()
      input.addData(rows.drop(20).toIndexedSeq); qIn.processAllAvailable()
    } finally qIn.stop()
    val del = MemoryStream[(Long, String)]
    val qDel = graft.streaming.EventStreams.ingestDeletes(
      del.toDF().toDF("doc_id", "text"), "text", dir,
      java.nio.file.Files.createTempDirectory("cbck2").toString, kind = "cbloom")
    try {
      del.addData(rows.filter(_._1 % 10 == 5).toIndexedSeq)
      qDel.processAllAvailable()
    } finally qDel.stop()
    // == a plain filter over the remaining (%10=0) keys
    val wordsRem = Sketches.bloomWords(docs.filter(col("doc_id") % 10 === 0),
      col("text"), 1L << 16, 5)
    val want = Sketches.bloomMightContain(docs, col("text"), wordsRem,
        1L << 16, 5)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = Sketches.countingBloomMightContain(docs, col("text"), dir)
      .select(col("doc_id"), col("might_contain")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == want && got.values.exists(identity))
  }

  test("streaming DSIR raw ingest == one-pass build through both scorers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docs.filter(col("source") === "src0")
    val flat = java.nio.file.Files.createTempDirectory("dsflat3").toString
    graft.operators.Pipeline.buildDsirStore(docs, col("text"), target,
      col("text"), 256, flat)
    val want = graft.operators.Pipeline
      .dsirScoresIndexed(docs, col("doc_id"), col("text"), flat)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val seg = java.nio.file.Files.createTempDirectory("dsseg2").toString
    graft.operators.Pipeline.initDsirStore(target, col("text"), 256, seg)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.ingestDsirRaw(
      input.toDF().toDF("doc_id", "text"), "text", seg,
      java.nio.file.Files.createTempDirectory("dssegck").toString)
    try {
      val rows = docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1)))
      input.addData(rows.take(20).toIndexedSeq)
      q.processAllAvailable()
      input.addData(rows.drop(20).toIndexedSeq)
      q.processAllAvailable()
      val got = graft.operators.Pipeline
        .dsirScoresIndexed(docs, col("doc_id"), col("text"), seg)
        .select(col("doc_id"), col("dsir_score_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want && got.nonEmpty)
      // the streaming GATE serves from the segmented store identically
      val gateGot = graft.streaming.EventStreams
        .scoreDsirIndexed(docs, "text", seg)
        .select(col("doc_id"), col("dsir_score_e6"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gateGot == want)
    } finally q.stop()
    intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestDsirRaw(
        input.toDF().toDF("doc_id", "text"), "text", flat,
        java.nio.file.Files.createTempDirectory("dssegck2").toString)
    }
  }

  test("streaming DSIR gate scores micro-batches with the frozen ratio store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val target = docs.filter(col("source") === "src0")
    val dir = java.nio.file.Files.createTempDirectory("dsirstream").toString
    graft.operators.Pipeline.buildDsirStore(docs, col("text"), target, col("text"), 256, dir)
    // ground truth: the join-based store scorer over the same corpus
    val want = graft.operators.Pipeline
      .dsirScoresIndexed(docs, col("doc_id"), col("text"), dir)
      .select(col("doc_id"), col("dsir_score_e6")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    // threshold at the median-ish score: the gate must both score AND drop
    val cut = want.values.toSeq.sorted.apply(want.size / 2)
    val gated = graft.streaming.EventStreams.scoreDsirIndexed(
      stream, "text", dir, minScoreE6 = Some(cut))
    val q = gated.writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    try {
      input.addData(docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("dsir_out")
        .select(col("doc_id"), col("dsir_score_e6")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want.filter { case (_, s) => s >= cut })
      assert(got.nonEmpty && got.size < want.size)
    } finally q.stop()
  }

  test("streaming fluency gate refuses an LM store past the broadcast bound") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lmguard").toString
    graft.operators.TextAnalysis.buildLmStore(docs, dir, col("text"))
    // plan-time refusal: the guard must fire on the call, before any
    // streaming query starts, and name BOTH join-based alternatives
    // (batch op and the foreachBatch streaming route)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.scoreFluencyIndexed(
        docs.select(col("doc_id"), col("text")), "text", dir, maxBroadcastRows = 1L)
    }
    assert(err.getMessage.contains("withBigramFluencyIndexed"))
    assert(err.getMessage.contains("scoreFluencyJoined"))
  }

  test("over-cap streaming fluency route: foreachBatch join scorer == batch scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lmjoined").toString
    graft.operators.TextAnalysis.buildLmStore(docs, dir, col("text"))
    val want = graft.operators.TextAnalysis
      .withBigramFluencyIndexed(docs, col("doc_id"), col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files.createTempDirectory("lmjoinout").toString
    val input = MemoryStream[(Long, String)]
    // two micro-batches: each scores through the JOIN-based scorer (the
    // documented route past FluencyBroadcastBound — nothing collected to
    // the driver) and writes its own batch_id partition
    val q = graft.streaming.EventStreams.scoreFluencyJoined(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, out,
      java.nio.file.Files.createTempDirectory("lmjoinck").toString)
    try {
      input.addData(rows.take(100).toIndexedSeq); q.processAllAvailable()
      input.addData(rows.drop(100).toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
    // gated variant keeps exactly the rows at/above the cut
    val out2 = java.nio.file.Files.createTempDirectory("lmjoinout2").toString
    val cut = want.values.map(_._2).toSeq.sorted.apply(want.size / 2)
    val input2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.EventStreams.scoreFluencyJoined(
      input2.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, out2,
      java.nio.file.Files.createTempDirectory("lmjoinck2").toString,
      minFluencyE6 = Some(cut))
    try {
      input2.addData(rows.toIndexedSeq); q2.processAllAvailable()
    } finally q2.stop()
    val kept = spark.read.parquet(out2).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == want.filter(_._2._2 >= cut).keySet)
  }

  test("streaming trigram fluency: join scorer == batch stupid-backoff scorer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("lm3joined").toString
    // model on the even half; the streamed odd half exercises the backoff
    graft.operators.TextAnalysis.appendLmBatch(
      docs.filter(col("doc_id") % 2 === 0), col("text"), dir, batchId = 0L)
    val held = docs.filter(col("doc_id") % 2 === 1)
    val want = graft.operators.TextAnalysis
      .withTrigramFluencyIndexed(held, col("doc_id"), col("text"), dir)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = held.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val out = java.nio.file.Files.createTempDirectory("lm3joinout").toString
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.scoreFluency3Joined(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", dir, out,
      java.nio.file.Files.createTempDirectory("lm3joinck").toString)
    try {
      input.addData(rows.take(50).toIndexedSeq); q.processAllAvailable()
      input.addData(rows.drop(50).toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("windowed streaming HLL registers equal the batch registers per closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "user")
    val q = graft.streaming.EventStreams
      .windowedDistinctHll(events, "ts", "user", "10 minutes", "5 minutes", pBits = 8)
      .writeStream.format("memory").queryName("hll_win")
      .outputMode("complete").start()
    // window 1 (00:00-00:10): users u0..u19 each appearing 3 times;
    // window 2 (00:10-00:20): users u10..u24 (distinct 15, overlap irrelevant)
    val t1 = Timestamp.valueOf("2024-01-01 00:03:00")
    val t2 = Timestamp.valueOf("2024-01-01 00:14:00")
    try {
      input.addData((0 until 60).map(i => (t1, s"u${i % 20}")))
      input.addData((0 until 15).map(i => (t2, s"u${i + 10}")))
      q.processAllAvailable()
      val got = spark.table("hll_win")
        .select(col("win.start").cast("string").as("ws"), col("bucket"), col("rho"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      // batch replay: same rows, grouped by their window start
      val batch = ((0 until 60).map(i => ("2024-01-01 00:00:00", s"u${i % 20}")) ++
        (0 until 15).map(i => ("2024-01-01 00:10:00", s"u${i + 10}"))).toDF("ws", "user")
      val want = graft.operators.Sketches
        .hllRegisters(batch, col("ws"), col("user"), pBits = 8, groupName = "ws")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want)
      // estimates from the streamed registers land on the exact counts
      val est = graft.operators.Sketches.hllEstimateBy(
          spark.table("hll_win").withColumn("ws", col("win.start").cast("string")),
          pBits = 8, Seq("ws"))
        .select(col("ws"), col("est")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(math.abs(est("2024-01-01 00:00:00") - 20.0) < 4.0)
      assert(math.abs(est("2024-01-01 00:10:00") - 15.0) < 4.0)
    } finally q.stop()
  }

  test("windowed streaming CMS counters equal the batch sketch per closed window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val q = graft.streaming.EventStreams
      .windowedTrendingCms(input.toDF().toDF("ts", "term"), "ts", "term",
        "10 minutes", "5 minutes", width = 256)
      .writeStream.format("memory").queryName("cms_win")
      .outputMode("complete").start()
    val t1 = Timestamp.valueOf("2024-01-01 00:02:00")
    val t2 = Timestamp.valueOf("2024-01-01 00:13:00")
    val w1 = (0 until 40).map(i => (t1, s"term${i % 8}"))
    val w2 = (0 until 25).map(i => (t2, s"term${i % 5}"))
    try {
      input.addData(w1 ++ w2); q.processAllAvailable()
      val slice1 = spark.table("cms_win")
        .filter(col("win.start").cast("string") === "2024-01-01 00:00:00")
        .select(col("row"), col("col"), col("cnt"))
      val batch1 = graft.operators.Sketches.cmsCounters(
        w1.toDF("ts", "term"), col("term"), lit(1L), width = 256)
      def cset(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(cset(slice1) == cset(batch1))
      // estimates from the streamed slice are exact for window-1 terms
      // (width 256 >> 8 distinct terms; verify no undercount ever)
      val est = graft.operators.Sketches.cmsEstimate(slice1,
          w1.toDF("ts", "term"), col("term"), width = 256)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = w1.groupBy(_._2).map { case (k, o) => k -> o.size.toLong }
      exact.foreach { case (k, c) => assert(est(k) >= c) }
    } finally q.stop()
  }

  test("sketch ingest refuses a flat-layout store instead of corrupting it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sketch_flat").toString
    val flat = Seq(("s", "x")).toDF("g", "v")
    graft.operators.Sketches.buildHllStore(flat, col("g"), col("v"), s"$tmp/hll")
    val input = MemoryStream[(String, String)]
    val err = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestSketchStores(
        input.toDF().toDF("src", "text"), "src", "text",
        s"$tmp/hll", s"$tmp/cms", s"$tmp/ckpt")
    }
    assert(err.getMessage.contains("FLAT sketch store"))
  }

  test("streaming sketch telemetry folds micro-batches into HLL + CMS stores") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("sketch_ingest").toString
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("src", "text")
    val q = graft.streaming.EventStreams.ingestSketchStores(
      docs, "src", "text", s"$tmp/hll", s"$tmp/cms", s"$tmp/ckpt")
    val b1 = (0 until 30).map(i => ("s" + i % 2, s"stream doc $i words words"))
    val b2 = (20 until 60).map(i => ("s" + i % 2, s"stream doc $i words words"))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // the batch_id-partitioned stores FOLD to one batch pass over the
    // union of the batches (read = the sketch's own merge)
    val union = (b1 ++ b2).toDF("src", "text")
    val storedH = graft.operators.Sketches.readHllStore(spark, s"$tmp/hll")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val directH = graft.operators.Sketches
      .hllRegisters(union, col("src"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(storedH == directH)
    // CMS folds by SUM — and the layout is replay-safe: re-writing batch
    // 0's partition (what a foreachBatch retry does) must not change the
    // fold, unlike a read-merge-rewrite which would double-count
    graft.operators.Sketches.cmsCounters(
        b1.toDF("src", "text").select(explode(split(col("text"), " ")).as("__tok")),
        col("__tok"), lit(1L))
      .repartition(1).write.mode("overwrite").parquet(s"$tmp/cms/batch_id=0")
    val storedC = graft.operators.Sketches.readCmsStore(spark, s"$tmp/cms")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val directC = graft.operators.Sketches.cmsCounters(
      union.select(explode(split(col("text"), " ")).as("t")), col("t"), lit(1L))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(storedC == directC)
  }

  test("streaming histogram telemetry folds micro-batches into the quantile store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("hist_ingest").toString
    val input = MemoryStream[(String, Long)]
    val events = input.toDF().toDF("grp", "v")
    val q = graft.streaming.EventStreams.ingestHistStore(
      events, "grp", col("v"), s"$tmp/hist", s"$tmp/ckpt")
    val b1 = (0 until 200).map(i => ("g" + i % 2, (i.toLong * 37) % 8000))
    val b2 = (0 until 150).map(i => ("g" + i % 2, (i.toLong * 91) % 11000))
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    val stored = graft.operators.Sketches.readHistStore(spark, s"$tmp/hist")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = graft.operators.Sketches
      .histCounts((b1 ++ b2).toDF("grp", "v"), col("grp"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == direct)
    // flat-store guard: a root _SUCCESS marker refuses the streaming layout
    graft.operators.Sketches.buildHistStore(
      b1.toDF("grp", "v"), col("grp"), col("v"), s"$tmp/flat")
    val err = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestHistStore(
        events, "grp", col("v"), s"$tmp/flat", s"$tmp/ckpt2")
    }
    assert(err.getMessage.contains("FLAT"))
  }

  test("streaming Bloom ingest folds micro-batches; the streaming gate matches the batch gate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("bloom_ingest").toString
    val mBits = 1L << 14
    val k = 4
    val input = MemoryStream[String]
    val docs = input.toDF().toDF("key")
    val q = graft.streaming.EventStreams.ingestBloomStore(
      docs, "key", s"$tmp/bloom", s"$tmp/ckpt", mBits, k)
    val b1 = (0 until 120).map(i => s"ref_a_$i")
    val b2 = (0 until 80).map(i => s"ref_b_$i")
    try {
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
    } finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("word", "bits").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val stored = rows(graft.operators.Sketches.readBloomStore(spark, s"$tmp/bloom"))
    val direct = rows(graft.operators.Sketches.bloomWords(
      (b1 ++ b2).toDF("key"), col("key"), mBits, k))
    assert(stored == direct)
    // the streaming decontamination gate keeps exactly what the batch gate keeps
    val probes = (b1.take(30) ++ (0 until 30).map(i => s"clean_$i"))
    val gateIn = MemoryStream[String]
    val out = graft.streaming.EventStreams.decontaminateBloom(
      gateIn.toDF().toDF("key"), "key", s"$tmp/bloom", mBits, k)
    val gq = out.writeStream.format("memory").queryName("bloom_gate_out").start()
    try { gateIn.addData(probes); gq.processAllAvailable() } finally gq.stop()
    val streamed = spark.table("bloom_gate_out").collect().map(_.getString(0)).toSet
    val batchKept = graft.operators.Sketches.bloomGate(
        probes.toDF("key"), col("key"),
        graft.operators.Sketches.readBloomStore(spark, s"$tmp/bloom"), mBits, k)
      .collect().map(_.getString(0)).toSet
    assert(streamed == batchKept && batchKept.forall(_.startsWith("clean_")))
    // flat-store guard: a root _SUCCESS marker refuses the streaming layout
    graft.operators.Sketches.buildBloomStore(
      b1.toDF("key"), col("key"), s"$tmp/flat", mBits, k)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.ingestBloomStore(
        docs, "key", s"$tmp/flat", s"$tmp/ckpt2", mBits, k)
    }
    assert(err.getMessage.contains("FLAT"))
  }

  test("streaming linear-classifier gate reproduces the batch scorer from the frozen store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("clfstream").toString + "/m"
    val model = graft.operators.Classifier.trainFromSeed(docs, col("text"))
    graft.operators.Classifier.saveModel(model, dir)
    val tau = graft.operators.Classifier.meanPolarityE6(model)
    val want = graft.operators.Classifier
      .scoreWith(docs, col("text"), model, tauE6 = tau)
      .select(col("doc_id"), col("margin_e6"), col("pred")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("doc_id", "text")
    val scored = graft.streaming.EventStreams
      .classifyLinear(stream, "text", dir, tauE6 = tau)
    val q = scored.writeStream.format("memory").queryName("clf_out")
      .outputMode("append").start()
    try {
      input.addData(docs.select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).toIndexedSeq)
      q.processAllAvailable()
      val got = spark.table("clf_out")
        .select(col("doc_id"), col("margin_e6"), col("pred")).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got == want)
      // self-calibrated cut is non-degenerate: both classes appear
      assert(got.values.exists(_._2) && got.values.exists(!_._2))
    } finally q.stop()
  }

  test("windowed streaming quantile histogram equals the batch histogram per window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Long)]
    val events = input.toDF().toDF("ts", "grp", "v")
    val q = graft.streaming.EventStreams
      .windowedQuantileHist(events, "ts", "grp", col("v"), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("hist_win")
      .outputMode("complete").start()
    val t1 = Timestamp.valueOf("2024-01-01 00:03:00")
    val t2 = Timestamp.valueOf("2024-01-01 00:14:00")
    val w1 = (0 until 200).map(i => (t1, "g" + i % 2, (i * 37L) % 5000))
    val w2 = (0 until 150).map(i => (t2, "g" + i % 2, (i * 91L) % 9000))
    try {
      input.addData(w1 ++ w2)
      q.processAllAvailable()
      val winStart = udf { w: org.apache.spark.sql.Row =>
        w.getTimestamp(0).toString }
      val got = spark.table("hist_win")
        .select(winStart(col("win")).as("ws"), col("group"), col("bucket"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
      def batchHist(rows: Seq[(Timestamp, String, Long)], ws: String) =
        graft.operators.Sketches.histCounts(
            rows.map(x => (x._2, x._3)).toDF("g", "v"), col("g"), col("v"))
          .collect().map(r => (ws, r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == batchHist(w1, "2024-01-01 00:00:00.0") ++
                    batchHist(w2, "2024-01-01 00:10:00.0"))
      // a closed window's slice answers percentiles exactly like batch
      val w1Counts = spark.table("hist_win")
        .filter(winStart(col("win")) === "2024-01-01 00:00:00.0")
        .select(col("group"), col("bucket"), col("cnt"))
      val qs = graft.operators.Sketches.histQuantiles(w1Counts, Seq(50, 99))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
      val qsBatch = graft.operators.Sketches.histQuantiles(
          graft.operators.Sketches.histCounts(
            w1.map(x => (x._2, x._3)).toDF("g", "v"), col("g"), col("v")),
          Seq(50, 99))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
      assert(qs == qsBatch && qs.nonEmpty)
    } finally q.stop()
  }

  test("sessionize accumulates per-user state (batch semantics check)") {
    import spark.implicits._
    // state logic is exercised in batch mode via groupByKey+flatMapGroups
    // equivalence: counts per user of the same input
    val data = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDS()
    val byUser = data.groupByKey(_._1).mapGroups { (k, it) =>
      val ts = it.map(_._2).toSeq; (k, ts.size.toLong, ts.min, ts.max)
    }.collect().toSet
    assert(byUser == Set((1L, 2L, 100L, 200L), (2L, 1L, 50L, 50L)))
  }

  test("streaming keyed as-of enrich equals the batch asOfKeyed over the same rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("asof_enrich").toString
    // frozen right: per-key snapshots (key, snap time, payload)
    val right = Seq(
      (0L, 100L, 1000L), (0L, 300L, 1001L),
      (1L, 150L, 2000L), (2L, 500L, 3000L)
    ).toDF("kb", "tb", "id_b")
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("id_a", "ka", "ta")
    val q = EventStreams.enrichAsOfKeyed(events, right, "id_a",
      "ka", "kb", "ta", "tb", maxLookback = 250L, tieBreakColName = "id_b",
      outPath = s"$tmp/out", checkpoint = s"$tmp/ckpt")
    try {
      input.addData((10L, 0L, 350L), (11L, 1L, 140L), (12L, 2L, 600L))
      q.processAllAvailable()
      // second batch: same key later (new carry), out-of-lookback event
      input.addData((13L, 0L, 120L), (14L, 1L, 900L))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // 10 -> key0 latest<=350 is t=300 (1001); 11 -> key1 none at/before
      // 140? t=150 > 140 -> dropped; 12 -> key2 t=500 within 250 (3000);
      // 13 -> key0 t=100 (1000); 14 -> key1 t=150 but 900-250=650 >= 150
      // -> out of lookback, dropped
      assert(got == Set((10L, 1001L), (12L, 3000L), (13L, 1000L)))
      // equals the batch kernel over the union of the streamed rows
      val batchAll = Seq((10L, 0L, 350L), (11L, 1L, 140L), (12L, 2L, 600L),
        (13L, 0L, 120L), (14L, 1L, 900L)).toDF("id_a", "ka", "ta")
      val batch = graft.operators.TemporalJoin.asOfKeyed(batchAll, right,
          "id_a", col("ka"), col("kb"), col("ta"), col("tb"), 250L, col("id_b"))
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == batch)
    } finally q.stop()
  }

  test("streaming OUTER keyed as-of enrich lands every event, null-enriched when unmatched") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("asof_enrich_o").toString
    val right = Seq((0L, 100L, 1000L), (1L, 150L, 2000L)).toDF("kb", "tb", "id_b")
    val input = MemoryStream[(Long, Long, Long)]
    val events = input.toDF().toDF("id_a", "ka", "ta")
    val q = EventStreams.enrichAsOfKeyed(events, right, "id_a",
      "ka", "kb", "ta", "tb", maxLookback = 250L, tieBreakColName = "id_b",
      outPath = s"$tmp/out", checkpoint = s"$tmp/ckpt", outer = true)
    try {
      // matched / before-any-right / unknown-key / out-of-lookback
      // (10: key0 latest<=300 is t=100, and 100 > 300-250 — in window)
      input.addData((10L, 0L, 300L), (11L, 1L, 140L), (12L, 9L, 600L),
        (13L, 1L, 900L))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$tmp/out")
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(got == Set((10L, Some(1000L)), (11L, None), (12L, None), (13L, None)),
        s"got $got")
    } finally q.stop()
  }

  test("stream-STREAM as-of enrich equals batch asOfKeyed across micro-batches (in-order feeds)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L // 2024-01-01T00:00:00Z in epoch ms
    def ts(ms: Long) = new Timestamp(base + ms)
    val rnd = new scala.util.Random(1414)
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp, Double)]
    val leftDf = lIn.toDF().toDF("click_id", "user", "cts")
    val rightDf = rIn.toDF().toDF("quote_id", "quser", "qts", "qval")
    val lookbackMs = 800L
    val out = EventStreams.asOfStreamStream(leftDf, rightDf,
      "user", "quser", "cts", "qts", lookbackMs, "quote_id", "0 seconds")
    val q = out.writeStream.format("memory").queryName("ss_asof")
      .outputMode("append").start()
    var nextId = 0L
    def lefts(lo: Long, hi: Long, n: Int) = (0 until n).map { _ =>
      nextId += 1
      (nextId, rnd.nextInt(4).toLong, ts(lo + rnd.nextInt((hi - lo).toInt)))
    }
    def rights(lo: Long, hi: Long, n: Int) = (0 until n).map { _ =>
      nextId += 1
      (nextId, rnd.nextInt(4).toLong, ts(lo + rnd.nextInt((hi - lo).toInt)),
        rnd.nextDouble())
    }
    // batch 2 strictly after batch 1's max event time: with a 0-second
    // delay the inter-batch watermark admits every batch-2 row, so the
    // stream must equal the batch kernel over the union exactly —
    // including enrichments carried ACROSS the batch boundary from
    // batch-1 rights
    val l1 = lefts(0, 2900, 60); val r1 = rights(0, 2900, 60)
    val l2 = lefts(3000, 5900, 60); val r2 = rights(3000, 5900, 60)
    try {
      // rights BEFORE lefts: the default trigger runs continuously, so a
      // micro-batch may fire between the two addData calls — rights
      // arriving early never changes as-of results (they wait in the
      // buffer), but lefts evaluated before their rights exist would
      // (correctly, per the late-data contract) miss them
      rIn.addData(r1: _*); lIn.addData(l1: _*)
      q.processAllAvailable()
      rIn.addData(r2: _*); lIn.addData(l2: _*)
      q.processAllAvailable()
      val gotRows = spark.table("ss_asof")
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val got = gotRows.toSet
      assert(gotRows.length == got.size, "no duplicate emissions")
      val lb = (l1 ++ l2).toDF("click_id", "user", "cts")
        .withColumn("t", unix_micros(col("cts"))).drop("cts")
      val rb = (r1 ++ r2).toDF("quote_id", "quser", "qts", "qval")
        .withColumn("t2", unix_micros(col("qts"))).drop("qts")
      val want = graft.operators.TemporalJoin.asOfKeyed(lb, rb, "click_id",
          col("user"), col("quser"), col("t"), col("t2"),
          lookbackMs * 1000L, col("quote_id"))
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.nonEmpty && got == want,
        s"stream/batch divergence: onlyStream=${got -- want} onlyBatch=${want -- got}")
      // cross-batch carry really exercised: some batch-2 left matched a
      // batch-1 right
      val r1Ids = r1.map(_._1).toSet
      val l2Ids = l2.map(_._1).toSet
      assert(want.exists { case (l, r) => l2Ids(l) && r1Ids(r) },
        "fixture must exercise the cross-batch state carry")
    } finally q.stop()
  }

  test("stream-STREAM as-of: ties, strict lookback, late-left drop, no retro-enrich, outer totality") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def ts(ms: Long) = new Timestamp(base + ms)
    val lIn = MemoryStream[(Long, Option[Long], Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val leftDf = lIn.toDF().toDF("click_id", "user", "cts")
    val rightDf = rIn.toDF().toDF("quote_id", "quser", "qts")
    val out = EventStreams.asOfStreamStream(leftDf, rightDf,
      "user", "quser", "cts", "qts", maxLookbackMs = 800L,
      tieBreakColName = "quote_id", watermarkDelay = "0 seconds",
      outer = true)
    val q = out.writeStream.format("memory").queryName("ss_asof_edge")
      .outputMode("append").start()
    def table() = spark.table("ss_asof_edge")
      .select(col("click_id"), col("quote_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    try {
      // rights: two exact-time ties on key 0 (largest tieBreak must win),
      // one late-horizon right on key 3
      rIn.addData((101L, 0L, ts(1000)), (102L, 0L, ts(1000)), (103L, 3L, ts(5200)))
      // lefts: tie-instant (non-strict upper bound), in-lookback,
      // out-of-lookback, no-right key, NULL key (bypass), stale-carry,
      // fresh match on key 3
      lIn.addData((1L, Some(0L), ts(1000)), (2L, Some(0L), ts(1700)),
        (3L, Some(0L), ts(1900)), (4L, Some(1L), ts(500)),
        (5L, None, ts(700)), (6L, Some(0L), ts(5000)), (7L, Some(3L), ts(5300)))
      q.processAllAvailable()
      val afterB1 = table().toSet
      assert(afterB1 == Set(
        (1L, Some(102L)), // right at exactly lT enriches; tb 102 beats 101
        (2L, Some(102L)), // 1000 > 1700-800
        (3L, None),       // 1000 <= 1900-800 — strict lookback fail
        (4L, None), (5L, None), (6L, None),
        (7L, Some(103L))), s"got $afterB1")
      // watermark is now min(5300, 5200) - 0 = 5200ms. Batch 2: a left
      // older than the watermark drops even in outer mode; an in-horizon
      // left still enriches from batch-1 state; click 6's already-landed
      // null row must not change or duplicate (no retro-enrich)
      lIn.addData((8L, Some(0L), ts(1000)), (9L, Some(3L), ts(5900)))
      q.processAllAvailable()
      val afterB2 = table()
      assert(afterB2.length == 8, s"got ${afterB2.mkString(",")}")
      assert(afterB2.toSet == afterB1 + ((9L, Some(103L))))
      assert(afterB2.count(_._1 == 6L) == 1)
    } finally q.stop()
    // guard pins: shared output names and non-timestamp event time fail
    // at construction with actionable messages
    val e1 = intercept[IllegalArgumentException] {
      EventStreams.asOfStreamStream(
        Seq((1L, ts(0))).toDF("id", "cts"), Seq((2L, ts(0))).toDF("id", "qts"),
        "id", "id", "cts", "qts", 100L, "id", "0 seconds")
    }
    assert(e1.getMessage.contains("share column name"))
    val e2 = intercept[IllegalArgumentException] {
      EventStreams.asOfStreamStream(
        Seq((1L, 5L)).toDF("a", "ta"), Seq((2L, ts(0))).toDF("b", "qts"),
        "a", "b", "ta", "qts", 100L, "b", "0 seconds")
    }
    assert(e2.getMessage.contains("TimestampType"))
    val e3 = intercept[IllegalArgumentException] {
      EventStreams.asOfStreamStream(
        Seq((1L, ts(0))).toDF("a", "ta"), Seq((2L, ts(0))).toDF("b", "qts"),
        "a", "b", "ta", "qts", 100L, "b", "0 seconds", emitMode = "lazy")
    }
    assert(e3.getMessage.contains("emitMode"))
  }

  /** Drive the post-sentinel timeout flush: poll until the sink row count
    * is stable (the no-data batch that fires event-time timeouts runs
    * after processAllAvailable returns). */
  private def awaitStable(q: org.apache.spark.sql.streaming.StreamingQuery,
                          sink: String): Unit = {
    var stable = 0; var last = -1L; var polls = 0
    while (stable < 3 && polls < 100) {
      q.processAllAvailable()
      val n = spark.table(sink).count()
      if (n == last) stable += 1 else { stable = 0; last = n }
      polls += 1
      if (stable < 3) Thread.sleep(100)
    }
  }

  test("final emit mode equals batch asOfKeyed under ADVERSARIAL arrival (all lefts a batch before any right)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def ts(ms: Long) = new Timestamp(base + ms)
    val rnd = new scala.util.Random(4714)
    var nextId = 0L
    val lefts = (0 until 150).map { _ =>
      nextId += 1; (nextId, rnd.nextInt(5).toLong, ts(rnd.nextInt(4000).toLong))
    }
    val rights = (0 until 150).map { _ =>
      nextId += 1
      (nextId, rnd.nextInt(5).toLong, ts(rnd.nextInt(4000).toLong), rnd.nextDouble())
    }
    val lookbackMs = 700L
    val delayMs = 10000L // covers the whole fixture: nothing is ever late
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp, Double)]
    val out = EventStreams.asOfStreamStream(
      lIn.toDF().toDF("click_id", "user", "cts"),
      rIn.toDF().toDF("quote_id", "quser", "qts", "qval"),
      "user", "quser", "cts", "qts", lookbackMs, "quote_id",
      s"$delayMs milliseconds", emitMode = "final")
    val q = out.writeStream.format("memory").queryName("ss_asof_final")
      .outputMode("append").start()
    try {
      // batch 1: ONLY lefts; batch 2: ONLY rights — eager mode would
      // emit every left unenriched; final mode must match batch exactly
      lIn.addData(lefts: _*)
      q.processAllAvailable()
      rIn.addData(rights: _*)
      q.processAllAvailable()
      // sentinels on an unused key push the watermark past every left
      val sEnd = ts(4000 + lookbackMs + delayMs + 1000)
      lIn.addData((-1L, -1L, sEnd)); rIn.addData((-2L, -1L, sEnd, 0.0))
      awaitStable(q, "ss_asof_final")
      val gotRows = spark.table("ss_asof_final")
        .filter(col("click_id") > 0)
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(gotRows.length == gotRows.toSet.size, "exactly-once emission")
      val lb = lefts.toDF("click_id", "user", "cts")
        .withColumn("t", unix_micros(col("cts"))).drop("cts")
      val rb = rights.toDF("quote_id", "quser", "qts", "qval")
        .withColumn("t2", unix_micros(col("qts"))).drop("qts")
      val want = graft.operators.TemporalJoin.asOfKeyed(lb, rb, "click_id",
          col("user"), col("quser"), col("t"), col("t2"),
          lookbackMs * 1000L, col("quote_id"))
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(want.size > 50, "fixture must produce substantial matches")
      assert(gotRows.toSet == want,
        s"final-mode divergence: onlyStream=${gotRows.toSet -- want} onlyBatch=${want -- gotRows.toSet}")
    } finally q.stop()
    // the discriminating witness: EAGER mode on the same lefts-first feed
    // answers every left against an empty right buffer — zero matches
    // (inner) — proving the final mode is what buys batch parity here
    val lIn2 = MemoryStream[(Long, Long, Timestamp)]
    val rIn2 = MemoryStream[(Long, Long, Timestamp, Double)]
    val outE = EventStreams.asOfStreamStream(
      lIn2.toDF().toDF("click_id", "user", "cts"),
      rIn2.toDF().toDF("quote_id", "quser", "qts", "qval"),
      "user", "quser", "cts", "qts", lookbackMs, "quote_id",
      s"$delayMs milliseconds", emitMode = "eager")
    val qE = outE.writeStream.format("memory").queryName("ss_asof_eager_w")
      .outputMode("append").start()
    try {
      lIn2.addData(lefts: _*)
      qE.processAllAvailable()
      rIn2.addData(rights: _*)
      qE.processAllAvailable()
      assert(spark.table("ss_asof_eager_w").isEmpty,
        "eager mode must miss every match on the lefts-first feed")
    } finally qE.stop()
  }

  test("final emit mode: randomized 3-batch shuffled feed (outer) equals batch asOfKeyed — arrival order free") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def ts(ms: Long) = new Timestamp(base + ms)
    val rnd = new scala.util.Random(8147)
    var nextId = 0L
    val lefts = (0 until 120).map { _ =>
      nextId += 1; (nextId, rnd.nextInt(5).toLong, ts(rnd.nextInt(3000).toLong))
    }
    val rights = (0 until 120).map { _ =>
      nextId += 1; (nextId, rnd.nextInt(5).toLong, ts(rnd.nextInt(3000).toLong))
    }
    val lookbackMs = 600L
    val delayMs = 8000L // covers the span: NO row is ever late, so the
                        // watermark admits everything and final mode owes
                        // exact batch parity whatever the batch placement
    // random batch assignment, independent of event time — rows of any
    // instant can land in any micro-batch, in any order, on both sides
    val lParts = lefts.groupBy(_ => rnd.nextInt(3))
    val rParts = rights.groupBy(_ => rnd.nextInt(3))
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val out = EventStreams.asOfStreamStream(
      lIn.toDF().toDF("click_id", "user", "cts"),
      rIn.toDF().toDF("quote_id", "quser", "qts"),
      "user", "quser", "cts", "qts", lookbackMs, "quote_id",
      s"$delayMs milliseconds", outer = true, emitMode = "final")
    val q = out.writeStream.format("memory").queryName("ss_asof_final_rnd")
      .outputMode("append").start()
    try {
      (0 until 3).foreach { b =>
        lIn.addData(lParts.getOrElse(b, Seq.empty): _*)
        rIn.addData(rParts.getOrElse(b, Seq.empty): _*)
        q.processAllAvailable()
      }
      val sEnd = ts(3000 + lookbackMs + delayMs + 1000)
      lIn.addData((-1L, -1L, sEnd)); rIn.addData((-2L, -1L, sEnd))
      awaitStable(q, "ss_asof_final_rnd")
      val got = spark.table("ss_asof_final_rnd").filter(col("click_id") > 0)
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      assert(got.length == got.toSet.size, "exactly-once emission")
      assert(got.length == lefts.length,
        s"outer totality: every left emits once, got ${got.length}/${lefts.length}")
      val lb = lefts.toDF("click_id", "user", "cts")
        .withColumn("t", unix_micros(col("cts"))).drop("cts")
      val rb = rights.toDF("quote_id", "quser", "qts")
        .withColumn("t2", unix_micros(col("qts"))).drop("qts")
      val want = graft.operators.TemporalJoin.asOfKeyed(lb, rb, "click_id",
          col("user"), col("quser"), col("t"), col("t2"),
          lookbackMs * 1000L, col("quote_id"), outer = true)
        .select(col("click_id"), col("quote_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toSet
      assert(want.exists(_._2.nonEmpty) && want.exists(_._2.isEmpty),
        "fixture must exercise both matched and unmatched lefts")
      assert(got.toSet == want,
        s"shuffled-feed divergence: onlyStream=${got.toSet -- want} onlyBatch=${want -- got.toSet}")
    } finally q.stop()
  }

  test("final emit mode: delayed right enriches a pending left; outer totality; late-left drop; once-only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = 1704067200000L
    def ts(ms: Long) = new Timestamp(base + ms)
    val lIn = MemoryStream[(Long, Long, Timestamp)]
    val rIn = MemoryStream[(Long, Long, Timestamp)]
    val out = EventStreams.asOfStreamStream(
      lIn.toDF().toDF("click_id", "user", "cts"),
      rIn.toDF().toDF("quote_id", "quser", "qts"),
      "user", "quser", "cts", "qts", maxLookbackMs = 800L,
      tieBreakColName = "quote_id", watermarkDelay = "2000 milliseconds",
      outer = true, emitMode = "final")
    val q = out.writeStream.format("memory").queryName("ss_asof_final_edge")
      .outputMode("append").start()
    def rows() = spark.table("ss_asof_final_edge")
      .select(col("click_id"), col("quote_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    try {
      // batch 1: lefts only — held (watermark has not passed them)
      lIn.addData((1L, 0L, ts(1000)), (2L, 0L, ts(1900)))
      q.processAllAvailable()
      assert(rows().isEmpty, "final mode must not emit before the watermark")
      // batch 2: the DELAYED right at t=900 arrives a batch after left 1
      // (in-lookback for left 1; out-of-lookback for left 2 at 1900)
      rIn.addData((101L, 0L, ts(900)))
      q.processAllAvailable()
      // batch 3: sentinels advance the watermark past both lefts
      val sEnd = ts(20000)
      lIn.addData((-1L, -1L, sEnd)); rIn.addData((-2L, -1L, sEnd))
      awaitStable(q, "ss_asof_final_edge")
      val afterFlush = rows().filter(_._1 > 0).toSet
      assert(afterFlush == Set((1L, Some(101L)), (2L, None)),
        s"got $afterFlush") // delayed right enriches 1; outer nulls 2
      // batch 4: a left behind the watermark drops even in final+outer;
      // nothing already emitted may duplicate
      lIn.addData((3L, 0L, ts(1500)))
      q.processAllAvailable()
      awaitStable(q, "ss_asof_final_edge")
      val end = rows().filter(_._1 > 0)
      assert(end.length == 2 && end.toSet == afterFlush,
        s"late left must drop, no duplicates: ${end.mkString(",")}")
    } finally q.stop()
  }
}
