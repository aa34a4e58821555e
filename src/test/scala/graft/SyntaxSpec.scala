package graft

import graft.functions.stf
import graft.operators.JoinPredicate
import graft.syntax._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fluent API produces the same results as the operator objects. */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fluent chain: filter -> knn matches direct operators") {
    val c = Tables.customerPts(spark, dir)
    val poly = stf.st_geomfromwkt("POLYGON ((100 100, 600 100, 600 700, 100 700, 100 100))")
    val fluent = c.stContainedBy(col("c_geo"), poly)
      .stKnn(col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), k = 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val direct = graft.operators.KNN.knn(
        graft.operators.SpatialOps.containedBy(c, col("c_geo"), poly),
        col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(fluent == direct && fluent.size == 5)
  }

  test("round-3 fluent surface: indexed join, raster filter, temporal overlap") {
    val n = Tables.nationRects(spark, dir)
    val c = Tables.customerPts(spark, dir)
    val viaIdx = n.stJoinIndexed(c, "n_geo", "c_geo", JoinPredicate.Contains, 100.0)
      .select("n_nationkey", "c_custkey").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    val direct = n.stJoin(c, col("n_geo"), col("c_geo"), JoinPredicate.Contains, 100.0)
      .select("n_nationkey", "c_custkey").collect()
      .map(r => (r.get(0), r.get(1))).toSet
    assert(viaIdx == direct && direct.nonEmpty)

    val tiles = Tables.eventPts(spark, dir).stRasterize(col("ex"), col("ey"), 10.0, 10, 10)
    assert(tiles.stRasterFilter(
      stf.st_geomfromwkt("POLYGON ((0 0, 375 0, 0 375, 0 0))"), default = -1L).count() > 0)
    assert(tiles.stBucketHistogram(4).count() == 4)

    val e = Tables.load(spark, dir, "events")
      .select(col("event_id"), expr("ts div 1000").as("et")).limit(100)
    val iv = e.select(col("event_id").as("id_a"), col("et").as("sa"),
      (col("et") + 60000000L).as("ea"))
    val iv2 = iv.select(col("id_a").as("id_b"), col("sa").as("sb"), col("ea").as("eb"))
    assert(iv.stTemporalOverlapJoin(iv2, col("sa"), col("ea"), col("sb"), col("eb"),
      bucket = 120000000L).count() >= 100) // at least the self-pairs
    // keyed as-of sugar delegates: every left matches its own-key twin
    val ka = e.select(col("event_id").as("id_a"), (col("event_id") % 5).as("ka"),
      col("et").as("ta"))
    val kb = ka.select(col("id_a").as("id_b"), col("ka").as("kb"),
      col("ta").as("tb"))
    assert(ka.stAsOfJoinKeyed(kb, "id_a", col("ka"), col("kb"), col("ta"),
      col("tb"), maxLookback = 1L << 60, tieBreak = col("id_b")).count() == 100)
  }

  test("fluent join and cluster run end-to-end") {
    val n = Tables.nationRects(spark, dir)
    val c = Tables.customerPts(spark, dir)
    val joined = n.stJoin(c, col("n_geo"), col("c_geo"), JoinPredicate.Contains, 100.0)
    assert(joined.count() > 0)
    val clustered = c.stCluster(col("c_custkey"), col("cx"), col("cy"), 32.0, 5)
    assert(clustered.count() == c.count())
  }

  test("README end-to-end corpus pipeline runs deterministically through the fluent API") {
    import graft.operators.{Pipeline, TextAnalysis}
    val docs0 = spark.read.parquet(s"$dir/documents.parquet")
    // benchmark docs need >= minOverlap distinct 3-grams to be detectable;
    // a benchmark is its own table, so give it its own id space (the
    // operator deliberately ignores same-id pairs for bench-within-corpus
    // use) — negated ids keep the provenance readable
    val benchSrc = docs0.filter(size(split(col("text"), " ")) > 30).limit(5)
    // -(id+1), not -id: plain negation maps doc 0 onto itself, and the
    // operator's same-id filter would then silently drop doc 0's pair
    val bench = benchSrc.select((-(col("doc_id") + 1)).as("bench_id"), col("text"))
    def run() = {
      val deduped = docs0.dropNearDuplicates(col("doc_id"), col("text"))
        .join(Pipeline.contaminationPairs(docs0, col("doc_id"), col("text"),
            bench, col("bench_id"), col("text"))
          .select(col("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val sized = TextAnalysis.withTokenStats(deduped, col("text"))
      sized
        .tokenBudgetPerGroup(col("source"), col("doc_id"), col("n_tokens"), budget = 2000L)
        .sampleByRate(col("source"), col("doc_id"), salt = "mix-v1",
          rates = Map("src3" -> 0.0), default = 1.0)
        .assignSplit(col("doc_id"), salt = "v1",
          fractions = Seq("train" -> 0.98, "val" -> 0.01, "test" -> 0.01))
        .chunkTokens(col("text"), size = 64, stride = 64)
        // chunk ids are (doc_id, copy, chunk_id); shuffle on the composite
        .epochShuffle(concat_ws(":", col("doc_id"), col("copy"), col("chunk_id")), "epoch0")
        .packSequences(col("source"), col("shuffle_rank"), col("chunk_tokens"),
          budget = 256L)
    }
    def snap(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("chunk_id"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val a = snap(run())
    assert(a.nonEmpty)
    // the whole chain is deterministic: a rerun builds the identical corpus
    assert(snap(run()) == a)
    // decontamination removed the corpus twins of the benchmark docs
    val benchIds = benchSrc.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(a.forall { case (id, _, _, _) => !benchIds.contains(id) })
    // packing respects the context-window budget
    assert(a.forall { case (_, _, _, off) => off >= 0 && off < 256 })
  }

  test("round-5 fluent surface: quantile gate, dup spans, span store, dup rate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val q = graft.operators.TextAnalysis.withQuality(docs, col("text"))
    val gated = q.quantileGate(col("source"), 1, 4, col("quality_e6").desc, col("doc_id"))
    assert(gated.count() ==
      graft.operators.Pipeline.quantileGate(q, col("source"), 1, 4,
        col("quality_e6").desc, col("doc_id")).count())
    val spans = docs.withDuplicatedSpans(col("doc_id"), col("text"), k = 5)
    assert(spans.count() == docs.count())
    val rates = docs.dupRateByGroup(col("source"), md5(col("text").cast("binary")))
    assert(rates.count() == 20)
    val path = java.nio.file.Files.createTempDirectory("graft_syntax_spans").toString
    graft.operators.Dedup.buildSpanStore(docs.limit(100), col("text"), 5, path)
    assert(docs.dropSeenSpans(col("doc_id"), col("text"), 5, path).count() <= docs.count())
  }

  test("round-7 fluent surface: semantic dedup, prototype prune, family split, cosine gate") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val sem = e.semanticDedup(col("vec_id"), col("embedding"), k = 2, iters = 1, threshold = 0.42)
    assert(sem.count() ==
      graft.operators.Dedup.semanticDedup(e, col("vec_id"), col("embedding"), 2, 1, 0.42).count())
    val pruned = e.prototypePrune(col("vec_id"), col("embedding"), k = 2, iters = 1,
      keepNum = 1, keepDen = 2)
    assert(pruned.count() > 0 && pruned.count() < e.count())
    val split = docs.assignSplitByFamily(col("doc_id"), col("text"), "v1",
      Seq("train" -> 0.9, "val" -> 0.1))
    assert(split.count() == docs.count() && split.columns.contains("split"))
    val path = java.nio.file.Files.createTempDirectory("graft_syntax_cl").toString
    e.filter(col("vec_id") % 2 === 0)
      .buildCosineLshStore(col("vec_id"), col("embedding"), path, tables = 16, planes = 4)
    val gated = e.filter(col("vec_id") % 2 === 1)
      .dropSeenCosine(col("vec_id"), col("embedding"), path, threshold = 0.42)
    assert(gated.count() < e.filter(col("vec_id") % 2 === 1).count())
  }

  test("late round-7 fluent surface: sketches, sessions, funnel, diff chain") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("et", expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"))
    val regs = docs.hllRegisters(col("source"), col("text"))
    assert(regs.count() > 0 && regs.columns.toSeq == Seq("group", "bucket", "rho"))
    val sessions = ev.sessionize(col("user_id"), col("et"), col("event_id"),
      gap = 3600000000L)
    assert(sessions.columns.contains("session_seq"))
    val fun = ev.funnel(col("user_id"), col("et"), col("event_id"),
      col("event_type"), Seq("signup", "click"))
    assert(fun.count() > 0)
    val diff = docs.filter(col("doc_id") % 2 === 0)
      .snapshotDiffTo(col("doc_id"), col("text"),
        docs.filter(col("doc_id") % 3 === 0), col("doc_id"), col("text"))
    assert(diff.select(col("status")).distinct().count() >= 2)
  }

  test("cluster-balanced sampling: kmeans clusters feed sampleByRate") {
    // the curation composition the two operators exist for: cluster the
    // corpus semantically, then up/down-sample per cluster — deterministic
    // end to end (seeded kmeans, salted hash sampling)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val clustered = e.kmeans(col("vec_id"), col("embedding"), k = 2, iters = 2)
      .withColumn("cluster_key", col("cluster").cast("string"))
    val sampled = clustered.sampleByRate(col("cluster_key"), col("id"), "s1",
      Map("0" -> 0.5, "1" -> 1.0), 0.0)
    val again = clustered.sampleByRate(col("cluster_key"), col("id"), "s1",
      Map("0" -> 0.5, "1" -> 1.0), 0.0)
    assert(sampled.count() == again.count() && sampled.count() > 0)
    assert(sampled.count() < e.count()) // cluster 0 thinned, none dropped entirely
    // every surviving row kept its cluster assignment: anti-join against the
    // original (id, cluster) pairs must be empty (a distinct-count would not
    // catch a scrambled or recomputed cluster column)
    assert(sampled.select(col("id"), col("cluster"))
      .join(clustered.select(col("id"), col("cluster")), Seq("id", "cluster"), "left_anti")
      .count() == 0)
    assert(sampled.select(col("cluster")).distinct().count() == 2)
  }

  test("round-8 fluent surface: classifier train/score/gate, quantile histogram") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.operators.Classifier
      .withSeedLabel(docs, col("text"))
      .trainClassifier(col("text"), col("label"))
    assert(model.columns.toSeq == Seq("feature", "n_pos", "n_neg", "weight_e6"))
    val tau = graft.operators.Classifier.meanPolarityE6(model)
    val scored = docs.classifierScore(col("text"), model, tauE6 = tau)
    assert(scored.columns.contains("margin_e6") && scored.columns.contains("pred"))
    val gated = docs.classifierGate(col("text"), model, tauE6 = tau)
    val nGated = gated.count()
    assert(nGated > 0 && nGated < docs.count())
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val hist = ev.histCounts(col("event_type"), round(col("value") * 1e6).cast("long"))
    val qs = hist.histQuantiles(Seq(50, 95))
    assert(qs.count() == hist.select(col("group")).distinct().count() * 2)
  }

  test("continuation fluent surface: blocklist, phrases, unigram, segment lifecycle") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val flagged = docs.flagPhrases(col("text"), Seq("spark", "batch batch"))
    assert(flagged.filter(col("flagged_n") > 0).count() > 0)
    val occ = docs.phraseOccurrences(col("doc_id"), col("text"), Seq("batch", "batch"))
    assert(occ.count() > 0)
    val vocab = graft.operators.Wordpiece.learnVocab(docs, col("text"), 40, 4)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val toks = docs.applyUnigram(col("text"), vocab)
    assert(toks.select(org.apache.spark.sql.functions.size(col("ug_tokens")))
      .head().getInt(0) > 0)
    // segment lifecycle end-to-end through the fluent surface
    val dir2 = java.nio.file.Files.createTempDirectory("synseg").toString
    docs.filter(col("doc_id") % 2 === 0)
      .appendTextBatch(col("doc_id"), col("text"), dir2, 0L)
    docs.filter(col("doc_id") % 2 === 1)
      .appendTextBatch(col("doc_id"), col("text"), dir2, 1L)
    docs.filter(col("doc_id") % 9 === 1).select(col("doc_id"))
      .deleteFromTextIndex(col("doc_id"), dir2, 0L)
    graft.operators.TextSearch.compactTextIndex(spark, dir2)
    val served = graft.operators.TextSearch
      .bm25TopKExactIndexed(spark, dir2, Seq("spark"), 10)
    assert(served.count() > 0)
    // batched retrieval + deletable membership + decayed counts + PCA
    import spark.implicits._
    val qb = Seq((0L, Seq("spark")), (1L, Seq("hash", "join")))
      .toDF("query_id", "terms")
    assert(qb.bm25BatchExactIndexed(col("query_id"), col("terms"), dir2, 5)
      .count() > 0)
    val cb = java.nio.file.Files.createTempDirectory("syncb").toString
    graft.operators.Sketches.initCountingBloomStore(spark, cb, 1L << 14, 4)
    docs.filter(col("doc_id") % 10 === 0)
      .appendCountingBloomBatch(col("text"), cb, 0L)
    docs.filter(col("doc_id") % 20 === 0)
      .deleteFromCountingBloom(col("text"), cb, 0L)
    assert(docs.countingBloomGate(col("text"), cb).count() > 0)
    // any long time axis works for the smoke (event_id stands in; the
    // NTZ-normalized path is q196's territory)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    assert(ev.decayedCounts(col("event_type"), col("event_id"),
      halfLifeNs = 1000L).count() > 0)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val mdl = graft.operators.Similarity.fitPca(e, col("vec_id"),
      col("embedding"), m = 4, iters = 50, sampleN = 500)
    assert(e.pcaProject(col("embedding"), mdl, whiten = true)
      .select(col("pca")).head().getSeq[Float](0).length == 4)
  }
}
