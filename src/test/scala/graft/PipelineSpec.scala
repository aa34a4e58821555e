package graft

import graft.operators.Pipeline
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-assembly primitives: determinism, differential equivalence with
  * the single-window formulation, and hand-counted contamination cases. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("mixtureSample: integer-exact copies hit the target mixture; unknown groups dropped") {
    import graft.operators.Pipeline
    // hand corpus: group a has 10 tokens, b has 5, c unknown.
    // weights a:1 b:3, Σw=4, budget=40 => r_a = 40·1/(4·10) = 1 exactly
    // (whole=1, rem=0 — no fractional copies), r_b = 40·3/(4·5) = 6 exactly.
    val df = spark.createDataFrame(Seq(
      (1L, "a", 4L), (2L, "a", 6L), (3L, "b", 5L), (4L, "c", 9L)
    )).toDF("id", "g", "tok")
    val got = Pipeline.mixtureSample(df, col("g"), col("id"), col("tok"),
        "mx", Map("a" -> 1L, "b" -> 3L), budget = 40L)
      .groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 6L)) // c dropped
    // fractional selection is the documented hash rule, replayed by hand:
    // budget=50 => r_a = 50/40: whole=1, rem=10, den=40 — extra iff hv·40 < 10·65536
    val hv = (id: Long) => {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:mx".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 4), 16)
    }
    val got50 = Pipeline.mixtureSample(df, col("g"), col("id"), col("tok"),
        "mx", Map("a" -> 1L, "b" -> 3L), budget = 50L)
      .filter(col("g") === "a").groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want50 = Seq(1L, 2L).map(id =>
      id -> (1L + (if (hv(id) * 40L < 10L * 65536L) 1L else 0L))).toMap
    assert(got50 == want50)
  }

  test("fluency store: indexed mode == live on the training corpus; unseen text smoothed") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("lmstore").toString
    TextAnalysis.buildLmStore(docs, dir, col("text"))
    val live = TextAnalysis.withBigramFluency(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = TextAnalysis.withBigramFluencyIndexed(docs, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == live)
    // a doc of entirely unseen tokens: every bigram scores 1e6/(0+V)
    val v = spark.read.parquet(s"$dir/unigrams").count()
    val unseen = spark.createDataFrame(Seq((1L, "zzq zzr zzs"))).toDF("id", "text")
    val got = TextAnalysis.withBigramFluencyIndexed(unseen, col("id"), col("text"), dir)
      .select(col("n_bigrams"), col("fluency_e6")).head()
    assert(got.getLong(0) == 2L)
    assert(got.getLong(1) == 1000000L / v)
  }

  test("segmented LM store: appends fold to the one-pass model exactly") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("lmseg").toString
    // skewed split: segment 0 carries ~90% of the corpus
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 10 =!= 0),
      col("text"), dir, batchId = 0L)
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 10 === 0),
      col("text"), dir, batchId = 1L)
    val live = TextAnalysis.withBigramFluency(docs, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = TextAnalysis.withBigramFluencyIndexed(docs, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == live)
    // replayed batch: overwriting its own partition is idempotent
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 10 === 0),
      col("text"), dir, batchId = 1L)
    val replayed = TextAnalysis.withBigramFluencyIndexed(docs, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed == live)
    // flat-store refusal
    val flat = java.nio.file.Files.createTempDirectory("lmflat").toString
    TextAnalysis.buildLmStore(docs, flat, col("text"))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.appendLmBatch(docs.limit(3), col("text"), flat, batchId = 0L)
    }
    assert(e.getMessage.contains("flat store"))
  }

  test("LM takedown: forget == a model built without the deleted docs (vocab shrinks)") {
    import graft.operators.TextAnalysis
    // doc 4 is the ONLY doc holding tokens zq/xv/qn — deleting it must
    // shrink the vocabulary, not just the counts
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat"),
      (4L, "zq xv qn"), (5L, "solo the"))
    val df = spark.createDataFrame(corpus).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lmdel").toString
    TextAnalysis.appendLmBatch(df.filter(col("doc_id") <= 3), col("text"), dir, 0L)
    TextAnalysis.appendLmBatch(df.filter(col("doc_id") > 3), col("text"), dir, 1L)
    TextAnalysis.deleteFromLmStore(df.filter(col("doc_id") === 4), col("text"), dir, 0L)
    val remaining = df.filter(col("doc_id") =!= 4)
    val want = TextAnalysis.withBigramFluency(remaining, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = TextAnalysis.withBigramFluencyIndexed(remaining, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // the zero-count tokens are gone from the folded vocabulary
    val uniRows = spark.read.parquet(s"$dir/unigrams")
      .groupBy(col("w")).agg(sum(col("u")).as("u")).filter(col("u") > 0)
      .collect().map(_.getString(0)).toSet
    assert(!uniRows.contains("zq") && uniRows.contains("the"))
    // flat stores refuse takedown; negative batch ids refused
    val flat = java.nio.file.Files.createTempDirectory("lmdelflat").toString
    TextAnalysis.buildLmStore(df, flat, col("text"))
    intercept[IllegalArgumentException] {
      TextAnalysis.deleteFromLmStore(df.limit(1), col("text"), flat, 0L)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.deleteFromLmStore(df.limit(1), col("text"), dir, -2L)
    }
  }

  test("segmented DSIR store: raw appends fold to the one-pass ratios; takedown exact") {
    import graft.operators.Pipeline
    val target = docs.filter(col("source") === "src0")
    val flat = java.nio.file.Files.createTempDirectory("dsflat").toString
    Pipeline.buildDsirStore(docs, col("text"), target, col("text"), 256, flat)
    val want = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), flat)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val seg = java.nio.file.Files.createTempDirectory("dsseg").toString
    Pipeline.initDsirStore(target, col("text"), 256, seg)
    Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 3 === 0), col("text"), seg, 0L)
    Pipeline.appendDsirRawBatch(docs.filter(col("doc_id") % 3 =!= 0), col("text"), seg, 1L)
    val got = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), seg)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // takedown: forgetting a raw slice == a store built without it
    Pipeline.deleteFromDsirRaw(docs.filter(col("doc_id") % 5 === 1), col("text"), seg, 0L)
    val remaining = docs.filter(col("doc_id") % 5 =!= 1)
    val flat2 = java.nio.file.Files.createTempDirectory("dsflat2").toString
    Pipeline.buildDsirStore(remaining, col("text"), target, col("text"), 256, flat2)
    val wantDel = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), flat2)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotDel = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), seg)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDel == wantDel)
    // compaction: scores unchanged, one raw segment, negatives gone
    Pipeline.compactDsirRaw(spark, seg)
    val gotCmp = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), seg)
      .select(col("doc_id"), col("dsir_score_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotCmp == wantDel)
    val rawSegs = Option(new java.io.File(s"$seg/raw").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("batch_id="))
    assert(rawSegs == 1)
    assert(spark.read.parquet(s"$seg/raw").filter(col("r") <= 0).count() == 0)
    // flat refusals
    intercept[IllegalArgumentException] {
      Pipeline.appendDsirRawBatch(docs.limit(2), col("text"), flat, 0L)
    }
    intercept[IllegalArgumentException] {
      Pipeline.deleteFromDsirRaw(docs.limit(2), col("text"), flat, 0L)
    }
    intercept[IllegalArgumentException] {
      Pipeline.compactDsirRaw(spark, flat)
    }
  }

  test("LM compaction folds counts + negatives into one segment, scoring unchanged") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("lmcmp").toString
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 0),
      col("text"), dir, batchId = 0L)
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 1),
      col("text"), dir, batchId = 1L)
    TextAnalysis.deleteFromLmStore(docs.filter(col("doc_id") % 5 === 2),
      col("text"), dir, batchId = 0L)
    val remaining = docs.filter(col("doc_id") % 5 =!= 2)
    val before = TextAnalysis.withBigramFluencyIndexed(remaining, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    TextAnalysis.compactLmStore(spark, dir)
    val after = TextAnalysis.withBigramFluencyIndexed(remaining, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before && after.nonEmpty)
    def segs(t: String) = Option(new java.io.File(s"$dir/$t").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("batch_id=")).length
    assert(segs("unigrams") == 1 && segs("bigrams") == 1)
    // no zero or negative counts survive compaction
    assert(spark.read.parquet(s"$dir/unigrams").filter(col("u") <= 0).count() == 0)
    val flat = java.nio.file.Files.createTempDirectory("lmcmpflat").toString
    TextAnalysis.buildLmStore(docs, flat, col("text"))
    intercept[IllegalArgumentException](TextAnalysis.compactLmStore(spark, flat))
  }

  test("trigram fluency: independent stupid-backoff replay, every branch exercised") {
    import graft.operators.TextAnalysis
    // model corpus; the scored docs then hit: a SEEN trigram ("the cat
    // sat"), an unseen trigram whose backoff bigram is seen ("ran the
    // cat" — "the cat" seen), an unseen bigram whose last unigram is
    // seen ("zq sat"), and a fully unseen word ("qqq")
    val model = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat down"))
    val mdf = spark.createDataFrame(model).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm3").toString
    TextAnalysis.appendLmBatch(mdf, col("text"), dir, batchId = 0L)
    val test = Seq(
      (10L, "the cat sat"),      // seen trigram: T=2, B12=3
      (11L, "ran the cat"),      // unseen trigram, "the cat" seen: B23=3, U2("the")=3
      (12L, "sat zq sat"),       // unseen everything w3="sat" seen: U3=3, N=10
      (13L, "xx yy qqq"),        // fully unseen: 0
      (14L, "ab"))               // too short: (0, 0)
    val tdf = spark.createDataFrame(test).toDF("doc_id", "text")
    val got = TextAnalysis.withTrigramFluencyIndexed(tdf, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // independent replay: N = 10 tokens, U(the)=3, U(cat)=3, U(sat)=2
    assert(got(10L) == (1L, 2L * 1000000L / 3L))       // T/B12 = 2/3
    assert(got(11L) == (1L, 3L * 400000L / 3L))        // 0.4 · B23/U2 = 0.4·3/3
    assert(got(12L) == (1L, 2L * 160000L / 10L))       // 0.16 · U3/N = 0.16·2/10
    assert(got(13L) == (1L, 0L))
    assert(got(14L) == (0L, 0L))
    // live self-score == indexed on the training corpus (seen branch only)
    val live = TextAnalysis.withTrigramFluency(mdf, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = TextAnalysis.withTrigramFluencyIndexed(mdf, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored == live)
  }

  test("randomized: held-out trigram scoring equals a brute stupid-backoff replay") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(83)
    val vocab = Array("a", "b", "c", "d", "ee", "f")
    def doc(len: Int): String =
      (0 until len).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    for (trial <- 1 to 3) {
      // small vocab => dense trigram overlap; lengths 0..6 cover the
      // no-trigram edge; one doc with doubled spaces => empty tokens
      val model = (1L to 30L).map(i => (i, doc(1 + rnd.nextInt(6))))
      val held = (100L to 114L).map(i =>
        (i, if (i == 100L) "a  b a" else doc(rnd.nextInt(7))))
      val dir = java.nio.file.Files.createTempDirectory(s"lm3rand$trial").toString
      val mdf = spark.createDataFrame(model).toDF("doc_id", "text")
      TextAnalysis.appendLmBatch(mdf, col("text"), dir, batchId = 0L)
      val got = TextAnalysis.withTrigramFluencyIndexed(
          spark.createDataFrame(held).toDF("doc_id", "text"),
          col("doc_id"), col("text"), dir)
        .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // brute replay (BigInt floor division, split(" ", -1) like tokens())
      val mToks = model.map(_._2.split(" ", -1).toSeq)
      val uni = mToks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = mToks.map(_.size).sum.toLong
      val bi = mToks.flatMap(ws => ws.zip(ws.drop(1)))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tri = mToks.flatMap(ws => ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      def fdiv(a: BigInt, b: BigInt): Long = (a / b).toLong // nonneg here
      val want = held.map { case (i, t) =>
        val ws = t.split(" ", -1).toSeq
        val ts = ws.lazyZip(ws.drop(1)).lazyZip(ws.drop(2)).toSeq.map { w3 =>
          if (tri.contains(w3)) fdiv(BigInt(tri(w3)) * 1000000, BigInt(bi((w3._1, w3._2))))
          else if (bi.contains((w3._2, w3._3)))
            fdiv(BigInt(bi((w3._2, w3._3))) * 400000, BigInt(uni(w3._2)))
          else fdiv(BigInt(uni.getOrElse(w3._3, 0L)) * 160000, BigInt(n))
        }
        i -> ((ts.size.toLong, if (ts.isEmpty) 0L else ts.sum / ts.size))
      }.toMap
      assert(got == want, s"trial $trial: ${got.toSet -- want.toSet}")
    }
  }

  test("trigram store lifecycle: takedown + compaction preserve scoring; pre-trigram store refuses") {
    import graft.operators.TextAnalysis
    val dir = java.nio.file.Files.createTempDirectory("lm3life").toString
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 0),
      col("text"), dir, batchId = 0L)
    TextAnalysis.appendLmBatch(docs.filter(col("doc_id") % 2 === 1),
      col("text"), dir, batchId = 1L)
    TextAnalysis.deleteFromLmStore(docs.filter(col("doc_id") % 7 === 3),
      col("text"), dir, batchId = 0L)
    val remaining = docs.filter(col("doc_id") % 7 =!= 3)
    val want = TextAnalysis.withTrigramFluency(remaining, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = TextAnalysis.withTrigramFluencyIndexed(remaining, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    TextAnalysis.compactLmStore(spark, dir)
    val compacted = TextAnalysis.withTrigramFluencyIndexed(remaining, col("doc_id"),
        col("text"), dir)
      .select(col("doc_id"), col("n_trigrams"), col("fluency3_e6"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(compacted == want)
    // a pre-trigram store (no trigrams table) refuses trigram scoring
    // loudly — and a PARTIALLY trigram-capable one (a batch appended by a
    // pre-trigram engine) refuses too
    val old = java.nio.file.Files.createTempDirectory("lm3old").toString
    TextAnalysis.appendLmBatch(docs.limit(20), col("text"), old, batchId = 0L)
    val fs = new org.apache.hadoop.fs.Path(old)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(old + "/trigrams"), true)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.withTrigramFluencyIndexed(docs.limit(5), col("doc_id"),
        col("text"), old)
    }
    assert(e.getMessage.contains("trigram"))
    TextAnalysis.appendLmBatch(docs.limit(20), col("text"), old, batchId = 1L)
    fs.delete(new org.apache.hadoop.fs.Path(old + "/trigrams/batch_id=0"), true)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.withTrigramFluencyIndexed(docs.limit(5), col("doc_id"),
        col("text"), old)
    }
    assert(e2.getMessage.contains("pre-trigram"))
    // bigram scoring on the mutilated store is unaffected (layout-agnostic)
    assert(TextAnalysis.withBigramFluencyIndexed(docs.limit(5), col("doc_id"),
      col("text"), old).count() == 5)
  }

  test("bigram fluency: independent replay on a hand corpus; garbage scores lower") {
    import graft.operators.TextAnalysis
    // hand corpus: doc 4 is a token salad of hapaxes, docs 1-3 share bigrams
    val corpus = Seq(
      (1L, "the cat sat"), (2L, "the cat ran"), (3L, "the cat sat"),
      (4L, "zq xv qn"), (5L, "solo"))
    val df = spark.createDataFrame(corpus).toDF("id", "text")
    val got = TextAnalysis.withBigramFluency(df, col("id"), col("text"))
      .select(col("id"), col("n_bigrams"), col("fluency_e6"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // independent replay in plain Scala (BigInt floor division)
    val toks = corpus.map { case (i, t) => i -> t.split(" ", -1).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = uni.size.toLong
    val bis = toks.flatMap { case (_, ws) => ws.zip(ws.drop(1)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = toks.map { case (i, ws) =>
      val ts = ws.zip(ws.drop(1)).map { p =>
        (BigInt(bis(p) + 1) * 1000000 / BigInt(uni(p._1) + vocab)).toLong
      }
      i -> (ts.size.toLong, if (ts.isEmpty) 0L else ts.sum / ts.size)
    }.toMap
    assert(got == want)
    // the salad doc scores strictly below every natural doc
    assert(Seq(1L, 2L, 3L).forall(i => got(i)._2 > got(4L)._2))
    assert(got(5L) == (0L, 0L)) // single token: no bigrams
  }

  test("assignSplit is a deterministic partition of the corpus") {
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Pipeline.assignSplit(docs, col("doc_id"), "graft", fr)
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    // every row labelled, all three labels used, proportions roughly honored
    assert(a.size == docs.count())
    val byLabel = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > byLabel("val") && byLabel("train") > byLabel("test"))
    // rerun (and a different upstream partitioning) gives identical labels
    val b = Pipeline.assignSplit(docs.repartition(7), col("doc_id"), "graft", fr)
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(a == b)
    // a different salt re-draws: at least one document moves
    val c = Pipeline.assignSplit(docs, col("doc_id"), "other", fr)
      .select(col("doc_id"), col("split")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(c != a)
  }

  test("assignSplit matches a driver-side md5 computation") {
    val got = Pipeline.assignSplit(docs.limit(50), col("doc_id"), "graft",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split")).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { r =>
      val hex = md.digest(s"${r.getLong(0)}:graft".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      val want =
        if (hex < Pipeline.hexBound(0.8)) "train"
        else if (hex < Pipeline.hexBound(0.8 + 0.1)) "val"
        else "test"
      assert(r.getString(1) == want, s"doc ${r.getLong(0)} hex $hex")
    }
  }

  test("capPerGroup == single-window row_number cap (skewed groups)") {
    import spark.implicits._
    // group 0 holds 500 rows spread over many partitions; others tiny
    val df = (0 until 600).map(i => (if (i < 500) 0L else i.toLong % 7, i.toLong))
      .toDF("g", "id").repartition(13)
    val got = Pipeline.capPerGroup(df, col("g"), col("id"), n = 5)
      .select(col("g"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy(col("g")).orderBy(col("id"))))
      .filter(col("rn") <= 5).select(col("g"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
  }

  test("tokenBudgetPerGroup == single-window cumulative cap (skewed groups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // group 0 holds 400 rows over many partitions; varying token counts
    val df = (0 until 500).map { i =>
      (if (i < 400) 0L else i.toLong % 5, i.toLong, 1L + rnd.nextInt(90))
    }.toDF("g", "id", "tok").repartition(11)
    val got = Pipeline.tokenBudgetPerGroup(df, col("g"), col("id"), col("tok"), 700L)
      .select(col("g"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df.withColumn("s",
        sum(col("tok")).over(Window.partitionBy(col("g")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("s") <= 700L).select(col("g"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // prefix semantics: in each group the kept set is a doc-id prefix of
    // the rows whose own token count fits — no row after the first overflow
    val kept = Pipeline.tokenBudgetPerGroup(df, col("g"), col("id"), col("tok"), 700L)
      .groupBy(col("g")).agg(max(col("id")).as("mx"), count(lit(1)).as("cnt")).collect()
    kept.foreach { r => assert(r.getLong(2) > 0) }
  }

  test("tokenBudgetPerGroup: a budget-blowing row still counts toward later rows") {
    import spark.implicits._
    // id1's 3500 tokens exceed the whole budget; id2 (tiny) comes after it
    // in group order. The oracle semantics drop BOTH (the running total is
    // already blown). Spread over many partitions so id1 and id2 land apart
    // — the failure mode of a naive local-prefix phase 1.
    val df = Seq((0L, 1L, 3500L), (0L, 2L, 100L), (1L, 3L, 10L))
      .toDF("g", "id", "tok").repartition(8)
    val got = Pipeline.tokenBudgetPerGroup(df, col("g"), col("id"), col("tok"), 3000L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(3L), s"got $got — id2 must not slip under a sum missing id1")
    // boundary: a first row exactly at the budget is kept, the next dropped
    val df2 = Seq((0L, 1L, 3000L), (0L, 2L, 1L)).toDF("g", "id", "tok").repartition(4)
    val got2 = Pipeline.tokenBudgetPerGroup(df2, col("g"), col("id"), col("tok"), 3000L)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got2 == Set(1L))
  }

  test("sampleByRate: whole copies + hash-selected fractional copy, rate 0 drops") {
    import spark.implicits._
    val df = (0 until 400).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val out = Pipeline.sampleByRate(df, col("src"), col("id"), "t",
      Map("s0" -> 2.0, "s1" -> 0.0, "s2" -> 0.5), 1.0)
    val bySrc = out.groupBy(col("src")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // s0: exactly 2 copies each (frac 0 -> cut 0000, no extra); s1 dropped
    assert(bySrc("s0") == 200L && !bySrc.contains("s1") && bySrc("s3") == 100L)
    // s2: hash-selected half — deterministic, strictly between 0 and all
    assert(bySrc("s2") > 0L && bySrc("s2") < 100L)
    // rerun is byte-identical (no RNG state)
    val again = Pipeline.sampleByRate(df, col("src"), col("id"), "t",
      Map("s0" -> 2.0, "s1" -> 0.0, "s2" -> 0.5), 1.0)
    assert(out.collect().map(_.toSeq).toSet == again.collect().map(_.toSeq).toSet)
    // copy indexes are 0..k-1 per row
    assert(out.filter(col("src") === "s0").groupBy(col("id"))
      .agg(collect_set(col("copy")).as("cs")).collect()
      .forall(_.getSeq[Long](1).toSet == Set(0L, 1L)))
  }

  test("contaminationPairs counts distinct shared shingles exactly") {
    import spark.implicits._
    // corpus doc 1 shares exactly 4 trigrams with bench doc 10 ("a b c d e f"
    // windows), doc 2 shares 3 (one word changed), doc 3 shares none;
    // repeated text in doc 4 must not double-count (distinct shingles)
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x f"),
      (3L, "p q r s t u"),
      (4L, "a b c a b c a b c")).toDF("doc_id", "text")
    val bench = Seq((10L, "a b c d e f")).toDF("doc_id", "text")
    val got = Pipeline.contaminationPairs(corpus, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc1: shingles {abc,bcd,cde,def} -> overlap 4; doc2: {abc,bcd} -> 2
    // (cdx,dxf differ); doc4: distinct shingles {abc,bca,cab} -> only abc -> 1
    assert(got == Set((1L, 10L, 4L), (2L, 10L, 2L)))
  }

  test("withRepetition hand-computed duplicate-ngram and top-token signals") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b a b a"), // 2g: 4 total/2 distinct; 3g: 3/2; top 'a' 3 of 5
      (2L, "x y z"),     // nothing repeats
      (3L, "w"),         // shorter than any n-gram
      (4L, "r r r r")    // maximal repetition
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.withRepetition(df, col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == ((500000L, 333333L, 600000L)))
    assert(got(2L) == ((0L, 0L, 333333L)))
    assert(got(3L) == ((0L, 0L, 1000000L)))
    assert(got(4L) == ((666666L, 500000L, 1000000L)))
  }

  test("flagPhrases == naive contains scan on random phrase/text draws") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(23)
    val alphabet = "abc"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(3))).mkString
    for (trial <- 1 to 20) {
      val phrases = (1 to (2 + rnd.nextInt(6))).map(_ => randStr(1 + rnd.nextInt(4)))
        .distinct
      val texts = (1 to 15).map(i => (i.toLong, randStr(rnd.nextInt(25))))
      val df = spark.createDataFrame(texts).toDF("id", "text")
      val got = TextAnalysis.flagPhrases(df, col("text"), phrases)
        .select(col("id"), col("flagged")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
      val want = texts.map { case (i, t) =>
        i -> phrases.filter(t.contains(_)).sorted
      }.toMap
      assert(got == want, s"trial $trial phrases=$phrases")
    }
  }

  test("flagPhrases: overlapping patterns, fail links, set semantics, nulls") {
    import graft.operators.TextAnalysis
    // "an jo" crosses a word boundary; "aba" overlaps itself in "ababa";
    // suffix phrase "ba" must fire through the fail link while matching "aba"
    val df = spark.createDataFrame(Seq(
      (1L, "scan join order"), (2L, "ababa"), (3L, "clean"), (4L, null: String)
    )).toDF("id", "text")
    val got = TextAnalysis.flagPhrases(df, col("text"),
        Seq("an jo", "aba", "ba", "scan", "zzz"))
      .select(col("id"), col("flagged"), col("flagged_n")).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[String](1).toSeq, r.getLong(2)))).toMap
    assert(got(1L) == ((Seq("an jo", "scan"), 2L)))
    assert(got(2L) == ((Seq("aba", "ba"), 2L)))
    assert(got(3L) == ((Seq.empty[String], 0L)))
    assert(got(4L) == ((Seq.empty[String], 0L)))
    intercept[IllegalArgumentException] {
      TextAnalysis.flagPhrases(df, col("text"), Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.flagPhrases(df, col("text"), Seq(""))
    }
  }

  test("redactPii masks each PII class and honors the documented order") {
    import spark.implicits._
    val df = Seq(
      (1L, "write to alice.smith+x@sub.example.co.uk today"),
      (2L, "server 192.168.0.1 responded"),
      (3L, "card 4111111111111111 exp 12/29"),
      (4L, "ssn 123-45-6789 on file"),
      (5L, "call +44 207-946-0958 or (212) 555-0175 or 555-867-5309"),
      (6L, "no pii here, just words and 42"),
      // a 16-digit run must become <NUM>, never a half-eaten <PHONE>
      (7L, "acct 1234567890123456 tail")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.redactPii(df, col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) == "write to <EMAIL> today")
    assert(got(2L) == "server <IP> responded")
    assert(got(3L) == "card <NUM> exp 12/29")
    assert(got(4L) == "ssn <SSN> on file")
    assert(got(5L) == "call <PHONE> or <PHONE> or <PHONE>")
    assert(got(6L) == "no pii here, just words and 42")
    assert(got(7L) == "acct <NUM> tail")
  }

  test("normalizeText composes NFC, strips controls, collapses, trims, folds") {
    import spark.implicits._
    // explicitly DECOMPOSED accents (e + U+0301) plus NUL, tab, newline, DEL
    val dirty = "  Cafe\u0301 \t DU \u0000\nMarche\u0301 \u007f  x  "
    val df = Seq((1L, dirty), (2L, "already clean"), (3L, ""))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.normalizeText(df, col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // NFC composes to U+00E9; controls become spaces, runs collapse, edges trim
    assert(got(1L) == "caf\u00e9 du march\u00e9 x")
    assert(got(2L) == "already clean")
    assert(got(3L) == "")
    val kept = graft.operators.TextAnalysis
      .normalizeText(df, col("text"), lowercase = false)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(kept(1L) == "Caf\u00e9 DU March\u00e9 x")
  }

  test("packSequences == single-window prefix-sum packing (skewed groups)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // group 0 holds 700 rows spread over many partitions — forces group
    // slices across range-partition boundaries (the carry-offset path)
    val df = (0 until 800).map { i =>
      (if (i < 700) 0L else i.toLong % 5, i.toLong, 1L + rnd.nextInt(90))
    }.toDF("g", "id", "tok").repartition(13)
    val got = Pipeline.packSequences(df, col("g"), col("id"), col("tok"), 200L)
      .select(col("g"), col("id"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val start = sum(col("tok")).over(Window.partitionBy(col("g")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)) - col("tok")
    val want = df.withColumn("bin", floor(start / 200L))
      .withColumn("bin_offset", start - col("bin") * 200L)
      .select(col("g"), col("id"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.nonEmpty)
    // bins within a group are gap-free from 0 (concat-and-chop leaves no hole)
    val binsG0 = got.filter(_._1 == 0L).map(_._3)
    assert(binsG0.min == 0L && (0L until binsG0.max).forall(binsG0.contains))
  }

  test("packSequences hand case: rows straddle window cuts") {
    import spark.implicits._
    // tokens 120,120,200 at budget 100: starts 0,120,240 ->
    // bins 0,1,2 with offsets 0,20,40
    val df = Seq((0L, 1L, 120L), (0L, 2L, 120L), (0L, 3L, 200L))
      .toDF("g", "id", "tok").repartition(5)
    val got = Pipeline.packSequences(df, col("g"), col("id"), col("tok"), 100L)
      .select(col("id"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 0L, 0L), (2L, 1L, 20L), (3L, 2L, 40L)))
  }

  test("chunkTokens: fixed windows with overlap, trailing partial window") {
    import spark.implicits._
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.chunkTokens(df, col("text"), size = 4, stride = 3)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"), col("chunk_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 0L, "t0 t1 t2 t3", 4L),
      (1L, 1L, "t3 t4 t5 t6", 4L),
      (1L, 2L, "t6", 1L),
      (2L, 0L, "a", 1L),
      (3L, 0L, "", 1L))) // split("") is [""]: one empty token, one chunk
  }

  test("chunkTokens with stride == size partitions: concatenation rebuilds the text") {
    import graft.operators.TextAnalysis
    val got = TextAnalysis.chunkTokens(docs, col("text"), size = 7, stride = 7)
      .select(col("doc_id"), col("chunk_id"), col("chunk_text"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getLong(1)).map(_.getString(2)).mkString(" ")
      }
    val want = docs.select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == want)
  }

  test("epochShuffle: exact permutation, deterministic, salt re-draws") {
    val n = docs.count()
    val a = Pipeline.epochShuffle(docs, col("doc_id"), "e1")
      .select(col("doc_id"), col("shuffle_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // ranks are a gap-free permutation of 0..n-1
    assert(a.values.toSet == (0L until n).toSet)
    // independent of upstream partitioning
    val b = Pipeline.epochShuffle(docs.repartition(7), col("doc_id"), "e1")
      .select(col("doc_id"), col("shuffle_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    // equals the single-window global rank on the same key (non-foldable
    // zero partition key: intentional one-partition oracle on test-sized
    // data, not an operator pattern — a literal would fold away and trip
    // the WindowExec no-partition warning)
    val key = md5(concat(col("doc_id").cast("string"), lit(":e1")).cast("binary"))
    val want = docs.withColumn("rk",
        (row_number().over(Window.partitionBy(pmod(col("doc_id"), lit(1))).orderBy(key, col("doc_id"))) - 1).cast("long"))
      .select(col("doc_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == want)
    // another salt is a different permutation
    val c = Pipeline.epochShuffle(docs, col("doc_id"), "e2")
      .select(col("doc_id"), col("shuffle_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(c != a)
  }

  test("lengthBucketBatches: hand case, invariants, partitioning-independent") {
    import spark.implicits._
    // sort by (ntok, id): (1,6),(2,2),(2,4),(5,1),(7,5),(9,3),(9,7)
    val df = Seq((1L, 5L), (2L, 2L), (3L, 9L), (4L, 2L), (5L, 7L), (6L, 1L), (7L, 9L))
      .toDF("id", "ntok")
    val got = Pipeline.lengthBucketBatches(df, col("id"), col("ntok"), batchSize = 3)
      .select(col("id"), col("batch_id"), col("batch_max_tokens")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      6L -> ((0L, 2L)), 2L -> ((0L, 2L)), 4L -> ((0L, 2L)),
      1L -> ((1L, 9L)), 5L -> ((1L, 9L)), 3L -> ((1L, 9L)),
      7L -> ((2L, 9L))))
    // corpus-level invariants: dense 0-based batch ids, every batch full
    // except at most the last, the max is the true per-batch max, and the
    // assignment is independent of upstream partitioning
    val d2 = docs.withColumn("ntok", size(split(col("text"), " ")).cast("long"))
    val a = Pipeline.lengthBucketBatches(d2, col("doc_id"), col("ntok"), batchSize = 32)
    val rows = a.select(col("doc_id"), col("ntok"), col("batch_id"), col("batch_max_tokens"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    val byBatch = rows.groupBy(_._3)
    assert(byBatch.keySet == (0L until ((n + 31) / 32).toLong).toSet)
    assert(byBatch.forall { case (b, rs) =>
      (rs.length == 32 || b == (n - 1) / 32) && rs.forall(_._4 == rs.map(_._2).max) })
    val b = Pipeline.lengthBucketBatches(d2.repartition(7), col("doc_id"), col("ntok"), 32)
      .select(col("doc_id"), col("batch_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._3)).toMap == b)
  }

  test("sampleExact: md5-order replay, nested carve-outs are consistent") {
    def localHash(id: Long, salt: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$salt".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val want = ids.sortBy(id => (localHash(id, "h1"), id)).take(7).toSet
    val got = Pipeline.sampleExact(docs, col("doc_id"), "h1", 7)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want)
    val bigger = Pipeline.sampleExact(docs, col("doc_id"), "h1", 20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(bigger))
  }

  test("snapshotDiff: all four statuses from a hand-built pair of versions") {
    import spark.implicits._
    val v1 = Seq((1L, "same"), (2L, "old text"), (3L, "gone")).toDF("id", "t")
    val v2 = Seq((1L, "same"), (2L, "new text"), (4L, "fresh")).toDF("id", "t")
    val got = Pipeline.snapshotDiff(v1, col("id"), col("t"), v2, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
    // NULL content is still PRESENCE: null==null content is unchanged,
    // null vs text is changed — never misreported as added/removed
    val n1 = Seq((1L, null: String), (2L, null: String)).toDF("id", "t")
    val n2 = Seq((1L, null: String), (2L, "now set")).toDF("id", "t")
    val gotN = Pipeline.snapshotDiff(n1, col("id"), col("t"), n2, col("id"), col("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(gotN == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("sampleExactPerGroup: per-source md5-order replay, balanced, nested") {
    def localHash(id: Long, salt: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$salt".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.select(col("source"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      g.map(_._2).sortBy(id => (localHash(id, "hg"), id)).take(3).toSeq
    }.toSet
    val got = Pipeline.sampleExactPerGroup(docs, col("source"), col("doc_id"), "hg", 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == want)
    // balanced: exactly min(3, |group|) rows per source
    val perSrc = Pipeline.sampleExactPerGroup(docs, col("source"), col("doc_id"), "hg", 3)
      .groupBy(col("source")).count().collect().map(_.getLong(1))
    assert(perSrc.forall(_ == 3)) // every fixture source holds >= 3 docs
    // nested: the size-3 sample is inside the size-10 sample, per group
    val bigger = Pipeline.sampleExactPerGroup(docs, col("source"), col("doc_id"), "hg", 10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(bigger))
  }

  test("curriculumOrder: dense ranks, stage-monotone, within-stage hash order, repartition-stable") {
    val d2 = docs.withColumn("ntok", size(split(col("text"), " ")).cast("long"))
    val rows = Pipeline.curriculumOrder(d2, col("doc_id"), col("ntok"),
        stages = 4, salt = "c1")
      .select(col("doc_id"), col("ntok"), col("stage"), col("curriculum_rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = rows.length
    assert(rows.map(_._4).sorted.toSeq == (0L until n).toSeq) // dense permutation
    val byRank = rows.sortBy(_._4)
    assert(byRank.map(_._3).toSeq == byRank.map(_._3).sorted.toSeq) // stages ascend
    // stage sizes differ by <= 1 and stage 0 holds the LONGEST docs
    val sizes = rows.groupBy(_._3).values.map(_.size)
    assert(sizes.max - sizes.min <= 1)
    assert(rows.filter(_._3 == 0L).map(_._2).min >= rows.filter(_._3 == 3L).map(_._2).max)
    // within a stage, order is (md5(id:salt), id)
    def h(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:c1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    byRank.groupBy(_._3).values.foreach { st =>
      val inOrder = st.sortBy(_._4).map(_._1).toSeq
      assert(inOrder == inOrder.sortBy(id => (h(id), id)))
    }
    val again = Pipeline.curriculumOrder(d2.repartition(7), col("doc_id"), col("ntok"),
        stages = 4, salt = "c1")
      .select(col("doc_id"), col("curriculum_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._4)).toMap == again)
  }

  test("interleaveBySource: card-dealing order, dense ranks, repartition-stable") {
    val rows = Pipeline.interleaveBySource(docs, col("doc_id"), col("source"), "il1")
      .select(col("doc_id"), col("source"), col("interleave_rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val n = rows.length
    assert(rows.map(_._3).sorted.toSeq == (0L until n).toSeq)
    // first |sources| positions hit |sources| distinct sources, and in
    // general the k-th "round" holds at most one row per source
    val bySrc = rows.groupBy(_._2)
    val s = bySrc.size
    val byRank = rows.sortBy(_._3)
    assert(byRank.take(s).map(_._2).distinct.length == s)
    // within-source subsequence of the global order == the md5 order
    def h(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:il1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    bySrc.values.foreach { g =>
      val inGlobal = g.sortBy(_._3).map(_._1).toSeq
      assert(inGlobal == inGlobal.sortBy(id => (h(id), id)))
    }
    val again = Pipeline.interleaveBySource(docs.repartition(7), col("doc_id"),
        col("source"), "il1")
      .select(col("doc_id"), col("interleave_rank")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._3)).toMap == again)
  }

  test("decontaminate drops exactly the flagged ids") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val flagged = Pipeline.contaminationPairs(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 3, minOverlap = 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val kept = Pipeline.decontaminate(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 3, minOverlap = 4)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("groupPercentiles: hand case with ties and a local-sort differential") {
    import spark.implicits._
    // group a sorted: 1,2,2,9 -> p0=1 (rank 1), p50=2 (rank (50*3)//100+1=2),
    // p75=2 (rank (75*3)//100+1=3), p100=9 (rank 4)
    val df = Seq(("a", 2L), ("a", 9L), ("a", 1L), ("a", 2L), ("b", 5L))
      .toDF("g", "v")
    val got = Pipeline.groupPercentiles(df, col("g"), col("v"),
        Seq(0, 50, 75, 100), groupName = "g")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(("a", 0) -> 1L, ("a", 50) -> 2L, ("a", 75) -> 2L, ("a", 100) -> 9L,
      ("b", 0) -> 5L, ("b", 50) -> 5L, ("b", 75) -> 5L, ("b", 100) -> 5L))
    // differential vs a driver-side sort on the corpus
    val d2 = docs.withColumn("ntok", size(split(col("text"), " ")).cast("long"))
    val a = Pipeline.groupPercentiles(d2, col("source"), col("ntok"),
        Seq(25, 50, 75), groupName = "source")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val local = d2.select(col("source"), col("ntok")).collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1)
    val want = local.flatMap { case (s, rows) =>
      val sorted = rows.map(_._2).sorted
      Seq(25, 50, 75).map(p => (s, p) -> sorted((p * (sorted.length - 1)) / 100))
    }
    assert(a == want)
  }

  test("withScripts counts Unicode script classes per code point") {
    import spark.implicits._
    val df = Seq((1L, "abc Привет 漢字 42!"), (2L, ""), (3L, "éß")).toDF("id", "text")
    val got = graft.operators.TextAnalysis.withScripts(df, col("text"))
      .select(col("id"), col("n_latin"), col("n_cyrillic"), col("n_han"),
        col("n_digit"), col("n_len"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // "abc Привет 漢字 42!": latin 3, cyrillic 6, han 2, digits 2, len 17
    assert(got(1L) == ((3L, 6L, 2L, 2L, 17L)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(got(3L) == ((2L, 0L, 0L, 0L, 2L))) // accented letters are Latin script
  }

  test("temperatureWeights: exact sqrt-rule weights, proportional at sqrts=0") {
    import spark.implicits._
    val df = Seq(("a", 3L), ("a", 1L), ("b", 2L), ("c", 9L)).toDF("g", "tok")
    val got = Pipeline.temperatureWeights(df, col("g"), col("tok"), sqrts = 1, groupName = "g")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // sqrt(4)=2, sqrt(2)=1.41421356..., sqrt(9)=3 — floors at e6
    assert(got == Map("a" -> ((4L, 2000000L)), "b" -> ((2L, 1414213L)), "c" -> ((9L, 3000000L))))
    val prop = Pipeline.temperatureWeights(df, col("g"), col("tok"), sqrts = 0, groupName = "g")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prop == Map("a" -> 4000000L, "b" -> 2000000L, "c" -> 9000000L))
    // smoothing flattens: the big/small weight ratio shrinks monotonically
    val q = Pipeline.temperatureWeights(df, col("g"), col("tok"), sqrts = 2, groupName = "g")
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prop("c").toDouble / prop("b") > got("c")._2.toDouble / got("b")._2)
    assert(got("c")._2.toDouble / got("b")._2 > q("c").toDouble / q("b"))
  }

  test("quantileBuckets: hand case, near-equal sizes, partitioning-independent") {
    import spark.implicits._
    // group x: 5 rows scored 50..10 -> buckets (desc order) 0,0,1,1,2
    val df = Seq(("x", 1L, 50L), ("x", 2L, 40L), ("x", 3L, 30L), ("x", 4L, 20L),
      ("x", 5L, 10L), ("y", 6L, 7L)).toDF("g", "id", "score")
    val got = Pipeline.quantileBuckets(df, col("g"), 3, "b",
        col("score").desc, col("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 2L, 6L -> 0L))
    // corpus invariants: per (source-)group, bucket sizes differ by <= 1
    // and are ordered-by-rank; stable under upstream repartitioning
    val d2 = docs.withColumn("ntok", size(split(col("text"), " ")).cast("long"))
    val a = Pipeline.quantileBuckets(d2, col("source"), 4, "qb",
        col("ntok").desc, col("doc_id"))
      .select(col("doc_id"), col("source"), col("qb")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    a.groupBy(_._2).foreach { case (_, rows) =>
      val sizes = rows.groupBy(_._3).values.map(_.size).toSeq
      assert(sizes.max - sizes.min <= 1)
    }
    val b = Pipeline.quantileBuckets(d2.repartition(7), col("source"), 4, "qb",
        col("ntok").desc, col("doc_id"))
      .select(col("doc_id"), col("qb")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.map(r => (r._1, r._3)).toMap == b)
  }

  test("dsirScores: exact local replay, target-likeness ordering, partitioning-independent select") {
    import graft.operators.Pipeline
    import org.apache.spark.unsafe.types.UTF8String
    // independent Scala replay of the documented formula over a hand corpus
    val corpus = Seq(
      (1L, "spark join agg spark join", "t"),
      (2L, "spark agg window table", "t"),
      (3L, "cat dog fish bird mouse", "r"),
      (4L, "spark join table scan", "r"),
      (5L, "zebra yak xerus wombat", "r"))
    val B = 64
    def feats(text: String): Seq[Int] = {
      val ws = text.split(" ", -1).toSeq
      val fs = ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
      fs.map(f => java.lang.Math.floorMod(
        graft.functions.TextOps.hashUtf8(UTF8String.fromString(f), 42L), B.toLong).toInt)
    }
    val tCnt = corpus.filter(_._3 == "t").flatMap(c => feats(c._2))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rCnt = corpus.flatMap(c => feats(c._2))
      .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tt = tCnt.values.sum; val rr = rCnt.values.sum
    def ratio(b: Int): Long =
      ((BigInt(tCnt.getOrElse(b, 0L) + 1) * (rr + B) * 1000000) /
        (BigInt(rCnt(b) + 1) * (tt + B))).toLong
    val want = corpus.map(c => c._1 -> feats(c._2).map(ratio).sum).toMap
    val df = spark.createDataFrame(corpus).toDF("id", "text", "kind")
    val got = Pipeline.dsirScores(df, col("id"), col("text"),
        df.filter(col("kind") === "t"), col("text"), buckets = B)
      .select(col("id"), col("dsir_score_e6")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
    // semantics: the target-vocabulary doc outranks the disjoint-vocab docs
    assert(got(4L) > got(3L) && got(4L) > got(5L))
    // selection: top-2 by (score desc, id) — and stable under repartitioning
    val sel = Pipeline.dsirSelect(df.repartition(7), col("id"), col("text"),
        df.filter(col("kind") === "t"), col("text"), buckets = B, n = 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val want2 = want.toSeq.sortBy { case (id, s) => (-s, id) }.take(2).map(_._1).toSet
    assert(sel == want2)
  }

  test("dsirScoresIndexed: store reproduces live scores; unseen buckets score the smoothed default") {
    import graft.operators.Pipeline
    val target = docs.filter(col("source") === "src0")
    val live = Pipeline.dsirScores(docs, col("doc_id"), col("text"),
        target, col("text"), buckets = 256)
      .select(col("doc_id"), col("dsir_score_e6")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val dir = java.nio.file.Files.createTempDirectory("dsirstore").toString
    Pipeline.buildDsirStore(docs, col("text"), target, col("text"), 256, dir)
    val stored = Pipeline.dsirScoresIndexed(docs, col("doc_id"), col("text"), dir)
      .select(col("doc_id"), col("dsir_score_e6")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stored == live)
    assert(live.nonEmpty)
    // a batch whose features miss the store's raw corpus scores the
    // reconstructed (T=0, R=0) default per feature: replay from the sidecar
    val Array(b, tt, rr) = graft.sources.Sidecar
      .readText(spark, dir + "/_graft_dsir_stats").split(" ").map(_.toLong)
    val default = (BigInt(rr + b) * 1000000 / BigInt(tt + b)).toLong
    val novel = spark.createDataFrame(Seq((99L, "qqqxyzzy wwwplugh"))).toDF("id", "text")
    val novelScore = Pipeline.dsirScoresIndexed(novel, col("id"), col("text"), dir)
      .select(col("dsir_score_e6")).collect()(0).getLong(0)
    // exact replay: 3 features (2 unigrams + 1 bigram), each scoring its
    // stored bucket ratio or — when the bucket misses the store — default
    val ratios = spark.read.parquet(dir + "/ratios").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Seq("qqqxyzzy", "wwwplugh", "qqqxyzzy wwwplugh").map { f =>
      val bkt = java.lang.Math.floorMod(graft.functions.TextOps.hashUtf8(
        org.apache.spark.unsafe.types.UTF8String.fromString(f), 42L), b)
      ratios.getOrElse(bkt, default)
    }.sum
    assert(novelScore == want)
  }

  test("contaminationPairs excludes self-pairs when benchmark is a subset") {
    val bench = docs.filter(col("doc_id") % 17 === 0)
    val pairs = Pipeline.contaminationPairs(docs, col("doc_id"), col("text"),
        bench, col("doc_id"), col("text"), n = 3, minOverlap = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b) => a != b && b % 17 == 0 })
  }

  test("quantileGate keeps exactly floor(cnt*p/q) rows per group (random sizes/fractions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random group sizes incl. tiny groups and a null group key
    val rows = (0 until 40).flatMap { g =>
      val sz = 1 + rnd.nextInt(60)
      val key: java.lang.Long = if (g == 0) null else Long.box(g.toLong)
      (0 until sz).map(i => (key, g * 1000L + i, rnd.nextInt(1000).toLong))
    }
    val df = rows.toDF("g", "id", "score").repartition(11)
    for ((p, q) <- Seq((1, 4), (1, 2), (3, 4), (1, 1), (2, 3))) {
      val kept = Pipeline.quantileGate(df, col("g"), p, q, col("score").desc, col("id"))
        .groupBy(col("g")).count().collect()
        .map(r => (Option(r.get(0)), r.getLong(1))).toMap
      val want = rows.groupBy(r => Option(r._1)).view
        .mapValues(rs => rs.size.toLong * p / q).toMap.filter(_._2 > 0)
      assert(kept == want, s"p/q=$p/$q")
    }
  }

  test("packSequences invariants: offsets within budget, bins tile the group stream") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map(i => (i % 5, i.toLong, 1L + rnd.nextInt(40)))
    val df = rows.toDF("g", "id", "tok").repartition(9)
    val out = Pipeline.packSequences(df, col("g"), col("id"), col("tok"), budget = 64L)
      .select(col("g"), col("id"), col("tok"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 300)
    out.foreach { case (_, _, _, bin, off) =>
      assert(bin >= 0 && off >= 0 && off < 64L)
    }
    // per group: bin*budget + bin_offset is the exclusive running sum in id order
    out.groupBy(_._1).foreach { case (_, rs) =>
      var acc = 0L
      rs.sortBy(_._2).foreach { case (_, _, tok, bin, off) =>
        assert(bin * 64L + off == acc)
        acc += tok
      }
    }
  }

  test("packSequences: a null token row gets a null bin, neighbors unaffected") {
    import spark.implicits._
    val df = Seq((0, 1L, java.lang.Long.valueOf(10L)), (0, 2L, null.asInstanceOf[java.lang.Long]),
      (0, 3L, java.lang.Long.valueOf(10L))).toDF("g", "id", "tok")
    val out = Pipeline.packSequences(df, col("g"), col("id"), col("tok"), budget = 16L)
      .select(col("id"), col("bin"), col("bin_offset")).collect()
      .map(r => (r.getLong(0), (if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2)))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((null, null))) // null tokens: no position, no crash
    assert(out(3L) == ((0L, 10L)))    // null row contributed nothing
  }

  test("quantileGate == single-window formulation (skewed groups, desc order)") {
    import spark.implicits._
    // group 0 holds 500 of 600 rows spread over many input partitions
    val df = (0 until 600).map(i => (if (i < 500) 0L else i.toLong % 7, i.toLong, (i * 37 % 101).toLong))
      .toDF("g", "id", "score").repartition(13)
    val got = Pipeline.quantileGate(df, col("g"), 1, 4, col("score").desc, col("id"))
      .select(col("g"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("score").desc, col("id"))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
      .filter(col("rn") * 4 <= col("cnt"))
      .select(col("g"), col("id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // keep-everything fraction is the identity
    val all = Pipeline.quantileGate(df, col("g"), 1, 1, col("score").desc, col("id")).count()
    assert(all == 600)
    // a group smaller than the denominator keeps nothing (rank 1 > cnt/4)
    val tiny = Seq((9L, 1L, 5L), (9L, 2L, 6L)).toDF("g", "id", "score")
    assert(Pipeline.quantileGate(tiny, col("g"), 1, 4, col("score").desc, col("id")).count() == 0)
  }
}
