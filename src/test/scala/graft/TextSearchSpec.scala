package graft

import graft.operators.TextSearch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BM25 retrieval: hand-computed fixture scores for the exact-integer mode
 * (the formula is replayed independently in plain Scala below), plus the
 * classic-ln differential — both modes must rank a corpus identically
 * wherever the quantized scores are not tied.
 */
class TextSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Independent replay of the documented formula: floor fixed-point in
    * BigInt (not the operator's Decimal path). */
  private def fx(a: BigInt, b: BigInt, s: Int): Long =
    ((a * BigInt(10).pow(s)) / b).toLong
  private def expectedScores(corpus: Seq[(Long, String)], terms: Seq[String]): Map[Long, Long] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val n = BigInt(toks.size)
    val sdl = BigInt(toks.map(_._2.size).sum)
    val dfs = terms.map(t => BigInt(toks.count(_._2.contains(t))))
    toks.map { case (id, ws) =>
      val dl = BigInt(ws.size)
      val score = terms.indices.map { i =>
        val tf = BigInt(ws.count(_ == terms(i)))
        fx(2 * n - 2 * dfs(i) + 1, 2 * dfs(i) + 1, 4) *
          fx(22 * tf * sdl, 10 * tf * sdl + 3 * sdl + 9 * dl * n, 4)
      }.sum
      id -> score
    }.toMap
  }

  test("exact-mode scores match an independent BigInt replay of the formula") {
    val corpus = Seq(
      1L -> "spark joins the hash table fast",
      2L -> "hash hash hash collisions slow the scan",
      3L -> "a filter pass with no query words",
      4L -> "spark spark spark spark streaming")
    val df = spark.createDataFrame(corpus).toDF("id", "text")
    val terms = Seq("spark", "hash")
    val got = TextSearch.bm25TopKExact(df, col("id"), col("text"), terms, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = expectedScores(corpus, terms).filter(_._2 > 0)
    assert(got == want)
    assert(!got.contains(3L)) // no query term -> excluded
  }

  test("tf saturation: more occurrences score higher but sublinearly") {
    val corpus = (1 to 8).map(i => i.toLong -> (Seq.fill(i)("spark") ++
      Seq.fill(8 - i)("pad")).mkString(" "))
    val df = spark.createDataFrame(corpus).toDF("id", "text")
    val rows = TextSearch.bm25TopKExact(df, col("id"), col("text"), Seq("spark"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // ranked by tf descending (equal dl everywhere)
    assert(rows.map(_._1).toSeq == (8L to 1L by -1L))
    val byId = rows.toMap
    val gain1 = byId(2L) - byId(1L)
    val gain7 = byId(8L) - byId(7L)
    assert(gain1 > gain7 && gain7 > 0) // concave saturation curve
  }

  test("classic-ln mode agrees with exact mode on the fixture corpus") {
    // multi-term: the two idf forms weight rare terms differently, so only
    // the MATCH SET is mode-invariant (k exceeds the match count here)
    val terms = Seq("spark", "hash", "join")
    val exactSet = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"), terms, 1000)
      .collect().map(_.getLong(0)).toSet
    val classicSet = TextSearch.bm25TopK(docs, col("doc_id"), col("text"), terms, 1000)
      .collect().map(_.getLong(0)).toSet
    assert(exactSet.nonEmpty && exactSet == classicSet)
    // single-term: idf is a common positive factor, so ranking reduces to
    // the shared tf-saturation curve — order must agree wherever the
    // exact mode's quantized scores are strict (ties may legally reorder)
    val exact = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"), Seq("spark"), 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val classic = TextSearch.bm25TopK(docs, col("doc_id"), col("text"), Seq("spark"), 1000)
      .collect().map(_.getLong(0))
    assert(exact.map(_._1).toSet == classic.toSet)
    val classicRank = classic.zipWithIndex.toMap
    exact.sliding(2).foreach {
      case Array((idA, sA), (idB, sB)) if sA != sB =>
        assert(classicRank(idA) < classicRank(idB),
          s"doc $idA (e8=$sA) must outrank $idB (e8=$sB) in classic mode")
      case _ =>
    }
  }

  test("indexed mode == live mode: scores from the postings store are identical") {
    val dir = java.nio.file.Files.createTempDirectory("textindex").toString
    TextSearch.buildTextIndex(docs, dir, col("doc_id"), col("text"))
    assert(new java.io.File(dir, "_SUCCESS").exists())
    for (terms <- Seq(Seq("spark"), Seq("spark", "hash", "join"), Seq("nosuchterm"))) {
      val live = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"), terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val stored = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(stored == live, s"terms=$terms diverged")
    }
  }

  test("segmented store: appends fold to the one-pass build's exact scores") {
    val dir = java.nio.file.Files.createTempDirectory("textseg").toString
    // skewed split: batch 0 carries ~90% of the corpus, batch 1 the rest —
    // the fold must not care how history was sliced
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 10 =!= 0),
      col("doc_id"), col("text"), dir, batchId = 0L)
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), dir, batchId = 1L)
    for (terms <- Seq(Seq("spark"), Seq("spark", "hash", "join"), Seq("nosuchterm"))) {
      val live = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"), terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val stored = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(stored == live, s"terms=$terms diverged")
    }
    // replayed batch: overwriting its own partition is idempotent
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 10 === 0),
      col("doc_id"), col("text"), dir, batchId = 1L)
    val live = TextSearch.bm25TopKExact(docs, col("doc_id"), col("text"),
        Seq("spark", "hash"), 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val replayed = TextSearch.bm25TopKExactIndexed(spark, dir, Seq("spark", "hash"), 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(replayed == live)
  }

  test("takedown: forget == an index built over the remaining corpus") {
    val dir = java.nio.file.Files.createTempDirectory("textdel").toString
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), dir, batchId = 0L)
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text"), dir, batchId = 1L)
    // forget every fifth doc, plus stray ids the store never held
    val victims = docs.filter(col("doc_id") % 5 === 2).select(col("doc_id"))
      .union(spark.range(900000, 900003).select(col("id").as("doc_id")))
    TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, batchId = 0L)
    val remaining = docs.filter(col("doc_id") % 5 =!= 2)
    val rebuilt = java.nio.file.Files.createTempDirectory("textdel2").toString
    TextSearch.buildTextIndex(remaining, rebuilt, col("doc_id"), col("text"))
    for (terms <- Seq(Seq("spark"), Seq("spark", "hash", "join"))) {
      val want = TextSearch.bm25TopKExactIndexed(spark, rebuilt, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == want, s"terms=$terms diverged")
      assert(want.nonEmpty)
    }
    // re-deleting the same ids (new batch) contributes nothing
    TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, batchId = 1L)
    val again = TextSearch.bm25TopKExactIndexed(spark, dir, Seq("spark"), 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = TextSearch.bm25TopKExactIndexed(spark, rebuilt, Seq("spark"), 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(again == want)
    // crash-replay: the SAME delete batch re-delivered (foreachBatch replay
    // after a crash before the commit-log write) must rewrite its own
    // negative segments identically — NOT anti-join its own tombstones into
    // an empty victim set and erase the takedown
    TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, batchId = 0L)
    TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, batchId = 1L)
    for (terms <- Seq(Seq("spark"), Seq("spark", "hash", "join"))) {
      val replayed = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = TextSearch.bm25TopKExactIndexed(spark, rebuilt, terms, 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(replayed == expect, s"replayed delete diverged for terms=$terms")
    }
    // flat stores refuse takedown-by-append; negative batch ids refused
    intercept[IllegalArgumentException] {
      TextSearch.deleteFromTextIndex(victims, col("doc_id"), rebuilt, 0L)
    }
    intercept[IllegalArgumentException] {
      TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, -1L)
    }
  }

  test("lifecycle fuzz: random append/delete/compact histories == rebuild") {
    val rnd = new scala.util.Random(17)
    val all = docs.select(col("doc_id")).collect().map(_.getLong(0))
    for (trial <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory(s"textfuzz$trial").toString
      val inStore = scala.collection.mutable.Set.empty[Long]
      val pending = scala.collection.mutable.Queue(rnd.shuffle(all.toSeq): _*)
      var batch = 0L
      var delBatch = 0L
      for (step <- 1 to 6) {
        rnd.nextInt(3) match {
          case 0 | 1 => // append a random slice of not-yet-ingested docs
            val n = 1 + rnd.nextInt(math.max(pending.size, 1))
            val ids = (1 to math.min(n, pending.size)).map(_ => pending.dequeue()).toSet
            if (ids.nonEmpty) {
              TextSearch.appendTextBatch(docs.filter(col("doc_id").isin(ids.toSeq: _*)),
                col("doc_id"), col("text"), dir, batch)
              inStore ++= ids; batch += 1
            }
          case 2 if inStore.nonEmpty => // forget a random subset
            val victims = rnd.shuffle(inStore.toSeq).take(1 + rnd.nextInt(inStore.size))
            val vdf = docs.filter(col("doc_id").isin(victims: _*)).select(col("doc_id"))
            TextSearch.deleteFromTextIndex(vdf, col("doc_id"), dir, delBatch)
            // crash-replay: half the time the SAME delete batch is
            // re-delivered (foreachBatch redelivery) — serving must be
            // unchanged (the replay rewrites identical negative segments,
            // never an empty set)
            if (rnd.nextBoolean())
              TextSearch.deleteFromTextIndex(vdf, col("doc_id"), dir, delBatch)
            inStore --= victims; delBatch += 1
          case _ => ()
        }
        if (step == 3 && batch > 0) { // mid-history compaction
          TextSearch.compactTextIndex(spark, dir)
          batch = 0L; delBatch = 0L // ids are reusable post-compact
        }
      }
      if (batch > 0) { // at least one segment exists — the store is readable
        // an emptied-out store (everything deleted) is a legal degenerate:
        // both sides must serve zero rows
        val remaining = docs.filter(col("doc_id").isin(inStore.toSeq: _*))
        val rebuilt = java.nio.file.Files.createTempDirectory(s"textfuzzr$trial").toString
        TextSearch.buildTextIndex(remaining, rebuilt, col("doc_id"), col("text"))
        for (terms <- Seq(Seq("spark"), Seq("spark", "hash", "join"))) {
          val want = TextSearch.bm25TopKExactIndexed(spark, rebuilt, terms, 50)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          val got = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 50)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
          assert(got == want,
            s"trial $trial terms=$terms store=${inStore.size} docs diverged")
        }
      }
    }
  }

  test("batched BM25 == per-query index probes; duplicate terms deduped") {
    val dir = java.nio.file.Files.createTempDirectory("bm25batch").toString
    TextSearch.buildTextIndex(docs, dir, col("doc_id"), col("text"))
    val batches = Seq(Seq("spark", "hash"), Seq("join"),
      Seq("batch", "stream", "join"), Seq("nosuchterm"))
    val spark2 = spark
    import spark2.implicits._
    val queries = batches.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("query_id", "terms")
    val got = TextSearch.bm25BatchExactIndexed(queries, col("query_id"),
        col("terms"), dir, k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = batches.zipWithIndex.flatMap { case (ts, i) =>
      TextSearch.bm25TopKExactIndexed(spark, dir, ts, 15)
        .collect().map(r => (i.toLong, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == want && got.nonEmpty)
    // duplicate terms inside one batch row are deduped, not double-counted
    val dup = Seq((0L, Seq("spark", "spark", "hash"))).toDF("query_id", "terms")
    val gotDup = TextSearch.bm25BatchExactIndexed(dup, col("query_id"),
        col("terms"), dir, k = 15)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val wantDup = TextSearch.bm25TopKExactIndexed(spark, dir,
        Seq("spark", "hash"), 15)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotDup == wantDup)
  }

  test("phrase search: indexed == live, overlaps counted, takedown respected") {
    val dir = java.nio.file.Files.createTempDirectory("textphrase").toString
    TextSearch.appendTextBatch(docs, col("doc_id"), col("text"), dir, batchId = 0L)
    for (phrase <- Seq(Seq("batch", "batch"), Seq("hash", "scan", "join"),
        Seq("spark"), Seq("nosuch", "phrase"))) {
      val live = TextSearch.phraseOccurrences(docs, col("doc_id"), col("text"), phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val idx = TextSearch.phraseSearchIndexed(spark, dir, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(idx == live, s"phrase=$phrase diverged")
    }
    // hand case: overlapping occurrences and a boundary non-match
    val hand = spark.createDataFrame(Seq(
      (1L, "batch batch batch end"),       // "batch batch" twice (overlap)
      (2L, "batch end batch"),             // never adjacent -> no match
      (3L, "a batch batch"),
      (4L, "batch"))).toDF("id", "text")
    val got = TextSearch.phraseOccurrences(hand, col("id"), col("text"),
        Seq("batch", "batch"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L))
    // a forgotten doc disappears from phrase results too
    val victims = TextSearch.phraseSearchIndexed(spark, dir, Seq("batch", "batch"))
      .select(col("doc_id")).limit(1)
    val victimIds = victims.collect().map(_.getLong(0)).toSet
    assert(victimIds.nonEmpty)
    TextSearch.deleteFromTextIndex(victims, col("doc_id"), dir, batchId = 0L)
    val after = TextSearch.phraseSearchIndexed(spark, dir, Seq("batch", "batch"))
      .collect().map(_.getLong(0)).toSet
    assert(victimIds.forall(!after.contains(_)))
  }

  test("compaction folds segments + tombstones into one segment, serving unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("textcmp").toString
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), dir, batchId = 0L)
    TextSearch.appendTextBatch(docs.filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text"), dir, batchId = 1L)
    TextSearch.deleteFromTextIndex(
      docs.filter(col("doc_id") % 5 === 2).select(col("doc_id")),
      col("doc_id"), dir, batchId = 0L)
    val terms = Seq("spark", "hash", "join")
    val before = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    TextSearch.compactTextIndex(spark, dir)
    val after = TextSearch.bm25TopKExactIndexed(spark, dir, terms, 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(after == before && after.nonEmpty)
    // one segment, history gone
    def segs(t: String) = Option(new java.io.File(s"$dir/$t").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(segs("postings").size == 1 && segs("dict").size == 1 &&
      segs("segstats").size == 1)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    // appends resume cleanly beside the compacted segment — batch id 0 is
    // safe to REUSE because compaction parked history at the reserved id
    val extra = spark.createDataFrame(Seq((900001L, "spark spark extra doc")))
      .toDF("doc_id", "text")
    TextSearch.appendTextBatch(extra, col("doc_id"), col("text"), dir, batchId = 0L)
    val grown = TextSearch.bm25TopKExactIndexed(spark, dir, Seq("spark"), 1000)
      .collect().map(_.getLong(0)).toSet
    assert(grown.contains(900001L))
    // a flat store refuses compaction
    val flat = java.nio.file.Files.createTempDirectory("textcmpflat").toString
    TextSearch.buildTextIndex(docs, flat, col("doc_id"), col("text"))
    intercept[IllegalArgumentException](TextSearch.compactTextIndex(spark, flat))
  }

  test("segmented append refuses a flat buildTextIndex store loudly") {
    val dir = java.nio.file.Files.createTempDirectory("textflat").toString
    TextSearch.buildTextIndex(docs, dir, col("doc_id"), col("text"))
    val e = intercept[IllegalArgumentException] {
      TextSearch.appendTextBatch(docs.limit(5), col("doc_id"), col("text"),
        dir, batchId = 0L)
    }
    assert(e.getMessage.contains("flat store"))
  }

  test("property: exact scores == BigInt replay on random corpora (empty docs, unicode, repeats)") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "bb", "ccc", "déjà", "日本", "x1", "", "the")
    for (trial <- 1 to 15) {
      val corpus = (1 to (5 + rnd.nextInt(40))).map { i =>
        val len = rnd.nextInt(12) // 0 tokens possible -> text "" (dl = 1, [""])
        i.toLong -> Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val terms = rnd.shuffle(vocab.filter(_.nonEmpty)).take(1 + rnd.nextInt(3))
      val df = spark.createDataFrame(corpus).toDF("id", "text")
      val got = TextSearch.bm25TopKExact(df, col("id"), col("text"), terms, 1000)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = expectedScores(corpus, terms).filter(_._2 > 0)
      assert(got == want, s"trial $trial terms=$terms corpus=$corpus")
    }
  }

  test("oracle SQL text stays in lockstep with the Scala formula shape") {
    val sql = TextSearch.bm25ExactOracleSql("documents", "doc_id", "text",
      Seq("spark", "hash"), 25)
    // the load-bearing constants of the integer formulation
    for (frag <- Seq("22*tf0*sdl", "10*tf0*sdl + 3*sdl + 9*dl*n",
        "2*n - 2*df0 + 1", "2*df0 + 1", "score_e8 DESC, doc_id LIMIT 25"))
      assert(sql.contains(frag), s"oracle SQL lost fragment: $frag")
  }

  test("input contract: duplicate terms and reserved columns fail loudly") {
    val df = spark.createDataFrame(Seq(1L -> "a b")).toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      TextSearch.bm25TopKExact(df, col("id"), col("text"), Seq("a", "a"), 5)
    }
    assert(e.getMessage.contains("duplicate query terms"))
    val bad = df.withColumn("__dl", lit(1))
    val e2 = intercept[IllegalArgumentException] {
      TextSearch.bm25TopKExact(bad, col("id"), col("text"), Seq("a"), 5)
    }
    assert(e2.getMessage.contains("__dl"))
  }
}
