package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BPE trainer/tokenizer: the Sennrich hand example, an independent
 * naive-differential of the merge loop on random corpora, and the
 * apply-path invariants (lossless round-trip, unseen-word robustness).
 */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Independent reimplementation of the merge loop: counts pairs with
    * groupBy on immutable maps, no shared code with the operator's
    * mutable-array version. */
  private def naiveBpe(hist: Seq[(String, Long)], n: Int): Seq[(String, String)] = {
    def pairs(w: Seq[String]): Seq[(String, String)] = w.zip(w.drop(1))
    var words: Seq[(Seq[String], Long)] =
      hist.map { case (w, c) => (w.map(_.toString) :+ "</w>", c) }
    var out = List.empty[(String, String)]
    var i = 0
    while (i < n) {
      val counts = words.flatMap { case (w, c) => pairs(w).map(_ -> c) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (counts.isEmpty) i = n
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        out = best :: out
        words = words.map { case (w, c) =>
          val b = Seq.newBuilder[String]
          var j = 0
          while (j < w.length) {
            if (j + 1 < w.length && (w(j), w(j + 1)) == best) { b += w(j) + w(j + 1); j += 2 }
            else { b += w(j); j += 1 }
          }
          (b.result(), c)
        }
        i += 1
      }
    }
    out.reverse
  }

  test("Sennrich hand example: low/lower/newest/widest learns est then es merges") {
    // the canonical BPE paper fixture (counts from the paper)
    val hist = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMergesLocal(hist, 4)
    // round 1: (e,s) count 9 beats everything (ties impossible here)
    assert(merges.head == ("e", "s"))
    // round 2 merges (es,t) with count 9
    assert(merges(1) == ("es", "t"))
    // subsequent merges keep consuming the highest-count pair
    assert(merges.length == 4)
    assert(merges == naiveBpe(hist, 4))
  }

  test("merge loop == naive differential on random histograms") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val vocab = (1 to 30).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }.distinct
      val hist = vocab.map(w => w -> (1L + rnd.nextInt(50)))
      val n = 1 + rnd.nextInt(10)
      assert(Bpe.learnMergesLocal(hist, n) == naiveBpe(hist, n),
        s"trial $trial diverged on hist=$hist n=$n")
    }
  }

  test("learnBpe over a DataFrame corpus matches the local loop on its histogram") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = Bpe.learnBpe(docs, col("text"), numMerges = 12)
      .orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val hist = Bpe.wordHistogram(docs, col("text"), 10000)
    assert(merges == Bpe.learnMergesLocal(hist, 12))
    assert(merges.length == 12)
  }

  test("applyBpe round-trips: concatenated subwords reproduce each word exactly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val merges = Bpe.learnBpe(docs, col("text"), numMerges = 20)
    val toks = Bpe.applyBpe(docs, col("text"), merges)
      .select(col("text"), col("bpe_tokens")).collect()
    assert(toks.nonEmpty)
    toks.foreach { r =>
      val text = r.getString(0)
      val rebuilt = r.getSeq[String](1).mkString("")
        .split(Bpe.EndOfWord, -1).dropRight(1).mkString(" ")
      assert(rebuilt == text, s"round-trip broke for: $text")
    }
  }

  test("merge store round-trips: stored application == live application") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("bpestore").toString
    val merges = Bpe.learnBpe(docs, col("text"), numMerges = 20)
    Bpe.buildMergeStore(merges, s"$tmp/store")
    val loaded = Bpe.loadMergeStore(spark, s"$tmp/store")
    val live = merges.orderBy(col("merge_rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(loaded == live && loaded.length == 20)
    val fromStore = Bpe.applyBpeStored(docs.limit(30), col("text"), s"$tmp/store")
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0)).toSeq
    val direct = Bpe.applyBpe(docs.limit(30), col("text"), live)
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0)).toSeq
    assert(fromStore == direct)
    // segmentWords covers every distinct word, symbols joined by spaces
    val segs = Bpe.segmentWords(docs, col("text"), live)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    segs.foreach { case (w, s) =>
      assert(s.split(" ").mkString("") == w + Bpe.EndOfWord)
    }
  }

  test("applyBpe segments unseen words (falls back toward characters)") {
    val train = spark.createDataFrame(Seq(1L -> "aa aa aa ab")).toDF("id", "text")
    val merges = Bpe.learnBpe(train, col("text"), numMerges = 2)
    val unseen = spark.createDataFrame(Seq(1L -> "zq aa")).toDF("id", "text")
    val out = Bpe.applyBpe(unseen, col("text"), merges).select(col("bpe_tokens"))
      .collect().head.getSeq[String](0)
    // zq never trained: stays as chars + marker; aa was trained: compressed
    assert(out.startsWith(Seq("z", "q", Bpe.EndOfWord)))
    assert(out.drop(3).length < 3 + 1) // "aa</w>" needs at most 2 symbols after training
  }

  test("segmentation priority follows merge rank, not greedy left-to-right") {
    // ranks: (b,c) before (a,b) — in "abc</w>" the best-ranked pair (b,c)
    // must merge first even though (a,b) is leftmost
    val rank = Map(("b", "c") -> 0, ("a", "b") -> 1)
    assert(Bpe.segmentWord("abc", rank) == Seq("a", "bc", "</w>"))
  }

  test("byte encoder: GPT-2 table pins (space=G-dot, newline=C-dot), bijective") {
    // the famous mappings: space (0x20) is the 33rd non-printable from 0
    // => 256+32 = 0x120 'Ġ'; newline (0x0A) => 256+10 = 0x10A 'Ċ'
    assert(Bpe.byteEncoder(32) == "\u0120")
    assert(Bpe.byteEncoder(10) == "\u010A")
    // printable ASCII maps to itself
    assert(Bpe.byteEncoder('a'.toInt) == "a" && Bpe.byteEncoder('~'.toInt) == "~")
    // bijective: 256 distinct one-char symbols, decoder inverts
    assert(Bpe.byteEncoder.toSet.size == 256)
    assert((0 until 256).forall(b => Bpe.byteDecoder(Bpe.byteEncoder(b).charAt(0)) == b))
  }

  test("byte-level BPE round-trips non-ASCII text losslessly") {
    val texts = Seq("h\u00e9llo w\u00f6rld", "\u4f60\u597d \u4e16\u754c",
      "caf\u00e9 \u20ac5 na\u00efve", "plain ascii words")
    val train = spark.createDataFrame(texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t) }).toDF("id", "text")
    val merges = Bpe.learnBpe(train, col("text"), numMerges = 20, byteLevel = true)
    val out = Bpe.applyBpe(train, col("text"), merges.orderBy(col("merge_rank"))
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq,
        byteLevel = true)
      .select(col("id"), col("bpe_tokens")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // decode concatenates per-word byte symbols; words rejoin on space
      val words = t.split(" ", -1)
      val decoded = Bpe.decodeByteTokens(out(i.toLong))
      assert(decoded == words.mkString(""),
        s"round trip failed for '$t': got '$decoded'")
    }
    // a single non-ASCII word under NO merges is one symbol per UTF-8 byte
    val syms = Bpe.initSymbolsBytes("\u20ac") // euro = 3 bytes E2 82 AC
    assert(syms.length == 4 && syms.last == Bpe.EndOfWord)
    assert(Bpe.decodeByteTokens(syms) == "\u20ac")
  }

  test("byte-level == char-level on pure-ASCII corpora; store freezes the mode") {
    val train = spark.createDataFrame(Seq(
      (1L, "low lower lowest"), (2L, "new newest widest"),
      (3L, "low low newest"))).toDF("id", "text")
    val charM = Bpe.learnBpe(train, col("text"), numMerges = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val byteM = Bpe.learnBpe(train, col("text"), numMerges = 10, byteLevel = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(byteM == charM) // printable ASCII bytes self-map
    // mode sidecar: a byte-level store applies byte-level after reload
    val dir = java.nio.file.Files.createTempDirectory("bpebyte").toString
    val nonAscii = spark.createDataFrame(Seq((1L, "\u00e9a \u00e9a \u00e9b")))
      .toDF("id", "text")
    Bpe.buildMergeStore(
      Bpe.learnBpe(nonAscii, col("text"), numMerges = 3, byteLevel = true),
      dir, byteLevel = true)
    assert(Bpe.storedBpeMode(spark, dir) == "byte")
    val stored = Bpe.applyBpeStored(nonAscii, col("text"), dir)
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0))
    val live = Bpe.applyBpe(nonAscii, col("text"),
        Bpe.loadMergeStore(spark, dir), byteLevel = true)
      .select(col("bpe_tokens")).collect().map(_.getSeq[String](0))
    assert(stored.toSeq == live.toSeq)
    // and every token round-trips through the byte decoder
    stored.flatten.foreach { t =>
      Bpe.decodeByteTokens(Seq(t)) // must not throw (valid byte symbols)
    }
  }
}
