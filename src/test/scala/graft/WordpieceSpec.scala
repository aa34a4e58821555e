package graft

import graft.operators.Wordpiece
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.math.Ordering.Implicits._

/**
 * WordPiece-style tokenizer: hand-checked vocabulary selection, an
 * independent brute-force differential of the fewest-token segmentation
 * (full enumeration, no shared code with the DP), and the apply-path
 * invariants (lossless round-trip, unseen-character fallback, never worse
 * than greedy longest-match).
 */
class WordpieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Exhaustive segmentation enumeration; best by (token count, then the
    * walk's longest-first preference encoded as LATEST lexicographic
    * token-length sequence). Independent of the operator's DP. */
  private def bruteSegment(word: String, vocab: Set[String], maxLen: Int): Seq[String] = {
    def all(pos: Int): Seq[List[String]] =
      if (pos == word.length) Seq(Nil)
      else (1 to math.min(maxLen, word.length - pos)).flatMap { l =>
        val t = word.substring(pos, pos + l)
        if (l == 1 || vocab.contains(t)) all(pos + l).map(t :: _) else Nil
      }
    // among minimal-count segmentations, the deterministic walk output is
    // the one whose token lengths are lexicographically GREATEST (longest
    // consistent token first at every position)
    all(0).minBy(seg => (seg.length, seg.map(t => -t.length).toIndexedSeq.toList))
  }

  test("vocabulary selection: chars always enter, multi-char slots by (count, token)") {
    // 'ab' occurs 3x overlapping-counted in 'abab' (positions 1,3) + 'ab'
    val hist = Seq("abab" -> 2L, "ab" -> 1L, "cd" -> 1L)
    val vocab = Wordpiece.learnVocabLocal(hist, vocabSize = 6, maxTokenLen = 2)
    val m = vocab.toMap
    assert(m("a") == 5L && m("b") == 5L && m("c") == 1L && m("d") == 1L)
    assert(m("ab") == 5L) // 2 starts x count 2 + 1
    // 6 slots: 4 chars + 2 multi -> 'ab' (5) then 'ba' (2) beats 'cd' (1)
    assert(vocab.map(_._1).toSet == Set("a", "b", "c", "d", "ab", "ba"))
    // a tiny vocabSize still keeps every char (coverage beats the cap)
    val tight = Wordpiece.learnVocabLocal(hist, vocabSize = 2, maxTokenLen = 2)
    assert(tight.map(_._1).toSet == Set("a", "b", "c", "d"))
  }

  test("segmentation == brute-force enumeration on random words and vocabularies") {
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 300) {
      val word = (1 to (1 + rnd.nextInt(9))).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      val vocab = (1 to 8).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }.toSet ++ Set("a", "b", "c")
      val dp = Wordpiece.segmentWord(word, vocab, maxTokenLen = 4)
      val brute = bruteSegment(word, vocab, maxLen = 4)
      assert(dp == brute, s"word=$word vocab=$vocab dp=$dp brute=$brute")
      assert(dp.mkString("") == word) // lossless
    }
  }

  test("unseen characters fall back to themselves; known substrings still merge") {
    val vocab = Set("a", "b", "ab", "abc")
    assert(Wordpiece.segmentWord("abzab", vocab, 4) == Seq("ab", "z", "ab"))
    assert(Wordpiece.segmentWord("", vocab, 4) == Nil)
  }

  test("DP never uses more tokens than greedy longest-match") {
    // the canonical greedy failure: greedy takes 'abc' then letters;
    // optimal is 'ab' + 'cdef'
    val vocab = Set("a", "b", "c", "d", "e", "f", "abc", "ab", "cdef")
    val dp = Wordpiece.segmentWord("abcdef", vocab, 4)
    assert(dp == Seq("ab", "cdef"))
    def greedy(word: String): Int = {
      var pos = 0; var n = 0
      while (pos < word.length) {
        var l = math.min(4, word.length - pos)
        while (l > 1 && !vocab.contains(word.substring(pos, pos + l))) l -= 1
        pos += l; n += 1
      }
      n
    }
    assert(dp.length < greedy("abcdef"))
  }

  test("vocab store round-trips: stored segmentation == live segmentation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("wpstore").toString
    val vocab = Wordpiece.learnVocab(docs, col("text"), vocabSize = 60, maxTokenLen = 4)
    Wordpiece.buildVocabStore(vocab, s"$tmp/store", maxTokenLen = 4)
    val (loaded, maxLen) = Wordpiece.loadVocabStore(spark, s"$tmp/store")
    assert(maxLen == 4)
    assert(loaded.toSet == vocab.select("token").collect().map(_.getString(0)).toSet)
    val vocabSeq = vocab.select("token").collect().map(_.getString(0)).toSeq
    val live = Wordpiece.segmentWords(docs, col("text"), vocabSeq, 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val stored = Wordpiece.segmentWordsStored(docs, col("text"), s"$tmp/store")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored == live && stored.nonEmpty)
  }

  test("applyWordpiece round-trips the corpus and matches per-word segmentation") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val vocab = Wordpiece.learnVocab(docs, col("text"), vocabSize = 60, maxTokenLen = 4)
    val vocabSeq = vocab.select("token").collect().map(_.getString(0)).toSeq
    val applied = Wordpiece.applyWordpiece(docs, col("text"), vocabSeq, 4, "wp")
      .select(col("text"), col("wp")).collect()
    applied.foreach { r =>
      val text = r.getString(0)
      val toks = r.getSeq[String](1)
      // concatenating tokens reproduces the text with spaces removed
      assert(toks.mkString("") == text.replace(" ", ""))
    }
    // distributed learnVocab == local selection over the same histogram
    val local = Wordpiece.learnVocabLocal(
      docs.select(explode(split(col("text"), " ")).as("w")).filter($"w" =!= "")
        .groupBy($"w").count().orderBy($"count".desc, $"w").limit(10000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq, 60, 4)
    assert(vocab.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (t, c) => (-c, t) } == local)
  }
}
