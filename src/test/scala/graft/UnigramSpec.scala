package graft

import graft.operators.{Unigram, Wordpiece}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Unigram-LM tokenizer: brute-force enumeration differential over random
 * vocab/word draws (the Viterbi min-cost must equal exhaustive search),
 * the objective-difference case vs WordPiece (frequent pieces beat fewer
 * tokens), the integer-log2 kernel's exactness, store round-trip through
 * the SHARED WordPiece vocab store, and the q20 SQL fragment lockstep.
 */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("q20 integer log2: exact on powers of two, monotone, interpolates linearly") {
    for (b <- 0 to 42)
      assert(Unigram.q20(1L << b) == b.toLong << 20, s"2^$b")
    // linear mantissa: q(3) halfway between q(2) and q(4)
    assert(Unigram.q20(3) == (1L << 20) + (1L << 19))
    val vals = Seq(1L, 2L, 3L, 5L, 7L, 100L, 1023L, 1024L, 1025L, (1L << 42) + 17)
    vals.sliding(2).foreach { case Seq(a, b) =>
      assert(Unigram.q20(a) < Unigram.q20(b), s"monotone $a $b")
    }
    intercept[IllegalArgumentException](Unigram.q20(0))
    intercept[IllegalArgumentException](Unigram.q20(1L << 43))
  }

  /** All segmentations of `word` into tokens of length <= maxLen. */
  private def allSegs(word: String, maxLen: Int): Seq[Seq[String]] =
    if (word.isEmpty) Seq(Nil)
    else (1 to math.min(maxLen, word.length)).flatMap { l =>
      allSegs(word.drop(l), maxLen).map(word.take(l) +: _)
    }

  test("Viterbi cost == brute-force enumeration over random vocab/word draws") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (trial <- 1 to 40) {
      val maxLen = 2 + rnd.nextInt(3)
      // random vocab: all single chars (coverage) + random multi-char tokens
      val multi = (1 to 6).map { _ =>
        val l = 2 + rnd.nextInt(maxLen - 1)
        (1 to l).map(_ => alphabet(rnd.nextInt(3))).mkString
      }.distinct.filter(_.length <= maxLen)
      val vocab = (alphabet.map(_.toString) ++ multi)
        .map(t => t -> (1L + rnd.nextInt(1000))).toSeq
      val (w, oov) = Unigram.weights(vocab)
      val word = (1 to (1 + rnd.nextInt(9))).map(_ => alphabet(rnd.nextInt(3))).mkString
      val got = Unigram.segmentWord(word, w, maxLen, oov)
      assert(got.mkString("") == word, s"trial $trial: must reconstruct $word")
      val gotCost = got.map(t => w.getOrElse(t, oov)).sum
      val best = allSegs(word, maxLen)
        .filter(_.forall(t => t.length == 1 || w.contains(t)))
        .map(_.map(t => w.getOrElse(t, oov)).sum).min
      assert(gotCost == best, s"trial $trial word=$word vocab=$vocab")
    }
  }

  test("objective difference: frequent pieces beat the fewest-token segmentation") {
    val vocab = Seq("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L,
      "ab" -> 100L, "cd" -> 100L, "abcd" -> 1L)
    val df = spark.createDataFrame(Seq((1L, "abcd"))).toDF("id", "text")
    val ug = Unigram.segmentWords(df, col("text"), vocab, maxTokenLen = 4)
      .select(col("seg"), col("n_tokens")).head()
    assert(ug.getString(0) == "ab cd" && ug.getLong(1) == 2L)
    // WordPiece on the same vocab takes the single 4-char token
    val wp = Wordpiece.segmentWords(df, col("text"), vocab.map(_._1), maxTokenLen = 4)
      .select(col("seg")).head().getString(0)
    assert(wp == "abcd")
  }

  test("OOV characters fall back to count-1 single-char tokens") {
    val vocab = Seq("a" -> 10L, "b" -> 10L, "ab" -> 5L)
    val df = spark.createDataFrame(Seq((1L, "axb "))).toDF("id", "text")
    val got = Unigram.applyUnigram(df, col("text"), vocab, maxTokenLen = 2)
      .select(col("ug_tokens")).head().getSeq[String](0)
    assert(got == Seq("a", "x", "b"))
  }

  test("stored mode == live mode through the shared WordPiece vocab store") {
    val vocabDf = Wordpiece.learnVocab(docs, col("text"), vocabSize = 60,
      maxTokenLen = 4)
    val vocab = vocabDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val dir = java.nio.file.Files.createTempDirectory("ugstore").toString
    Wordpiece.buildVocabStore(vocabDf, dir, maxTokenLen = 4)
    val live = Unigram.segmentWords(docs, col("text"), vocab, maxTokenLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val stored = Unigram.segmentWordsStored(docs, col("text"), dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(stored == live && stored.nonEmpty)
    // subwords concatenate back to the exact input
    val round = Unigram.applyUnigramStored(docs, col("text"), dir)
      .select(col("text"), concat_ws("", col("ug_tokens")).as("glued"))
      .filter(regexp_replace(col("text"), " ", "") =!= col("glued")).count()
    assert(round == 0)
  }

  /** Independent brute-force mirror of one hard-EM run: optimal
    * segmentation by exhaustive enumeration (min cost, then
    * lexicographically greatest part-length list — the forward walk's
    * longest-first tie-break), usage recount, prune. */
  private def bruteEm(hist: Seq[(String, Long)], vocabSize: Int, maxLen: Int,
                      rounds: Int, seedMult: Int): Seq[(String, Long)] = {
    import scala.math.Ordering.Implicits._
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    for ((word, c) <- hist; s <- 0 until word.length;
         l <- 1 to math.min(maxLen, word.length - s)) {
      val t = word.substring(s, s + l)
      counts.update(t, counts.getOrElse(t, 0L) + c)
    }
    val (chars, multi) = counts.toSeq.partition(_._1.length == 1)
    val charsSorted = chars.sortBy { case (t, c) => (-c, t) }
    val slots = math.max(vocabSize - charsSorted.length, 0)
    var vocab: Seq[(String, Long)] =
      charsSorted ++ multi.sortBy { case (t, c) => (-c, t) }.take(slots * seedMult)
    for (_ <- 1 to rounds) {
      val (w, oov) = Unigram.weights(vocab)
      def canonical(word: String): Seq[String] = {
        val legal = allSegs(word, maxLen)
          .filter(_.forall(t => t.length == 1 || w.contains(t)))
        val costs = legal.map(s => s.map(t => w.getOrElse(t, oov)).sum)
        val min = costs.min
        legal.zip(costs).filter(_._2 == min).map(_._1)
          .maxBy(s => s.map(_.length).toList)
      }
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      hist.foreach { case (word, c) =>
        canonical(word).foreach(t => usage.update(t, usage.getOrElse(t, 0L) + c))
      }
      vocab = charsSorted.map { case (t, _) =>
          (t, math.max(usage.getOrElse(t, 0L), 1L)) } ++
        usage.toSeq.filter(_._1.length > 1)
          .sortBy { case (t, c) => (-c, t) }.take(slots)
    }
    vocab.sortBy { case (t, c) => (-c, t) }
  }

  test("hard-EM learnVocab == brute-force EM over random histogram draws") {
    val rnd = new scala.util.Random(23)
    val alphabet = "abc"
    for (trial <- 1 to 25) {
      val maxLen = 2 + rnd.nextInt(3)
      val hist = (1 to (3 + rnd.nextInt(6))).map { _ =>
        val w = (1 to (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(3))).mkString
        w -> (1L + rnd.nextInt(50))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
        .sortBy { case (w, c) => (-c, w) }
      val vocabSize = 3 + rnd.nextInt(5)
      val rounds = 1 + rnd.nextInt(3)
      val got = Unigram.learnVocabLocal(hist, vocabSize, maxLen, rounds,
        seedMultiplier = 2)
      val want = bruteEm(hist, vocabSize, maxLen, rounds, seedMult = 2)
      assert(got == want, s"trial $trial hist=$hist vs=$vocabSize r=$rounds ml=$maxLen")
    }
  }

  test("EM vocabulary: coverage, bounds, determinism, and corpus-cost non-regression") {
    val vocabDf = Unigram.learnVocab(docs, col("text"), vocabSize = 60,
      maxTokenLen = 4, rounds = 3, seedMultiplier = 2)
    val vocab = vocabDf.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").groupBy("w").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // coverage: every corpus character is a vocab token; counts >= 1
    val vset = vocab.map(_._1).toSet
    assert(words.flatMap(_._1.toCharArray.map(_.toString)).toSet.subsetOf(vset))
    assert(vocab.forall(_._2 >= 1L))
    assert(vocab.count(_._1.length > 1) <= 60 - vocab.count(_._1.length == 1))
    // determinism: a second run is identical
    val again = Unigram.learnVocab(docs, col("text"), vocabSize = 60,
      maxTokenLen = 4, rounds = 3, seedMultiplier = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again == vocab)
    // the EM-chosen vocab segments the corpus at no worse total cost than
    // the frequency-selected (WordPiece-counted) vocab of the same size
    def corpusCost(v: Seq[(String, Long)]): Long = {
      val (w, oov) = Unigram.weights(v)
      words.map { case (wd, c) =>
        Unigram.segmentWord(wd, w, 4, oov).map(t => w.getOrElse(t, oov)).sum * c
      }.sum
    }
    val freqVocab = Wordpiece.learnVocab(docs, col("text"), vocabSize = 60,
      maxTokenLen = 4).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(corpusCost(vocab) <= corpusCost(freqVocab),
      "EM training must not worsen the unigram corpus cost vs frequency selection")
    // store round-trip: EM vocab through the shared WordPiece store
    val dir = java.nio.file.Files.createTempDirectory("ugem").toString
    Wordpiece.buildVocabStore(vocabDf, dir, maxTokenLen = 4)
    val live = Unigram.segmentWords(docs, col("text"), vocab, maxTokenLen = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val stored = Unigram.segmentWordsStored(docs, col("text"), dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(stored == live && stored.nonEmpty)
  }

  test("oracle SQL text stays in lockstep with the Scala kernel shape") {
    val sql = Unigram.segmentOracleSql("documents", "text", 60)
    for (frag <- Seq("length(bin(", "*1048576", "list_prepend",
        "d2.tg + vw.w = d1.tg", "ORDER BY vw.l DESC LIMIT 1"))
      assert(sql.contains(frag), s"oracle SQL lost fragment: $frag")
  }
}
