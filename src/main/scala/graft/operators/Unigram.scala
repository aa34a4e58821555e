package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

import scala.collection.mutable

/**
 * Unigram-LM subword tokenizer — the maximum-likelihood member of the
 * tokenizer family (Kudo 2018; the SentencePiece inference shape), next
 * to merge-based [[Bpe]] and fewest-token [[Wordpiece]]: application
 * segments each word into the vocab tokens of MAXIMUM unigram
 * likelihood, Π p(tokenᵢ), via Viterbi DP — frequent long pieces win
 * over many rare fragments even when a shorter segmentation exists,
 * which is exactly where it differs from WordPiece's fewest-token rule.
 *
 * It shares the [[Wordpiece]] vocabulary end-to-end (the same
 * `learnVocab` frequency-selected (token, cnt) table and the same
 * persisted vocab store serve BOTH inference modes), so the new
 * machinery is only the objective:
 *
 *  - token probability p(t) = cnt(t) / T with T = Σ cnt over the vocab;
 *  - maximizing Σ log p(tᵢ) = minimizing Σ [q(T) − q(cnt(tᵢ))] where
 *    q is the INTEGER log2: `q(c) = (B−1)·2^20 + ⌊(c − 2^(B−1))·2^20 /
 *    2^(B−1)⌋`, B = bitlength(c) — log2 with linear mantissa
 *    interpolation, monotone in c, exact in int64 while counts stay
 *    below 2^43 (~8.8·10^12 occurrences), and computable identically in
 *    any engine exposing integer division and binary digits (`bin()` in
 *    both Spark and DuckDB). Every path cost is therefore an integer and
 *    the driver oracle replays segmentations token-for-token;
 *  - ties: minimum cost, then the LONGEST cost-consistent token at each
 *    position of the forward walk (unique — equal lengths at one
 *    position are the same substring), so the output is a total
 *    function of (word, vocab);
 *  - characters outside the vocabulary (possible only for words unseen
 *    at training) cost a count-1 token: w = q(T) − q(1) = q(T).
 *
 * Scale shape = [[Wordpiece]]'s: training is the bounded word-histogram
 * kernel, application is a pure per-row map with a broadcast weight map
 * and a per-thread memo — no shuffle, no corpus rescans.
 */
object Unigram {

  private[graft] val Inf: Long = Long.MaxValue / 4

  /** Integer log2 with linear mantissa interpolation, scaled 2^20 (see
    * the object doc). Exact while `c < 2^43`. */
  private[graft] def q20(c: Long): Long = {
    require(c >= 1, s"q20: count must be >= 1, got $c")
    require(c < (1L << 43), s"q20: count $c >= 2^43 would overflow the e20 mantissa")
    val b = 64 - java.lang.Long.numberOfLeadingZeros(c)
    val base = 1L << (b - 1)
    ((b - 1).toLong << 20) + ((c - base) << 20) / base
  }

  /** Per-token path weights from a learned (token, cnt) vocabulary:
    * w(t) = q(T) − q(cnt(t)) ≥ 0, plus the OOV single-char weight q(T).
    * Bounded by vocabSize — a driver-side artifact by design. */
  private[graft] def weights(vocab: Seq[(String, Long)]): (Map[String, Long], Long) = {
    require(vocab.nonEmpty, "unigram: empty vocabulary")
    val total = vocab.iterator.map(_._2).sum
    val qT = q20(total)
    (vocab.iterator.map { case (t, c) => t -> (qT - q20(c)) }.toMap, qT)
  }

  /** Viterbi segmentation of one word: cost-to-go DP over the integer
    * weights (an out-of-vocab character costs `oov` as itself), then a
    * forward walk taking the longest cost-consistent token at each
    * position. Total function of (word, weights) — no randomness. */
  private[graft] def segmentWord(word: String, w: collection.Map[String, Long],
                                 maxTokenLen: Int, oov: Long): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val togo = new Array[Long](n + 1)
    var pos = n - 1
    while (pos >= 0) {
      var best = togo(pos + 1) +
        w.getOrElse(word.substring(pos, pos + 1), oov) // 1-char always legal
      var l = 2
      val lim = math.min(maxTokenLen, n - pos)
      while (l <= lim) {
        w.get(word.substring(pos, pos + l)) match {
          case Some(wt) =>
            val cand = togo(pos + l) + wt
            if (cand < best) best = cand
          case None =>
        }
        l += 1
      }
      togo(pos) = best
      pos -= 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    pos = 0
    while (pos < n) {
      var l = math.min(maxTokenLen, n - pos)
      var taken = false
      while (!taken) {
        val t = word.substring(pos, pos + l)
        val wt =
          if (l == 1) w.getOrElse(t, oov)
          else w.getOrElse(t, Inf)
        if (wt < Inf && togo(pos) == togo(pos + l) + wt) {
          out += t; pos += l; taken = true
        } else l -= 1 // terminates: l = 1 reproduces the DP's fallback arm
      }
    }
    out.toSeq
  }

  /** Per-executor-thread segmentation memo (the [[Bpe]] pattern). */
  private object Memo {
    // keyed by (broadcast id, word): two MODELS applied in one JVM must
    // never share cached segmentations (the broadcast id is unique per
    // broadcast value, so a new vocab always misses)
    val tl: ThreadLocal[mutable.HashMap[(Long, String), Seq[String]]] =
      ThreadLocal.withInitial(() => mutable.HashMap.empty[(Long, String), Seq[String]])
    def get(): mutable.HashMap[(Long, String), Seq[String]] = {
      val m = tl.get()
      if (m.size > (1 << 16)) m.clear()
      m
    }
  }

  /** Apply a learned (token, cnt) vocabulary under the unigram-LM
    * objective: adds `outName` (array&lt;string&gt; of subword tokens,
    * words flattened in order). Broadcast weights + memoized per-word
    * Viterbi — a pure map, no shuffle. */
  def applyUnigram(df: DataFrame, textCol: Column, vocab: Seq[(String, Long)],
                   maxTokenLen: Int = 4,
                   outName: String = "ug_tokens"): DataFrame = {
    val (w, oov) = weights(vocab)
    val bc = df.sparkSession.sparkContext.broadcast(w)
    val seg = udf { (text: String) =>
      if (text == null) null
      else {
        val memo = Memo.get()
        text.split(" ", -1).iterator.flatMap { wd =>
          memo.getOrElseUpdate((bc.id, wd), segmentWord(wd, bc.value, maxTokenLen, oov))
        }.toSeq
      }
    }
    df.withColumn(outName, seg(textCol))
  }

  /** [[applyUnigram]] taking the [[Wordpiece.learnVocab]] output frame. */
  def applyUnigram(df: DataFrame, textCol: Column, vocab: DataFrame,
                   maxTokenLen: Int, outName: String): DataFrame =
    applyUnigram(df, textCol,
      vocab.select(col("token"), col("cnt")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq,
      maxTokenLen, outName)

  /** Segment every DISTINCT corpus word under the unigram objective:
    * (word, seg — space-joined tokens, n_tokens, cost_q20 — the path's
    * total integer weight, the quantity the oracle's DP replays). */
  def segmentWords(df: DataFrame, textCol: Column, vocab: Seq[(String, Long)],
                   maxTokenLen: Int = 4): DataFrame = {
    val (w, oov) = weights(vocab)
    val bc = df.sparkSession.sparkContext.broadcast(w)
    val seg = udf { (wd: String) =>
      val toks = segmentWord(wd, bc.value, maxTokenLen, oov)
      val cost = toks.iterator.map(t => bc.value.getOrElse(t, oov)).sum
      (toks.mkString(" "), toks.length.toLong, cost)
    }
    df.select(explode(split(textCol, " ")).as("word"))
      .filter(col("word") =!= "").distinct()
      .withColumn("__ug", seg(col("word")))
      .select(col("word"), col("__ug._1").as("seg"),
        col("__ug._2").as("n_tokens"), col("__ug._3").as("cost_q20"))
  }

  /** [[applyUnigram]] against a FROZEN [[Wordpiece.buildVocabStore]] —
    * ONE persisted store serves both inference modes (the counts ride
    * along in the vocab table; WordPiece ignores them, unigram weights
    * by them). */
  def applyUnigramStored(df: DataFrame, textCol: Column, path: String,
                         outName: String = "ug_tokens"): DataFrame = {
    val (vocab, maxLen) = loadVocabCounts(df.sparkSession, path)
    applyUnigram(df, textCol, vocab, maxLen, outName)
  }

  /** [[segmentWords]] against a frozen store. */
  def segmentWordsStored(df: DataFrame, textCol: Column, path: String): DataFrame = {
    val (vocab, maxLen) = loadVocabCounts(df.sparkSession, path)
    segmentWords(df, textCol, vocab, maxLen)
  }

  /** Read a [[Wordpiece.buildVocabStore]] back WITH counts. */
  private def loadVocabCounts(spark: org.apache.spark.sql.SparkSession,
                              path: String): (Seq[(String, Long)], Int) = {
    val maxLen = graft.sources.Sidecar
      .readText(spark, path + "/_graft_wp_params").trim.toInt
    (spark.read.parquet(path + "/vocab").select(col("token"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq, maxLen)
  }

  // ---- DuckDB oracle generators ----

  /** The q20 integer log2 as a SQL fragment over `expr` (BIGINT >= 1):
    * kept NEXT to the Scala [[q20]] so the two can only drift visibly. */
  private def q20Sql(expr: String): String = {
    val b = s"(length(bin($expr)) - 1)"
    s"($b*1048576 + (($expr - (CAST(1 AS BIGINT) << $b))*1048576) // (CAST(1 AS BIGINT) << $b))"
  }

  /** Weight CTEs on top of [[Wordpiece]]'s vocab CTEs: total mass, q(T),
    * per-token weights. */
  private def weightCtes: String =
    s"""tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM vocab),
       |qt AS (SELECT ${q20Sql("t")} AS qv FROM tot),
       |vw AS (SELECT token, len(token) AS l,
       |              (SELECT qv FROM qt) - ${q20Sql("cnt")} AS w
       |       FROM vocab)""".stripMargin

  /** The Viterbi DP as a window-carrying recursive CTE: each iteration
    * computes togo(pos) = min over legal tokens of w + togo(pos+l) from
    * the carried [togo(pos+1) .. togo(pos+L)] window, then shifts the
    * window — a sequential right-to-left DP, one row per word per
    * iteration (iterations = word length). The coverage guarantee makes
    * the min always defined for corpus words. */
  private def dpCtes(maxTokenLen: Int): String = {
    val sentinel = "4611686018427387903"
    val init = (Seq("CAST(0 AS BIGINT)") ++
      Seq.fill(maxTokenLen - 1)(sentinel)).mkString("[", ", ", "]")
    s"""dp(word, pos, win) AS (
       |  SELECT word, CAST(len(word) AS INTEGER) - 1, $init FROM dw
       |  UNION ALL
       |  SELECT d.word, d.pos - 1, list_prepend(s.best, d.win[1:${maxTokenLen - 1}])
       |  FROM dp d, LATERAL (
       |    SELECT min(vw.w + d.win[vw.l]) AS best
       |    FROM vw
       |    WHERE vw.l <= len(d.word) - d.pos
       |      AND substr(d.word, d.pos + 1, vw.l) = vw.token
       |  ) s
       |  WHERE d.pos >= 0
       |),
       |tg AS (SELECT word, pos + 1 AS pos, win[1] AS tg FROM dp)""".stripMargin
  }

  /** Replay of [[segmentWords]]: vocab selection ([[Wordpiece]]'s CTEs),
    * integer weights, the windowed Viterbi DP, and the deterministic
    * forward walk — at each position the LONGEST token whose weight plus
    * downstream cost-to-go is exactly the current cost-to-go. */
  def segmentOracleSql(table: String, textExpr: String, vocabSize: Int,
                       maxTokenLen: Int = 4, vocabWords: Int = 10000): String =
    s"""WITH RECURSIVE ${Wordpiece.vocabCtes(table, textExpr, vocabSize, maxTokenLen, vocabWords)},
       |$weightCtes,
       |${dpCtes(maxTokenLen)},
       |walk(word, pos, acc, ntok) AS (
       |  SELECT word, 0, CAST('' AS VARCHAR), CAST(0 AS BIGINT) FROM dw
       |  UNION ALL
       |  SELECT wk.word, wk.pos + s.l,
       |         CASE WHEN wk.acc = '' THEN s.token ELSE wk.acc || ' ' || s.token END,
       |         wk.ntok + 1
       |  FROM walk wk, LATERAL (
       |    SELECT vw.token, vw.l
       |    FROM vw JOIN tg d1 ON d1.word = wk.word AND d1.pos = wk.pos
       |        JOIN tg d2 ON d2.word = wk.word AND d2.pos = wk.pos + vw.l
       |    WHERE substr(wk.word, wk.pos + 1, vw.l) = vw.token
       |      AND d2.tg + vw.w = d1.tg
       |    ORDER BY vw.l DESC LIMIT 1
       |  ) s
       |  WHERE wk.pos < len(wk.word)
       |)
       |SELECT wk.word, wk.acc AS seg, wk.ntok AS n_tokens, tg.tg AS cost_q20
       |FROM walk wk JOIN tg ON tg.word = wk.word AND tg.pos = 0
       |WHERE wk.pos = len(wk.word) ORDER BY wk.word""".stripMargin

  /** Replay of per-document token totals under [[applyUnigram]]: the DP
    * gives each distinct word's optimal token count via the walk; every
    * document sums its word stream through one equi-join. */
  def tokenCountOracleSql(table: String, idExpr: String, textExpr: String,
                          vocabSize: Int, maxTokenLen: Int = 4,
                          vocabWords: Int = 10000): String =
    s"""WITH RECURSIVE ${Wordpiece.vocabCtes(table, textExpr, vocabSize, maxTokenLen, vocabWords)},
       |$weightCtes,
       |${dpCtes(maxTokenLen)},
       |walk(word, pos, ntok) AS (
       |  SELECT word, 0, CAST(0 AS BIGINT) FROM dw
       |  UNION ALL
       |  SELECT wk.word, wk.pos + s.l, wk.ntok + 1
       |  FROM walk wk, LATERAL (
       |    SELECT vw.l
       |    FROM vw JOIN tg d1 ON d1.word = wk.word AND d1.pos = wk.pos
       |        JOIN tg d2 ON d2.word = wk.word AND d2.pos = wk.pos + vw.l
       |    WHERE substr(wk.word, wk.pos + 1, vw.l) = vw.token
       |      AND d2.tg + vw.w = d1.tg
       |    ORDER BY vw.l DESC LIMIT 1
       |  ) s
       |  WHERE wk.pos < len(wk.word)
       |),
       |wc AS (SELECT word, ntok AS n FROM walk WHERE pos = len(word)),
       |docw AS (SELECT $idExpr AS doc_id, unnest(string_split($textExpr, ' ')) AS word FROM $table)
       |SELECT d.doc_id, CAST(sum(COALESCE(wc.n, 0)) AS BIGINT) AS n_tokens
       |FROM docw d LEFT JOIN wc ON wc.word = d.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
}
