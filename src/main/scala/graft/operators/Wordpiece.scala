package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}

import scala.collection.mutable

/**
 * WordPiece-style subword tokenizer — the vocabulary-lookup twin of the
 * merge-based [[Bpe]] tokenizer (Schuster & Nakajima 2012; the BERT
 * tokenizer family): a bounded subword vocabulary is selected by
 * frequency, and application segments each word into the FEWEST vocab
 * tokens (optimal MaxMatch — the DP-exact version of WordPiece's greedy
 * longest-match inference, which can over-fragment).
 *
 * Scale shape, identical to [[Bpe]]'s: training never touches the corpus
 * stream — one distributed `explode → groupBy → TakeOrdered(vocabWords)`
 * pass reduces any corpus to the bounded word histogram, and vocabulary
 * selection runs on the driver over that histogram (vocabWords ×
 * word_len × maxTokenLen candidate substrings — megabytes at the 10k
 * default). Application is a pure per-row map with a broadcast vocab set
 * and a per-thread memo, so repeated words segment once per executor
 * thread.
 *
 * Determinism contract (what the driver oracles replay end-to-end —
 * every quantity is an integer, so the replay is hash-exact):
 *  - candidate substring counts are word-histogram-weighted and count
 *    OVERLAPPING occurrences (every (start, len) window);
 *  - every single character of a histogram word enters the vocabulary
 *    (coverage guarantee — no word is unsegmentable), then multi-char
 *    candidates fill the remaining vocabSize slots by (count DESC,
 *    token ASC);
 *  - segmentation minimizes token count; among minimal segmentations
 *    the walk takes the LONGEST optimal-consistent token at each
 *    position (unique — equal lengths at one position are the same
 *    substring), so the token sequence is a total function of
 *    (word, vocab);
 *  - characters outside the vocabulary (possible only for words unseen
 *    at training time) fall back to themselves as single-char tokens.
 */
object Wordpiece {

  /** Driver-side vocabulary selection over the bounded word histogram.
    * Returns (token, weightedCount) — all single chars first-class, then
    * multi-char substrings by (count DESC, token ASC) up to vocabSize. */
  private[graft] def learnVocabLocal(hist: Seq[(String, Long)], vocabSize: Int,
                                     maxTokenLen: Int): Seq[(String, Long)] = {
    val counts = mutable.HashMap.empty[String, Long]
    hist.foreach { case (word, c) =>
      var s = 0
      while (s < word.length) {
        var l = 1
        val lim = math.min(maxTokenLen, word.length - s)
        while (l <= lim) {
          val t = word.substring(s, s + l)
          counts.update(t, counts.getOrElse(t, 0L) + c)
          l += 1
        }
        s += 1
      }
    }
    val (chars, multi) = counts.toSeq.partition(_._1.length == 1)
    val charsSorted = chars.sortBy { case (t, c) => (-c, t) }
    val slots = math.max(vocabSize - charsSorted.length, 0)
    val multiCut = multi.sortBy { case (t, c) => (-c, t) }.take(slots)
    (charsSorted ++ multiCut).sortBy { case (t, c) => (-c, t) }
  }

  /** Learn a subword vocabulary: distributed word histogram (the [[Bpe]]
    * kernel — `TakeOrdered(vocabWords)` by (count DESC, word)), then the
    * driver-side substring selection above. Output: (token, cnt). */
  def learnVocab(df: DataFrame, textCol: Column, vocabSize: Int,
                 maxTokenLen: Int = 4, vocabWords: Int = 10000): DataFrame = {
    require(vocabSize > 0, s"learnVocab: vocabSize must be positive, got $vocabSize")
    require(maxTokenLen > 0, s"learnVocab: maxTokenLen must be positive, got $maxTokenLen")
    val vocab = learnVocabLocal(Bpe.wordHistogram(df, textCol, vocabWords),
      vocabSize, maxTokenLen)
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("token", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType, false)))
    spark.createDataFrame(
      java.util.Arrays.asList(vocab.map { case (t, c) => Row(t, c) }: _*), schema)
  }

  /** Optimal-MaxMatch segmentation of one word: cost-to-go DP (fewest
    * tokens; an out-of-vocab character costs 1 as itself), then a
    * forward walk taking the longest token consistent with optimality at
    * each position. Total function of (word, vocab) — no randomness. */
  private[graft] def segmentWord(word: String, vocab: Set[String],
                                 maxTokenLen: Int): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val togo = new Array[Int](n + 1)
    var pos = n - 1
    while (pos >= 0) {
      var best = togo(pos + 1) + 1 // single-char fallback always legal
      var l = 2
      val lim = math.min(maxTokenLen, n - pos)
      while (l <= lim) {
        if (togo(pos + l) + 1 < best && vocab.contains(word.substring(pos, pos + l)))
          best = togo(pos + l) + 1
        l += 1
      }
      togo(pos) = best
      pos -= 1
    }
    val out = mutable.ArrayBuffer.empty[String]
    pos = 0
    while (pos < n) {
      var l = math.min(maxTokenLen, n - pos)
      while (l > 1 && !(togo(pos + l) == togo(pos) - 1 &&
               vocab.contains(word.substring(pos, pos + l))))
        l -= 1
      out += word.substring(pos, pos + l)
      pos += l
    }
    out.toSeq
  }

  /** Per-executor-thread segmentation memo (the [[Bpe]] pattern): a
    * JVM-static, bounded — cleared past 1<<16 entries. */
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

  /** Apply a learned vocabulary: adds `outName` (array&lt;string&gt; of
    * subword tokens, words flattened in order). Broadcast vocab set +
    * memoized per-word DP — a pure map, no shuffle. */
  def applyWordpiece(df: DataFrame, textCol: Column, vocab: Seq[String],
                     maxTokenLen: Int = 4,
                     outName: String = "wp_tokens"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val seg = udf { (text: String) =>
      if (text == null) null
      else {
        val memo = Memo.get()
        text.split(" ", -1).iterator.flatMap { w =>
          memo.getOrElseUpdate((bc.id, w), segmentWord(w, bc.value, maxTokenLen))
        }.toSeq
      }
    }
    df.withColumn(outName, seg(textCol))
  }

  /** [[applyWordpiece]] taking the [[learnVocab]] output frame (collects
    * the vocabulary — bounded by vocabSize — back to the driver). */
  def applyWordpiece(df: DataFrame, textCol: Column, vocab: DataFrame,
                     maxTokenLen: Int, outName: String): DataFrame =
    applyWordpiece(df, textCol,
      vocab.select(col("token")).collect().map(_.getString(0)).toSeq,
      maxTokenLen, outName)

  /** Segment every DISTINCT corpus word under a learned vocabulary:
    * (word, seg — space-joined tokens, n_tokens). The distinct-word
    * table is the unit of real tokenizer work (applications memoize per
    * word), and it is what the driver oracle's recursive-CTE DP replays
    * token-for-token. Distributed: distinct shuffles the (small) word
    * set, segmentation is the same broadcast-vocab map as apply. */
  def segmentWords(df: DataFrame, textCol: Column, vocab: Seq[String],
                   maxTokenLen: Int = 4): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val seg = udf { (w: String) => segmentWord(w, bc.value, maxTokenLen).mkString(" ") }
    df.select(explode(split(textCol, " ")).as("word"))
      .filter(col("word") =!= "").distinct()
      .withColumn("seg", seg(col("word")))
      .withColumn("n_tokens", (size(split(col("seg"), " "))).cast("long"))
  }

  /** Persist a learned vocabulary under `path` (small parquet + a
    * maxTokenLen sidecar so applications can't silently segment under a
    * different window than training selected; house staged-marker
    * contract). */
  def buildVocabStore(vocab: DataFrame, path: String, maxTokenLen: Int): Unit = {
    val spark = vocab.sparkSession
    graft.sources.Sidecar.invalidateMarker(spark, path)
    vocab.orderBy(col("cnt").desc, col("token")).coalesce(1)
      .write.mode("overwrite").parquet(path + "/vocab")
    graft.sources.Sidecar.writeText(spark, path + "/_graft_wp_params",
      maxTokenLen.toString)
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Read a [[buildVocabStore]] back: (tokens, maxTokenLen). Bounded by
    * vocabSize — a driver-side artifact by design. */
  def loadVocabStore(spark: org.apache.spark.sql.SparkSession,
                     path: String): (Seq[String], Int) = {
    val maxLen = graft.sources.Sidecar
      .readText(spark, path + "/_graft_wp_params").trim.toInt
    (spark.read.parquet(path + "/vocab").select(col("token"))
      .collect().map(_.getString(0)).toSeq, maxLen)
  }

  /** [[applyWordpiece]] against a FROZEN [[buildVocabStore]] — the
    * serving semantic: tokens stay identical across batches until the
    * store is retrained. */
  def applyWordpieceStored(df: DataFrame, textCol: Column, path: String,
                           outName: String = "wp_tokens"): DataFrame = {
    val (vocab, maxLen) = loadVocabStore(df.sparkSession, path)
    applyWordpiece(df, textCol, vocab, maxLen, outName)
  }

  /** [[segmentWords]] against a frozen store. */
  def segmentWordsStored(df: DataFrame, textCol: Column, path: String): DataFrame = {
    val (vocab, maxLen) = loadVocabStore(df.sparkSession, path)
    segmentWords(df, textCol, vocab, maxLen)
  }

  // ---- DuckDB oracle generators (the [[Bpe]] convention: the oracle is
  // a pure SQL replay of the documented contract over the same parquet) ----

  /** Shared CTE block: word histogram → weighted overlapping substring
    * counts → chars ∪ top multi-char → vocab (+ lengths) + the distinct
    * corpus word table. */
  private[graft] def vocabCtes(table: String, textExpr: String, vocabSize: Int,
                               maxTokenLen: Int, vocabWords: Int): String =
    s"""w AS (SELECT unnest(string_split($textExpr, ' ')) AS word FROM $table),
       |h AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w WHERE word <> ''
       |      GROUP BY word ORDER BY c DESC, word LIMIT $vocabWords),
       |subs AS (SELECT substr(word, s, l) AS token, CAST(sum(c) AS BIGINT) AS cnt
       |         FROM h, LATERAL (SELECT unnest(range(1, len(word)+1)) AS s),
       |              LATERAL (SELECT unnest(range(1, least($maxTokenLen, len(word)-s+1)+1)) AS l)
       |         GROUP BY 1),
       |chars AS (SELECT token, cnt FROM subs WHERE len(token) = 1),
       |nch AS (SELECT count(*) AS n FROM chars),
       |multi AS (SELECT token, cnt FROM subs WHERE len(token) > 1
       |          ORDER BY cnt DESC, token LIMIT (SELECT greatest($vocabSize - n, 0) FROM nch)),
       |vocab AS (SELECT token, cnt FROM chars UNION ALL SELECT token, cnt FROM multi),
       |vt AS (SELECT token, len(token) AS l FROM vocab),
       |dw AS (SELECT DISTINCT word FROM w WHERE word <> '')""".stripMargin

  /** Replay of [[learnVocab]]: (token, cnt) by (cnt DESC, token). */
  def vocabOracleSql(table: String, textExpr: String, vocabSize: Int,
                     maxTokenLen: Int = 4, vocabWords: Int = 10000): String =
    s"""WITH ${vocabCtes(table, textExpr, vocabSize, maxTokenLen, vocabWords)}
       |SELECT token, cnt FROM vocab ORDER BY cnt DESC, token""".stripMargin

  /** Cost-to-go DP as recursive CTEs: `rev` BFS-reaches positions
    * backward from each word's end through vocab tokens (layer = one
    * token, so the first arrival depth is the minimum — `togo` folds the
    * min), exactly [[segmentWord]]'s DP. The single-char fallback needs
    * no branch: every corpus character is in the vocabulary by the
    * coverage guarantee. */
  private def dpCtes: String =
    s"""rev(word, pos, cost) AS (
       |  SELECT word, len(word), 0 FROM dw
       |  UNION
       |  SELECT r.word, r.pos - vt.l, r.cost + 1
       |  FROM rev r JOIN vt ON r.pos - vt.l >= 0 AND substr(r.word, r.pos - vt.l + 1, vt.l) = vt.token
       |),
       |togo AS (SELECT word, pos, min(cost) AS best FROM rev GROUP BY 1, 2)""".stripMargin

  /** Replay of [[segmentWords]]: the DP above plus the deterministic
    * forward walk — at each position the LONGEST token whose cost-to-go
    * drops by one (LATERAL ORDER BY l DESC LIMIT 1). */
  def segmentOracleSql(table: String, textExpr: String, vocabSize: Int,
                       maxTokenLen: Int = 4, vocabWords: Int = 10000): String =
    s"""WITH RECURSIVE ${vocabCtes(table, textExpr, vocabSize, maxTokenLen, vocabWords)},
       |$dpCtes,
       |walk(word, pos, acc) AS (
       |  SELECT word, 0, CAST('' AS VARCHAR) FROM dw
       |  UNION ALL
       |  SELECT wk.word, wk.pos + s.l,
       |         CASE WHEN wk.acc = '' THEN s.token ELSE wk.acc || ' ' || s.token END
       |  FROM walk wk, LATERAL (
       |    SELECT vt.token, vt.l
       |    FROM vt JOIN togo d1 ON d1.word = wk.word AND d1.pos = wk.pos
       |        JOIN togo d2 ON d2.word = wk.word AND d2.pos = wk.pos + vt.l
       |    WHERE substr(wk.word, wk.pos + 1, vt.l) = vt.token AND d2.best = d1.best - 1
       |    ORDER BY vt.l DESC LIMIT 1
       |  ) s
       |  WHERE wk.pos < len(wk.word)
       |)
       |SELECT wk.word, wk.acc AS seg, tg.best AS n_tokens
       |FROM walk wk JOIN togo tg ON tg.word = wk.word AND tg.pos = 0
       |WHERE wk.pos = len(wk.word) ORDER BY wk.word""".stripMargin

  /** Replay of per-document token totals under [[applyWordpiece]]: the
    * same DP gives each distinct word's minimal count; every document
    * sums its word stream (duplicates included) through one equi-join. */
  def tokenCountOracleSql(table: String, idExpr: String, textExpr: String,
                          vocabSize: Int, maxTokenLen: Int = 4,
                          vocabWords: Int = 10000): String =
    s"""WITH RECURSIVE ${vocabCtes(table, textExpr, vocabSize, maxTokenLen, vocabWords)},
       |$dpCtes,
       |wc AS (SELECT word, best AS n FROM togo WHERE pos = 0),
       |docw AS (SELECT $idExpr AS doc_id, unnest(string_split($textExpr, ' ')) AS word FROM $table)
       |SELECT d.doc_id, CAST(sum(COALESCE(wc.n, 0)) AS BIGINT) AS n_tokens
       |FROM docw d LEFT JOIN wc ON wc.word = d.word
       |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
}
