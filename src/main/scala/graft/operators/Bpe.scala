package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import scala.collection.mutable

/**
 * Byte-pair-encoding tokenizer training and application — the step that
 * turns a cleaned corpus into model tokens (Sennrich et al. 2016, the
 * GPT-2 tokenizer recipe).
 *
 * Scale shape, the standard one: BPE never trains on the corpus stream —
 * it trains on the WORD HISTOGRAM. One distributed `explode → groupBy →
 * TakeOrdered(vocabWords)` pass reduces any corpus (100 TB included) to a
 * bounded `(word, count)` table; the merge loop then runs on the driver
 * over that histogram (`vocabWords × avg_word_len` symbols — kilobytes).
 * Application ([[applyBpe]]) is a pure per-row map with a broadcast merge
 * table and a per-thread memo (word → subwords), so repeated words — the
 * overwhelming majority at corpus scale — segment once per executor
 * thread, not once per occurrence.
 *
 * Determinism contract (what the spec differential and the driver oracle
 * replay): histogram ties break by word; the best pair each round is the
 * (count, then lexicographic (left, right)) maximum; merges apply
 * left-to-right non-overlapping. No randomness anywhere.
 */
object Bpe {

  /** End-of-word marker appended to every word's symbol sequence (the
    * Sennrich `</w>`): lets the tokenizer distinguish "low" the word from
    * "low" the prefix of "lowest". */
  val EndOfWord = "</w>"

  /** Word → initial symbol sequence: one symbol per char, then the marker. */
  private[graft] def initSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ EndOfWord

  // ---- byte-level mode (the GPT-2 byte encoder) ----

  /** The GPT-2 byte↔unicode table (Radford et al. 2019, encoder.py's
    * `bytes_to_unicode` — public): the 188 "printable" bytes
    * (33–126, 161–172, 174–255) map to their own code points; the other
    * 68 (controls, space, DEL, soft hyphen …) map to 256+n in ascending
    * byte order — hence space → 'Ġ' (U+0120) and newline → 'Ċ'. Byte-level
    * BPE runs the SAME merge machinery over these one-char symbols, so
    * ANY UTF-8 text tokenizes losslessly with a 256-symbol base alphabet:
    * no unknown-token escape hatch needed, the real-pipeline property. */
  private[graft] lazy val byteEncoder: Array[String] = {
    val out = new Array[String](256)
    var n = 0
    for (b <- 0 until 256) {
      val self = (b >= 33 && b <= 126) || (b >= 161 && b <= 172) ||
                 (b >= 174 && b <= 255)
      if (self) out(b) = b.toChar.toString
      else { out(b) = (256 + n).toChar.toString; n += 1 }
    }
    out
  }

  private[graft] lazy val byteDecoder: Map[Char, Int] =
    byteEncoder.zipWithIndex.map { case (s, b) => s.charAt(0) -> b }.toMap

  /** Word → one symbol per UTF-8 BYTE through [[byteEncoder]], then the
    * marker — [[initSymbols]]' byte-level twin. A non-ASCII char becomes
    * several byte symbols (é → Ã©), which merges can later re-fuse. */
  private[graft] def initSymbolsBytes(word: String): Vector[String] = {
    val bytes = word.getBytes("UTF-8")
    bytes.iterator.map(b => byteEncoder(b & 0xff)).toVector :+ EndOfWord
  }

  private def initFor(byteLevel: Boolean): String => Vector[String] =
    if (byteLevel) initSymbolsBytes else initSymbols

  /** Inverse of byte-level segmentation: map every symbol char back
    * through [[byteDecoder]] (markers stripped) and UTF-8-decode — the
    * lossless round trip byte-level BPE exists for. Same marker contract
    * as the char mode: text containing the literal '</w>' is out of
    * contract. */
  def decodeByteTokens(tokens: Seq[String]): String = {
    val bos = new java.io.ByteArrayOutputStream()
    tokens.foreach { t =>
      val body =
        if (t == EndOfWord) ""
        else if (t.endsWith(EndOfWord)) t.dropRight(EndOfWord.length)
        else t
      body.foreach(c => bos.write(byteDecoder(c)))
    }
    new String(bos.toByteArray, "UTF-8")
  }

  /** Distributed word histogram: top `vocabWords` by (count desc, word) —
    * a map-side-combined groupBy then TakeOrdered, never a full sort.
    * Empty words (consecutive spaces) are excluded: their symbol sequence
    * is the bare marker with zero pairs, so they could only waste a
    * histogram slot. */
  private[graft] def wordHistogram(df: DataFrame, textCol: Column,
                                   vocabWords: Int): Seq[(String, Long)] = {
    df.select(explode(TextAnalysis.tokens(textCol)).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w")).limit(vocabWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** The driver-side merge loop over a word histogram. Each round counts
    * every adjacent symbol pair (weighted by word count, one count per
    * POSITION — "aaaa" contributes (a,a) three times), takes the
    * deterministic maximum, and rewrites the histogram. Stops early when
    * no pair remains. */
  private[graft] def learnMergesLocal(hist: Seq[(String, Long)],
                                      numMerges: Int,
                                      init: String => Vector[String] = initSymbols)
      : Seq[(String, String)] = {
    var words: Array[(Vector[String], Long)] =
      hist.map { case (w, c) => (init(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (counts.isEmpty) round = numMerges
      else {
        val best = counts.iterator.reduce { (a, b) =>
          val cmp = a._2.compareTo(b._2)
          val better =
            if (cmp != 0) cmp > 0
            else {
              val l = a._1._1.compareTo(b._1._1)
              if (l != 0) l < 0 else a._1._2 < b._1._2
            }
          if (better) a else b
        }._1
        merges += best
        words = words.map { case (syms, c) => (mergePair(syms, best), c) }
        round += 1
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping rewrite of `pair` in a symbol
    * sequence ("aaaa" under (a,a) → "(aa)(aa)"). */
  private[graft] def mergePair(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += syms(i) + syms(i + 1); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * Learn `numMerges` BPE merges from the corpus. Returns the ordered merge
   * table as a DataFrame (merge_rank, left, right) — the training artifact
   * a pipeline persists next to its corpus snapshot.
   *
   * `vocabWords` bounds the driver state: training sees the top-N word
   * histogram (standard practice — tail hapaxes shift pair counts by at
   * most their own frequency). EAGER: the histogram pass runs at call time,
   * same driver/executor split as DBSCAN.cluster and Skyline.
   */
  def learnBpe(df: DataFrame, textCol: Column, numMerges: Int,
               vocabWords: Int = 10000, byteLevel: Boolean = false): DataFrame = {
    require(numMerges > 0, s"learnBpe: numMerges must be positive, got $numMerges")
    require(vocabWords > 0, s"learnBpe: vocabWords must be positive, got $vocabWords")
    val merges = learnMergesLocal(wordHistogram(df, textCol, vocabWords),
      numMerges, initFor(byteLevel))
    val spark = df.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("merge_rank", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("left", org.apache.spark.sql.types.StringType, false),
      org.apache.spark.sql.types.StructField("right", org.apache.spark.sql.types.StringType, false)))
    spark.createDataFrame(
      java.util.Arrays.asList(merges.zipWithIndex.map { case ((l, r), i) =>
        Row(i.toLong, l, r) }: _*), schema)
  }

  /** Segment one word under a rank table (lower rank = earlier merge =
    * higher priority): repeatedly merge the best-ranked adjacent pair —
    * the GPT-2 application rule, deterministic for any input word
    * including words never seen in training. */
  private[graft] def segmentWord(word: String, rank: Map[(String, String), Int],
                                 init: String => Vector[String] = initSymbols)
      : Seq[String] = {
    var syms = init(word)
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var best: (String, String) = null
      var i = 0
      while (i < syms.length - 1) {
        val r = rank.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (syms(i), syms(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else syms = mergePair(syms, best)
    }
    syms
  }

  /** Per-executor-thread segmentation memo. A JVM-static (never
    * serialized); bounded — cleared when it outgrows 1<<16 entries so a
    * high-cardinality corpus can't grow executor memory unboundedly. */
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

  /**
   * Apply a learned merge table: adds `outName` (array&lt;string&gt; of
   * subword tokens, words flattened in order). Broadcast rank map + memoized
   * per-word segmentation — a pure map, no shuffle; prunes/pushes down
   * like any projection.
   */
  def applyBpe(df: DataFrame, textCol: Column, merges: Seq[(String, String)],
               outName: String = "bpe_tokens",
               byteLevel: Boolean = false): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rank)
    val init = initFor(byteLevel)
    val seg = udf { (text: String) =>
      if (text == null) null
      else {
        val memo = Memo.get()
        text.split(" ", -1).iterator.flatMap { w =>
          memo.getOrElseUpdate((bc.id, w), segmentWord(w, bc.value, init))
        }.toSeq
      }
    }
    df.withColumn(outName, seg(textCol))
  }

  /** [[applyBpe]] taking the [[learnBpe]] output frame (collects the
    * merge table — bounded by numMerges — back to the driver). */
  def applyBpe(df: DataFrame, textCol: Column, merges: DataFrame): DataFrame =
    applyBpe(df, textCol,
      merges.orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq)

  /** [[applyBpe]] taking the [[learnBpe]] output frame, byte-level. */
  def applyBpeByteLevel(df: DataFrame, textCol: Column, merges: DataFrame,
                        outName: String = "bpe_tokens"): DataFrame =
    applyBpe(df, textCol,
      merges.orderBy(col("merge_rank")).collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq,
      outName, byteLevel = true)

  /** DuckDB replay of the FIRST merge decision (the argmax pair of the
    * initial char-symbol histogram) — the one round SQL can express
    * without iterating; the loop itself is spec-verified by differential.
    * Output matches `learnBpe(df, textCol, 1, vocabWords)`.
    *
    * Empty words are filtered on BOTH sides (see [[wordHistogram]]):
    * DuckDB's `string_split('', '')` is `['']`, which would fabricate an
    * ('', marker) pair Scala's zero-pair `initSymbols("")` never counts —
    * with the shared filter the two engines agree on any corpus. */
  def firstMergeOracleSql(table: String, textExpr: String, vocabWords: Int): String =
    s"""WITH w AS (SELECT unnest(string_split($textExpr, ' ')) AS word FROM $table),
       |h AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w WHERE word <> ''
       |      GROUP BY word ORDER BY c DESC, word LIMIT $vocabWords),
       |sym AS (SELECT list_append(string_split(word, ''), '$EndOfWord') AS syms, c FROM h),
       |p AS (SELECT syms[i] AS l, syms[i+1] AS r, sum(c) AS cnt
       |      FROM sym, unnest(range(1, len(syms))) AS g(i) GROUP BY 1, 2)
       |SELECT CAST(0 AS BIGINT) AS merge_rank, l AS "left", r AS "right"
       |FROM p ORDER BY cnt DESC, l, r LIMIT 1""".stripMargin

  /**
   * DuckDB replay of the FULL merge loop — an independent recursive-CTE
   * implementation of [[learnMergesLocal]], making the whole `numMerges`
   * table hash-checkable (not just round 1).
   *
   * Shape: the histogram travels as one row holding a LIST of (word, count)
   * structs, each word a chr(31)-delimited symbol string; one recursion
   * step = one merge round. The argmax pair comes from a correlated
   * subquery (unnest → adjacent pairs → weighted counts → ORDER BY cnt
   * DESC, l, r LIMIT 1 — the same (count, left, right) tie-break as the
   * Scala loop). The rewrite is a `list_reduce` where matching (l, r)
   * appends WITHOUT the delimiter, fusing the last symbol into l||r —
   * exactly greedy left-to-right non-overlapping: a just-fused symbol
   * l||r can never equal l again (r is non-empty), so the fold never
   * re-merges through a fresh fusion, matching [[mergePair]]'s i += 2.
   * chr(31) (ASCII unit separator) cannot collide with symbols built from
   * single text characters and '$EndOfWord'.
   */
  def mergeTableOracleSql(table: String, textExpr: String, vocabWords: Int,
                          numMerges: Int): String =
    s"""WITH RECURSIVE
       |${learnCtes(table, textExpr, vocabWords, numMerges)}
       |SELECT merge_rank, l AS "left", r AS "right" FROM mt ORDER BY merge_rank""".stripMargin

  /** The learning loop's CTE block (shared by [[mergeTableOracleSql]] and
    * [[segmentStoreOracleSql]]), ending in `mt(merge_rank, l, r)` and the
    * distinct corpus word table `dw`. */
  private def learnCtes(table: String, textExpr: String, vocabWords: Int,
                        numMerges: Int): String =
    s"""w AS (SELECT unnest(string_split($textExpr, ' ')) AS word FROM $table),
       |h AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM w WHERE word <> ''
       |      GROUP BY word ORDER BY c DESC, word LIMIT $vocabWords),
       |init AS (SELECT list(struct_pack(
       |           w := array_to_string(list_append(string_split(word, ''), '$EndOfWord'), chr(31)),
       |           c := c)) AS vocab FROM h),
       |st(iter, merges, vocab) AS (
       |  SELECT 0, CAST([] AS STRUCT(l VARCHAR, r VARCHAR)[]), vocab FROM init
       |  UNION ALL
       |  SELECT iter + 1, list_append(merges, best),
       |         list_transform(vocab, x -> struct_pack(
       |           w := list_reduce(string_split(x.w, chr(31)),
       |                  (acc, s) -> CASE WHEN s = best.r AND
       |                        list_last(string_split(acc, chr(31))) = best.l
       |                      THEN acc || s ELSE acc || chr(31) || s END),
       |           c := x.c))
       |  FROM (
       |    SELECT iter, merges, vocab,
       |      (SELECT struct_pack(l := l, r := r) FROM (
       |         SELECT syms[i] AS l, syms[i+1] AS r, sum(c) AS cnt
       |         FROM (SELECT string_split(e.w, chr(31)) AS syms, e.c AS c
       |               FROM unnest(st.vocab) AS t(e))
       |            , unnest(range(1, len(syms))) AS g(i)
       |         GROUP BY 1, 2)
       |       ORDER BY cnt DESC, l, r LIMIT 1) AS best
       |    FROM st WHERE iter < $numMerges
       |  ) WHERE best IS NOT NULL
       |),
       |mt AS (SELECT CAST(g.i - 1 AS BIGINT) AS merge_rank,
       |       merges[g.i].l AS l, merges[g.i].r AS r
       |FROM (SELECT merges FROM st ORDER BY iter DESC LIMIT 1) t,
       |     unnest(range(1, len(merges) + 1)) AS g(i)),
       |dw AS (SELECT DISTINCT word FROM w WHERE word <> '')""".stripMargin

  /**
   * DuckDB replay of the APPLICATION rule ([[segmentWord]]) over every
   * distinct corpus word: the learning CTEs above produce the merge
   * table, then a second recursive CTE runs the GPT-2 inference loop —
   * each step finds the lowest-rank merge present among a word's
   * adjacent symbol pairs (LATERAL ORDER BY merge_rank LIMIT 1) and
   * rewrites all its occurrences with the same `list_reduce` fold the
   * learning replay uses ([[mergePair]]'s left-to-right non-overlap);
   * a word finishes when no merge applies. Output (word, seg —
   * space-joined symbols incl. the '$EndOfWord' marker), matching
   * `segmentWords(df, textCol, merges)`.
   */
  def segmentStoreOracleSql(table: String, textExpr: String, vocabWords: Int,
                            numMerges: Int): String =
    s"""WITH RECURSIVE
       |${learnCtes(table, textExpr, vocabWords, numMerges)},
       |ap(word, s, done) AS (
       |  SELECT word, array_to_string(list_append(string_split(word, ''), '$EndOfWord'), chr(31)), false FROM dw
       |  UNION ALL
       |  SELECT a.word,
       |    CASE WHEN b.l IS NULL THEN a.s ELSE
       |      list_reduce(string_split(a.s, chr(31)),
       |        (acc, x) -> CASE WHEN x = b.r AND list_last(string_split(acc, chr(31))) = b.l
       |                    THEN acc || x ELSE acc || chr(31) || x END) END,
       |    b.l IS NULL
       |  FROM ap a LEFT JOIN LATERAL (
       |    SELECT m.l, m.r FROM mt m
       |    JOIN (SELECT syms[i] AS pl, syms[i+1] AS pr
       |          FROM (SELECT string_split(a.s, chr(31)) AS syms), unnest(range(1, len(syms))) g(i)) p
       |      ON p.pl = m.l AND p.pr = m.r
       |    ORDER BY m.merge_rank LIMIT 1
       |  ) b ON true
       |  WHERE NOT a.done
       |)
       |SELECT word, replace(s, chr(31), ' ') AS seg FROM ap WHERE done ORDER BY word""".stripMargin

  /** Segment every DISTINCT corpus word under a merge table: (word, seg —
    * space-joined subword symbols). The distinct-word table is the unit
    * of real tokenizer work (apply memoizes per word), and what
    * [[segmentStoreOracleSql]] replays symbol-for-symbol. */
  def segmentWords(df: DataFrame, textCol: Column,
                   merges: Seq[(String, String)],
                   byteLevel: Boolean = false): DataFrame = {
    val rank = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(rank)
    val init = initFor(byteLevel)
    val seg = udf { (w: String) => segmentWord(w, bc.value, init).mkString(" ") }
    df.select(explode(TextAnalysis.tokens(textCol)).as("word"))
      .filter(col("word") =!= "").distinct()
      .withColumn("seg", seg(col("word")))
  }

  /** Persist a learned merge table under `path` (one small parquet + the
    * house staged-marker contract) — the training artifact a pipeline
    * freezes next to its corpus snapshot so every later ingest tokenizes
    * under the SAME vocabulary. */
  def buildMergeStore(merges: DataFrame, path: String,
                      byteLevel: Boolean = false): Unit = {
    val spark = merges.sparkSession
    graft.sources.Sidecar.invalidateMarker(spark, path)
    merges.orderBy(col("merge_rank")).coalesce(1)
      .write.mode("overwrite").parquet(path + "/merges")
    // freeze the symbol mode: applying a byte-level table char-level (or
    // vice versa) silently produces a different segmentation
    graft.sources.Sidecar.writeText(spark, path + "/_graft_bpe_params",
      if (byteLevel) "byte" else "char")
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /** Read a [[buildMergeStore]] merge table back as the ordered pair list
    * (bounded by numMerges — a driver-side artifact by design). */
  def loadMergeStore(spark: org.apache.spark.sql.SparkSession,
                     path: String): Seq[(String, String)] =
    spark.read.parquet(path + "/merges")
      .select(col("merge_rank"), col("left"), col("right"))
      .orderBy(col("merge_rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq

  /** [[applyBpe]] against a FROZEN [[buildMergeStore]] — the serving
    * semantic: tokens stay identical across batches until the store is
    * retrained. */
  /** The symbol mode frozen in a merge store ("char" for pre-param
    * stores — every store predating byte-level was char-level). */
  def storedBpeMode(spark: org.apache.spark.sql.SparkSession,
                    path: String): String =
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_bpe_params"))
      graft.sources.Sidecar.readText(spark, path + "/_graft_bpe_params").trim
    else "char"

  def applyBpeStored(df: DataFrame, textCol: Column, path: String,
                     outName: String = "bpe_tokens"): DataFrame =
    applyBpe(df, textCol, loadMergeStore(df.sparkSession, path), outName,
      byteLevel = storedBpeMode(df.sparkSession, path) == "byte")
}
