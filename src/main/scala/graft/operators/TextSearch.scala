package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Full-text relevance retrieval over a document corpus — BM25 scoring and
 * top-k search. The retrieval primitive of a training-data pipeline:
 * quality-filter by query relevance, mine hard negatives, or audit what a
 * corpus contains for a topic.
 *
 * Two scoring modes:
 *
 *  - [[bm25TopK]] — classic Okapi BM25 (Lucene's always-positive
 *    `ln(1 + (N-df+0.5)/(df+0.5))` idf), double-valued. The variant users
 *    expect; transcendental, so NOT cross-engine bit-exact.
 *  - [[bm25TopKExact]] — the same tf saturation curve with the odds-form
 *    idf `(N-df+0.5)/(df+0.5)` (the quantity whose log classic BM25
 *    takes), both factors floored to fixed-point integers. Every value is
 *    a pure integer function of (tf, df, dl, N, Σdl), so an external SQL
 *    engine replaying the documented formula matches bit-for-bit — this is
 *    the driver-oracle mode, same engineering as the e6 rational columns
 *    in [[TextAnalysis]].
 *
 * Scale shape (both modes): one map-side-combined aggregate pass collects
 * the corpus statistics (N, Σdl, one df per query term — a single row,
 * broadcast back), one streaming scan scores documents with per-row
 * `filter(tokens, _ == term)` counts (no explode, no shuffle of the
 * corpus), and the top-k is orderBy+limit = TakeOrderedAndProject. Nothing
 * materializes more than k rows per partition; both passes prune to the
 * (id, text) columns.
 */
object TextSearch {

  /** Floor fixed-point division `floor(a·10^s / b)` carried out in
    * DECIMAL(38,0) so it stays exact past the 2^53 double range and the
    * int64 product range — `a·10^s` for a trillion-token corpus overflows
    * a long, a decimal never (38 digits). `a >= 0`, `b > 0`. */
  private def fixed(a: Column, b: Column, s: Int): Column = {
    val scale = math.pow(10, s).toLong
    val A = a.cast(DecimalType(38, 0)) * scale
    val B = b.cast(DecimalType(38, 0))
    ((A - pmod(A, B)) / B).cast("long")
  }

  /** Okapi tf saturation factor as an e4 fixed-point integer, k1 = 1.2 and
    * b = 0.75 (the classic defaults) folded into integer coefficients:
    *
    *   tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
    *     = 22·tf·S / (10·tf·S + 3·S + 9·dl·N)        with avgdl = S/N
    *
    * (multiply through by 10·S; 22 = 10·2.2, 3 = 10·1.2·0.25,
    * 9 = 10·1.2·0.75). */
  private def tfFactorE4(tf: Column, dl: Column, n: Column, s: Column): Column =
    fixed(lit(22L) * tf * s, lit(10L) * tf * s + lit(3L) * s + lit(9L) * dl * n, 4)

  /** Odds-form idf as an e4 fixed-point integer:
    * `floor(1e4·(2N - 2df + 1)/(2df + 1))` — the argument of classic
    * BM25's log, cleared of halves. Monotone in df like the log form;
    * floors to 0 only when df ≈ N (everywhere-terms contribute nothing,
    * the same regime where Lucene's idf ≈ 0). */
  private def idfE4(df: Column, n: Column): Column =
    fixed(lit(2L) * n - lit(2L) * df + 1L, lit(2L) * df + 1L, 4)

  /**
   * Exact-integer BM25 top-k: documents ranked by
   * `score_e8 = Σ_t idf_e4(t) · tfFactor_e4(t, doc)` over the query
   * `terms`, ties to the lower id, documents matching no term excluded.
   * Output: (doc_id, score_e8), score descending.
   *
   * Every factor is an integer (documented in [[idfE4]]/[[tfFactorE4]]),
   * so the sum is order-independent and any SQL engine replaying the
   * formula hash-matches. int64-safe while `2N·10^4 · 2.2·10^4 < 2^63`
   * (N beyond ~2·10^10 documents: wider than any published corpus).
   */
  def bm25TopKExact(docs: DataFrame, idCol: Column, textCol: Column,
                    terms: Seq[String], k: Int): DataFrame = {
    val scored = scoredBase(docs, idCol, textCol, terms, k)
    val termScores = terms.indices.map { i =>
      idfE4(col(s"__df_$i"), col("__n")) *
        tfFactorE4(col(s"__tf_$i"), col("__dl"), col("__n"), col("__s"))
    }
    scored.withColumn("score_e8", termScores.reduce(_ + _))
      .filter(col("score_e8") > 0)
      .orderBy(col("score_e8").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_e8"))
  }

  /**
   * Classic BM25 top-k (Lucene idf `ln(1 + (N-df+0.5)/(df+0.5))`,
   * double score). Same plan shape as [[bm25TopKExact]]; transcendental,
   * so verified by spec differential against the exact mode's ranking
   * rather than by the SQL oracle.
   */
  def bm25TopK(docs: DataFrame, idCol: Column, textCol: Column,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val scored = scoredBase(docs, idCol, textCol, terms, k)
    val avgdl = col("__s").cast("double") / col("__n")
    val termScores = terms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n") - col(s"__df_$i") + lit(0.5)) / (col(s"__df_$i") + lit(0.5)))
      idf * (tf * (k1 + 1)) / (tf + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / avgdl))
    }
    scored.withColumn("score", termScores.reduce(_ + _))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score"))
  }

  /** Shared skeleton: tokenized base with per-term tf columns, cross-joined
    * with the broadcast one-row corpus statistics (N, Σdl, per-term df). */
  private def scoredBase(docs: DataFrame, idCol: Column, textCol: Column,
                         terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    require(terms.distinct.length == terms.length,
      s"bm25: duplicate query terms ${terms.diff(terms.distinct).distinct.mkString(", ")} " +
      "would double-count — deduplicate the query")
    require(k > 0, s"bm25: k must be positive, got $k")
    val reserved = Seq("__ws", "__dl", "__n", "__s") ++
      terms.indices.flatMap(i => Seq(s"__df_$i", s"__tf_$i"))
    require(!docs.columns.exists(c => reserved.exists(c.equalsIgnoreCase)),
      "bm25: input must not contain __ws/__dl/__n/__s/__df_i/__tf_i columns")
    val base = docs
      .select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
    val statAggs =
      Seq(count(lit(1)).cast("long").as("__n"), sum(col("__dl")).as("__s")) ++
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__ws"), t), 1L).otherwise(0L)).as(s"__df_$i")
      }
    val stats = base.agg(statAggs.head, statAggs.tail: _*)
    val withTf = terms.zipWithIndex.foldLeft(base) { case (acc, (t, i)) =>
      acc.withColumn(s"__tf_$i",
        size(filter(col("__ws"), w => w === lit(t))).cast("long"))
    }
    withTf.crossJoin(broadcast(stats))
  }

  /** The exact-integer score as ONE stateless column over frozen corpus
    * statistics (N, Σdl, per-term df passed as columns — literals for the
    * streaming/serving path, agg outputs for batch callers). Pure
    * projection: no shuffle, no state, so it composes onto `readStream`
    * unchanged — the ingest-time relevance gate. */
  private[graft] def frozenScoreExpr(textCol: Column, terms: Seq[String],
                                     n: Column, s: Column, dfs: Seq[Column]): Column = {
    val ws = TextAnalysis.tokens(textCol)
    val dl = size(ws).cast("long")
    terms.indices.map { i =>
      val tf = size(filter(ws, w => w === lit(terms(i)))).cast("long")
      idfE4(dfs(i), n) * tfFactorE4(tf, dl, n, s)
    }.reduce(_ + _)
  }

  /** Frozen (N, Σdl, per-term df) read from a [[buildTextIndex]] store —
    * the statistics a serving tier scores against between index rebuilds.
    * A term absent from the index has df = 0 (matches the live mode). */
  private[graft] def frozenStats(spark: org.apache.spark.sql.SparkSession,
                                 path: String, terms: Seq[String]): (Long, Long, Seq[Long]) = {
    val (nL, sL) = storedStats(spark, path)
    // per-segment df rows sum under the disjoint-doc contract (flat store:
    // one row per term, the sum is the identity)
    val dict = spark.read.parquet(path + "/dict")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (nL, sL, terms.map(dict.getOrElse(_, 0L)))
  }

  // ---- persisted inverted index ----
  // The scale contract of retrieval is index-once / query-many: at 100 TB
  // a query must read the POSTINGS OF ITS TERMS, not the corpus. The
  // store is (term, doc_id, tf, dl) postings range-partitioned and sorted
  // by term — a query's term set reaches the reader as a pushed IN filter
  // so non-matching row groups are skipped — plus a (term, df) dictionary
  // the same way and a one-line (N, Σdl) stats sidecar. Same layout idea
  // and rebuild-crash contract as IndexStore / the IVF store.

  /** Build the inverted index under `path`: postings + term dictionary +
    * corpus-stats sidecar, `_SUCCESS` written last. */
  def buildTextIndex(docs: DataFrame, path: String, idCol: Column,
                     textCol: Column): Unit = {
    val spark = docs.sparkSession
    graft.sources.Sidecar.invalidateMarker(spark, path)
    // a flat rebuild over a previously-segmented path starts clean:
    // stale stats segments or tombstones must not shadow the fresh corpus
    // (postings/dict are wiped by the overwrite writes below)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq("/segstats", "/tombstones").foreach { d =>
      val p = new org.apache.hadoop.fs.Path(path + d)
      if (fs.exists(p)) fs.delete(p, true)
    }
    val base = docs
      .select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
    // one row per (term, doc): tf counted by the groupBy, dl carried along
    // (denormalized — one long per posting buys the query a join-free scan),
    // plus the sorted 1-based POSITION list — the Lucene positional
    // postings that make exact phrase queries index-answerable
    base.select(col("doc_id"), col("__dl").as("dl"),
        posexplode(col("__ws")).as(Seq("__p0", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("__p0") + 1)).as("pos"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(path + "/postings")
    // dictionary: docs-per-term (postings are distinct per (term, doc))
    spark.read.parquet(path + "/postings")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(path + "/dict")
    // coalesce: an EMPTY corpus sums to NULL — a legal (if degenerate)
    // build that must produce a store serving zero rows, not a crash
    val stats = base.agg(count(lit(1)).cast("long"),
      coalesce(sum(col("__dl")), lit(0L))).head()
    graft.sources.Sidecar.writeText(spark, path + "/_graft_text_stats",
      s"${stats.getLong(0)} ${stats.getLong(1)}")
    graft.sources.Sidecar.markComplete(spark, path)
  }

  // ---- incremental (segmented) growth ----
  // The Lucene segment shape: an index a pipeline keeps feeding cannot
  // afford a corpus-wide rebuild per arrival. Each [[appendTextBatch]]
  // lands as its own `batch_id=` partition of postings plus per-segment
  // dictionary and stats tables; the query folds segments at read time —
  // df and (N, Σdl) are pure sums because every doc_id lives in exactly
  // ONE segment — so serving through [[bm25TopKExactIndexed]] is
  // row-identical to a one-pass [[buildTextIndex]] over the accumulated
  // corpus, and no append ever rescans prior history.

  /**
   * Append one document batch to the segmented index at `path` as segment
   * `batchId`: term-sorted postings, a per-segment (term, df) dictionary,
   * and a one-row (n_docs, sum_dl) stats segment, each overwriting only
   * its own `batch_id=` partition (a replayed batch is idempotent).
   *
   * CONTRACT: doc ids are disjoint across batches — each document is
   * ingested exactly once, so summing per-segment df/stats at query time
   * equals the one-pass corpus statistics. Refuses a [[buildTextIndex]]
   * flat store loudly: its corpus-wide stats sidecar cannot absorb
   * appends.
   */
  def appendTextBatch(docs: DataFrame, idCol: Column, textCol: Column,
                      path: String, batchId: Long): Unit = {
    val spark = docs.sparkSession
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_text_stats"),
      s"appendTextBatch: $path holds a buildTextIndex flat store whose " +
      "corpus-wide stats sidecar cannot absorb appends — rebuild it " +
      "segmented (appendTextBatch from an empty path) or keep it flat")
    val base = docs
      .select(idCol.as("doc_id"), TextAnalysis.tokens(textCol).as("__ws"))
      .withColumn("__dl", size(col("__ws")).cast("long"))
      .localCheckpoint()
    base.select(col("doc_id"), col("__dl").as("dl"),
        posexplode(col("__ws")).as(Seq("__p0", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("__p0") + 1)).as("pos"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/postings/batch_id=$batchId")
    spark.read.parquet(s"$path/postings/batch_id=$batchId")
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/dict/batch_id=$batchId")
    base.agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("__dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/segstats/batch_id=$batchId")
    releaseCheckpoint(base)
  }

  /** Drop a localCheckpoint's cached blocks (same helper as Dedup's). */
  private def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** The store's tombstoned doc ids, if any deletion has happened.
    * `excludeSeg` drops one segment's own tombstones — a replaying
    * deletion must not anti-join against the tombstones IT wrote last
    * time, or the replay sees an empty victim set and overwrites its
    * negative segments with empty data (silently reverting the
    * takedown). Serving and compaction pass None (all tombstones). */
  private def tombstoneTable(spark: org.apache.spark.sql.SparkSession,
                             path: String,
                             excludeSeg: Option[Long] = None): Option[DataFrame] =
    if (graft.sources.Sidecar.exists(spark, path + "/tombstones")) {
      val all = spark.read.parquet(path + "/tombstones")
      val kept = excludeSeg match {
        case Some(s) => all.filter(col("batch_id") =!= s)
        case None => all
      }
      Some(kept.select(col("doc_id")).distinct())
    } else None

  /**
   * Forget documents from a segmented index WITHOUT a rebuild — the
   * takedown / right-to-be-forgotten shape. Deletion appends, it never
   * rewrites history: the ids land in a `tombstones/batch_id=` segment
   * (serving anti-joins postings against them) and the deleted docs'
   * statistics land as NEGATIVE dictionary and stats segments, so the
   * existing read-time folds cancel their contributions exactly — a
   * grown-then-forgotten store serves bit-identically to an index built
   * over the remaining corpus. Delete segments live in the reserved
   * negative batch-id range (`-batchId - 1`), so they never collide with
   * append segments, and a replayed delete overwrites only its own
   * partitions (idempotent).
   *
   * Ids already tombstoned or absent from the store contribute nothing
   * (re-deletion and stray ids are no-ops). CONTRACT: a deleted id must
   * not be re-ingested later — ids are exactly-once across the store's
   * lifetime, the same contract appends already carry.
   */
  def deleteFromTextIndex(ids: DataFrame, idCol: Column, path: String,
                          batchId: Long): Unit = {
    val spark = ids.sparkSession
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_text_stats"),
      s"deleteFromTextIndex: $path holds a buildTextIndex flat store — " +
      "takedown-by-append needs the segmented layout; rebuild it with " +
      "appendTextBatch (or rebuild flat without the deleted docs)")
    require(batchId >= 0, s"deleteFromTextIndex: batchId must be >= 0, got $batchId")
    val segId = -batchId - 1
    val victims0 = ids.select(idCol.cast("long").as("doc_id")).distinct()
    // Anti-join OTHER segments' tombstones only (ids they already
    // cancelled must not be double-counted), but NOT this segId's own:
    // a crash-replayed delete (Structured Streaming re-delivering a
    // completed foreachBatch) must recompute and rewrite the SAME
    // negative segments, not an empty set — the overwrite below is then
    // the intended idempotent no-op.
    val victims = (tombstoneTable(spark, path, excludeSeg = Some(segId)) match {
      case Some(t) => victims0.join(t, Seq("doc_id"), "left_anti")
      case None => victims0
    }).localCheckpoint()
    // the victims' posting rows — an id-keyed equi-join, never a scan of
    // the corpus text (the store IS the only copy of their statistics)
    val posted = spark.read.parquet(path + "/postings")
      .join(victims, Seq("doc_id"), "left_semi")
      .select(col("term"), col("doc_id"), col("dl"))
      .localCheckpoint()
    posted.groupBy(col("term")).agg((-count(lit(1))).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$path/dict/batch_id=$segId")
    posted.select(col("doc_id"), col("dl")).distinct()
      .agg((-count(lit(1))).cast("long").as("n_docs"),
        coalesce(-sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/segstats/batch_id=$segId")
    // tombstone only ids PRESENT in the store: a stray id must not
    // shadow a future document that happens to reuse it
    posted.select(col("doc_id")).distinct()
      .write.mode("overwrite").parquet(s"$path/tombstones/batch_id=$segId")
    releaseCheckpoint(posted)
    releaseCheckpoint(victims)
  }

  /**
   * Compact a segmented index: fold every segment and tombstone into ONE
   * fresh segment — the Lucene merge step that keeps read amplification
   * bounded after a long append/delete history. The new store is written
   * COMPLETELY to `<path>.tmp` first, then swapped in (the old store
   * stays intact until the staged copy is finished; if the final rename
   * fails the compacted store is intact at the staging path). Serving is
   * row-identical before and after — compaction changes layout, never
   * results — and the negative/tombstone history is gone. The folded
   * segment lands at the RESERVED compact id (Long.MinValue), so any
   * append id — including a fresh stream restarting at batch 0 — can
   * never overwrite the compacted history.
   */
  /** The reserved segment id compaction folds into — outside both the
    * append (>= 0) and deletion (-batchId - 1 for batchId >= 0, so
    * > Long.MinValue) id spaces. */
  private val CompactSegId: Long = Long.MinValue

  def compactTextIndex(spark: org.apache.spark.sql.SparkSession,
                       path: String): Unit = {
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_text_stats"),
      s"compactTextIndex: $path holds a buildTextIndex flat store — " +
      "already one segment, nothing to compact")
    val tmp = path + ".tmp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true) // stale staging
    val postings0 = spark.read.parquet(path + "/postings")
      .select(col("term"), col("doc_id"), col("dl"), col("tf"), col("pos"))
    val postings = (tombstoneTable(spark, path) match {
      case Some(t) => postings0.join(t, Seq("doc_id"), "left_anti")
      case None => postings0
    }).localCheckpoint() // three derivations below read it
    postings
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$tmp/postings/batch_id=$CompactSegId")
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .repartitionByRange(col("term")).sortWithinPartitions(col("term"))
      .write.mode("overwrite").parquet(s"$tmp/dict/batch_id=$CompactSegId")
    postings.select(col("doc_id"), col("dl")).distinct()
      .agg(count(lit(1)).cast("long").as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$tmp/segstats/batch_id=$CompactSegId")
    releaseCheckpoint(postings)
    graft.sources.Sidecar.markComplete(spark, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)),
      s"compactTextIndex: rename $tmp -> $path failed; the compacted " +
      s"store is intact at $tmp")
  }

  /** Corpus stats (N, Σdl) of a store, whichever layout built it: the
    * flat store's one-line sidecar, or the sum of a segmented store's
    * stats segments. */
  private def storedStats(spark: org.apache.spark.sql.SparkSession,
                          path: String): (Long, Long) =
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_text_stats")) {
      val Array(nStr, sStr) =
        graft.sources.Sidecar.readText(spark, path + "/_graft_text_stats").split(" ")
      (nStr.toLong, sStr.toLong)
    } else {
      val r = spark.read.parquet(path + "/segstats")
        .agg(coalesce(sum(col("n_docs")), lit(0L)),
          coalesce(sum(col("sum_dl")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

  /**
   * [[bm25TopKExact]] answered from a [[buildTextIndex]] store: reads the
   * query terms' postings only (pushed IN over the sorted term column) and
   * the matching dictionary rows; the corpus itself is never touched. Same
   * integer formula, same output, same oracle — N and Σdl come from the
   * stats sidecar, so scores are identical to the live mode's.
   *
   * Layout-agnostic: a segmented [[appendTextBatch]] store serves through
   * the SAME entry point — df and the stats fold across segments (exact
   * sums under the disjoint-doc contract), so a user's serving tier never
   * cares how the index was built.
   */
  def bm25TopKExactIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
                           terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "bm25: need at least one query term")
    require(terms.distinct.length == terms.length,
      "bm25: duplicate query terms would double-count — deduplicate the query")
    require(k > 0, s"bm25: k must be positive, got $k")
    val (nL, sL) = storedStats(spark, path)
    val n = lit(nL); val s = lit(sL)
    // dictionary rows for the query terms: ≤ |terms| rows per segment,
    // summed (flat store: one row per term, the sum is the identity),
    // broadcast back
    val dfTab = spark.read.parquet(path + "/dict")
      .filter(col("term").isin(terms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("__df"))
    val postings0 = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(terms: _*))
    // forgotten docs: postings anti-join the tombstones; their df and
    // (N, Σdl) contributions are already cancelled by the negative
    // segments the deletion appended
    val postings = tombstoneTable(spark, path) match {
      case Some(t) => postings0.join(t, Seq("doc_id"), "left_anti")
      case None => postings0
    }
    postings.join(broadcast(dfTab), "term")
      .withColumn("__ts", idfE4(col("__df"), n) * tfFactorE4(col("tf"), col("dl"), n, s))
      .groupBy(col("doc_id")).agg(sum(col("__ts")).as("score_e8"))
      .filter(col("score_e8") > 0)
      .orderBy(col("score_e8").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("score_e8"))
  }

  /**
   * Batched multi-query BM25 from the index — the retrieval-evaluation /
   * hard-negative-mining serving shape: score a whole BATCH of queries
   * in ONE pass over the union of their terms' postings, instead of one
   * index probe per query. `queries` carries (query_id, terms
   * array&lt;string&gt;); duplicate terms within a query are deduped (the
   * single-query mode refuses them — a batch API should not explode on
   * one malformed row). Output: (query_id, doc_id, score_e8), top-k per
   * query by (score DESC, doc_id), scores identical to
   * [[bm25TopKExactIndexed]] run per query.
   *
   * Scale shape: postings and dictionary are read ONCE filtered to the
   * batch's term union (pushed IN — the term list is collected to the
   * driver, bounded by the query batch: the q18 broadcast-small
   * contract); per-(query, doc) scores come from one map-side-combined
   * aggregate, and the top-k window partitions by query_id — never a
   * single-task window.
   */
  def bm25BatchExactIndexed(queries: DataFrame, queryId: Column,
                            termsCol: Column, path: String,
                            k: Int): DataFrame = {
    require(k > 0, s"bm25: k must be positive, got $k")
    val spark = queries.sparkSession
    // read twice (term-union collect + score join) — recomputation is
    // cheap at query-batch size, so no checkpoint to manage
    val qt = queries.select(queryId.as("query_id"), explode(termsCol).as("term"))
      .distinct()
    val allTerms = qt.select(col("term")).distinct()
      .collect().map(_.getString(0)).toSeq
    require(allTerms.nonEmpty, "bm25 batch: no query terms")
    val (nL, sL) = storedStats(spark, path)
    val n = lit(nL); val s = lit(sL)
    val dfTab = spark.read.parquet(path + "/dict")
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col("term")).agg(sum(col("df")).as("__df"))
    val postings0 = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(allTerms: _*))
    val postings = tombstoneTable(spark, path) match {
      case Some(t) => postings0.join(t, Seq("doc_id"), "left_anti")
      case None => postings0
    }
    val scored = postings.join(broadcast(dfTab), "term")
      .withColumn("__ts", idfE4(col("__df"), n) * tfFactorE4(col("tf"), col("dl"), n, s))
      .join(broadcast(qt), "term")
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__ts")).as("score_e8"))
      .filter(col("score_e8") > 0)
    val rn = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score_e8").desc, col("doc_id")))
    scored.withColumn("__rn", rn).filter(col("__rn") <= k)
      .select(col("query_id"), col("doc_id"), col("score_e8"))
  }

  // ---- phrase queries (positional postings) ----
  // The postings carry each term's sorted 1-based position list, so an
  // exact consecutive-token phrase is index-answerable (Lucene's
  // positional queries): fetch the phrase terms' postings (pushed IN —
  // the corpus is never read), then intersect position lists doc by doc,
  // slot j offset by j. Occurrences may overlap ("batch batch batch"
  // holds "batch batch" twice), matching the naive scan's semantics.

  private def phraseGuard(phrase: Seq[String]): Unit = {
    require(phrase.nonEmpty, "phrase: need at least one token")
    require(phrase.forall(t => t.nonEmpty && !t.contains(" ")),
      "phrase: tokens must be non-empty and single words")
  }

  /**
   * Per-document occurrence count of the exact consecutive token
   * sequence `phrase` — the LIVE mode, one pass over (id, text), no
   * index. Output: (doc_id, n_occurrences), matching docs only.
   */
  def phraseOccurrences(docs: DataFrame, idCol: Column, textCol: Column,
                        phrase: Seq[String]): DataFrame = {
    phraseGuard(phrase)
    val ws = TextAnalysis.tokens(textCol)
    val k = phrase.length
    // starts p = 1 .. n-k+1; every index p+j stays in bounds, so the
    // ANSI element_at can never fault
    val hits = when(size(ws) >= k,
      filter(sequence(lit(1), size(ws) - (k - 1)), p =>
        phrase.zipWithIndex.map { case (t, j) =>
          element_at(ws, p + j) === lit(t)
        }.reduce(_ && _))
    ).otherwise(array())
    docs.select(idCol.as("doc_id"), size(hits).cast("long").as("n_occurrences"))
      .filter(col("n_occurrences") > 0)
  }

  /**
   * [[phraseOccurrences]] answered from the positional postings of a
   * [[buildTextIndex]]/[[appendTextBatch]] store: reads ONLY the phrase
   * terms' postings (pushed IN over the term-sorted layout; tombstones
   * anti-joined), then per-doc position-list intersections — slot j's
   * list shifted by j — count the occurrences. Row-identical to the
   * live mode. Duplicate phrase tokens reuse the same posting rows.
   */
  def phraseSearchIndexed(spark: org.apache.spark.sql.SparkSession,
                          path: String, phrase: Seq[String]): DataFrame = {
    phraseGuard(phrase)
    val distinctTerms = phrase.distinct
    val postings0 = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(distinctTerms: _*))
      .select(col("term"), col("doc_id"), col("pos"))
    val postings = tombstoneTable(spark, path) match {
      case Some(t) => postings0.join(t, Seq("doc_id"), "left_anti")
      case None => postings0
    }
    var acc = postings.filter(col("term") === phrase.head)
      .select(col("doc_id"), col("pos").as("__acc"))
    for (j <- 1 until phrase.length) {
      val pj = postings.filter(col("term") === phrase(j))
        .select(col("doc_id"), col("pos").as(s"__pos_$j"))
      acc = acc.join(pj, Seq("doc_id"))
        .withColumn("__acc",
          filter(col("__acc"), p => array_contains(col(s"__pos_$j"), p + j)))
        .filter(size(col("__acc")) > 0)
        .select(col("doc_id"), col("__acc"))
    }
    acc.select(col("doc_id"), size(col("__acc")).cast("long").as("n_occurrences"))
  }

  /** The DuckDB replay of the phrase count for a literal phrase — one
    * comprehension over each doc's token array (overlaps included). */
  def phraseOracleSql(table: String, idExpr: String, textExpr: String,
                      phrase: Seq[String]): String = {
    phraseGuard(phrase)
    val k = phrase.length
    val conds = phrase.zipWithIndex
      .map { case (t, j) => s"ws[p+$j] = '$t'" }.mkString(" AND ")
    s"""SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occurrences
       |FROM (SELECT doc_id,
       |        CASE WHEN len(ws) >= $k
       |             THEN [p FOR p IN generate_series(1, len(ws)-${k - 1}) IF $conds]
       |             ELSE [] END AS hits
       |      FROM (SELECT $idExpr AS doc_id, string_split($textExpr, ' ') AS ws FROM $table))
       |WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin
  }

  /** The DuckDB/ANSI replay of [[bm25TopKExact]] for a literal term list —
    * kept NEXT to the Scala formula so the two can only drift visibly.
    * `table` must expose `(idExpr, textExpr)`. */
  def bm25ExactOracleSql(table: String, idExpr: String, textExpr: String,
                         terms: Seq[String], k: Int): String = {
    def fx(a: String, b: String) = s"(($a*10000 - ($a*10000) % $b) // $b)"
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(sum(CASE WHEN list_contains(ws, '$t') THEN 1 ELSE 0 END) AS BIGINT) AS df$i"
    }.mkString(", ")
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ws, x -> x = '$t')) AS BIGINT) AS tf$i"
    }.mkString(", ")
    val termSum = terms.indices.map { i =>
      fx(s"(2*n - 2*df$i + 1)", s"(2*df$i + 1)") + " * " +
        fx(s"(22*tf$i*sdl)", s"(10*tf$i*sdl + 3*sdl + 9*dl*n)")
    }.mkString(" + ")
    s"""WITH b AS (SELECT $idExpr AS doc_id, string_split($textExpr, ' ') AS ws FROM $table),
       |d AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl FROM b),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sdl, $dfCols FROM d),
       |t AS (SELECT doc_id, dl, $tfCols FROM d),
       |sc AS (SELECT doc_id, $termSum AS score_e8 FROM t, s)
       |SELECT doc_id, score_e8 FROM sc WHERE score_e8 > 0
       |ORDER BY score_e8 DESC, doc_id LIMIT $k""".stripMargin
  }
}
