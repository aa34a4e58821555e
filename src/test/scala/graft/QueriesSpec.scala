package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs end-to-end on sf0.001, returns rows, and its
  * physical plan passes the scale lint below. (Value-level correctness is
  * checked differentially against DuckDB by the driver at sf0.01, and in dev
  * by dev/check_oracle.py.) */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plan is ALLOWED a cartesian/nested-loop join, with the
    * reason. Everything else must stay strictly equi-join shaped: a silent
    * cartesian is the classic would-not-survive-100TB plan bug. */
  private val crossJoinOk: Map[String, String] = Map(
    "q81_bm25" -> "corpus stats (N, avgdl) are ONE agg row cross-joined into scoring — bounded broadcast",
    "q88_fluency" -> "total-token scalar is ONE agg row cross-joined into the probability chain",
    "q114_dsir_select" -> "feature totals (TT, RR) are ONE agg row cross-joined into the bucket-ratio table (<= buckets rows)",
    "q90_report" -> "per-source rollup cross-joins the same 1-row corpus-stat aggregates as q81/q88",
    "q36_bucket_histogram" -> "bucket bounds are ONE min/max agg row broadcast against the pixel stream",
    "q127_corpus_card" -> "ONE agg row cross-joined with the ONE median row — the whole result is one row",
    "q95_broadcast_join" -> "the reference's broadcastJoin contract: small side broadcast + general spatial predicate ⇒ nested-loop probe IS the designed plan",
    "q17_dedup_cosine" -> "documented O(n²) exact twin — the oracle anchor for q33's LSH path",
    "q18_ann_topk" -> "brute-force ANN baseline: query batch × corpus by contract (batch broadcast-small)",
    "q19_ann_ivf" -> "composes the q18 brute baseline to compute the pinned recall invariant; the final crossJoin is 1 stat row × 1 hit-count row",
    "q76_knn_classify" -> "composes the q18 brute baseline for a bounded query batch",
    "q116_hard_negatives" -> "brute scoring: query batch × corpus by contract (batch broadcast-small)",
    "q120_random_projection" -> "composes the q18 brute baseline on the 16-d JL sketch (batch broadcast-small)",
    "q79_ann_pq" -> "per-query ADC lookup tables: query batch × codebook, both broadcast-small",
    "q80_ann_pq_store" -> "per-query ADC lookup tables: query batch × codebook, both broadcast-small",
    "q179_pq_store_ingest" -> "per-query ADC lookup tables: query batch × codebook, both broadcast-small (q80's shape over the batch_id-appended codes)",
    "q208_pq_opq_store" -> "per-query ADC lookup tables: query batch × codebook, both broadcast-small (q80's shape; the OPQ rotation is a per-row map in front)",
    "q89_hybrid" -> "rerank stage: ≤50 BM25 candidates × the query vector row",
    "q135_source_overlap" -> "the group-PAIR table: G² rows of source labels (report-sized by contract); the register joins onto it are equi-joins",
    "q145_profile" -> "per profiled column, ONE basic-stats agg row joins ONE estimator row — the literal group key folds, leaving a 1×1 broadcast join (q127's shape)",
    "q165_collocations" -> "corpus token count N is ONE agg row cross-joined into the pair-score projection (q81's stat shape)",
    "q166_scalar_quant" -> "composes the q18 brute baseline over int8-reconstructed vectors (batch broadcast-small)",
    "q170_binary_ann" -> "Hamming pre-rank: query batch × corpus CODE column by contract (batch broadcast-small; the rerank joins are equi-joins)",
    "q171_binary_store" -> "same Hamming pre-rank core as q170 over the STORED code column (batch broadcast-small; store build and rerank are equi-join shaped)",
    "q196_decayed_counts" -> "the now anchor (max ts) is ONE agg row cross-joined into the weight projection — q81's stat shape",
    "q217_fluency3" -> "total-token scalar N is ONE agg row cross-joined into the backoff chain — q88's stat shape at order 3",
    "q218_fluency3_store" -> "same 1-row N cross join as q217, N folded from the segmented store's unigram table",
    "q219_fluency3_forget" -> "same 1-row N cross join as q217, N folded net of the deletion segments",
  )

  /** Queries ALLOWED a Window with an empty partitionSpec (single-task
    * global window) — must be bounded-input by contract. Currently none:
    * even q89_hybrid's ≤50-candidate rerank plans partitioned. */
  private val globalWindowOk: Map[String, String] = Map.empty

  // COVERAGE CARVE-OUT: the lint inspects the RETURNED plan only.
  // Invariant-row queries (q214/q223/q232-class) run their bounded brute
  // anchors eagerly INSIDE the query body (e.g. a .count() on a contract-
  // bounded crossJoin) and return a literal result row, so those in-body
  // anchor plans are never linted here — their bounds are the rows' own
  // documented contracts (≤20 queries × a verify-scale corpus), not this
  // spec's claim. Everything the queries RETURN is covered.
  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs, returns rows, and its plan passes the scale lint") {
      val df = fn(spark, dir)
      val plan = df.queryExecution.explainString(FormattedMode)
      if (!crossJoinOk.contains(name)) {
        assert(!plan.contains("CartesianProduct"),
          s"$name plans a CartesianProduct — not equi-join shaped:\n$plan")
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin — not equi-join shaped:\n$plan")
      }
      if (!globalWindowOk.contains(name)) {
        // checked on the PHYSICAL TREE, not a string: FormattedMode prints
        // window arguments in a details section no line regex reliably
        // ties back to the node (an earlier regex version could never
        // match and passed vacuously). An empty partitionSpec funnels all
        // rows into one task. SinglePartition-folded keys (e.g. a literal
        // the optimizer removed) land here too — exactly the cases the
        // lint exists to catch.
        val globalWindows = df.queryExecution.sparkPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
          case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
              if w.partitionSpec.isEmpty => w
        }
        assert(globalWindows.isEmpty,
          s"$name plans an unpartitioned Window (single-task sort):\n$plan")
      }
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("cross-join whitelist names only registered queries") {
    val unknown = (crossJoinOk.keySet ++ globalWindowOk.keySet) -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"whitelist entries without a query: $unknown")
  }
}
