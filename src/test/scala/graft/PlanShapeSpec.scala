package graft

import graft.operators.{JoinPredicate, Pipeline, SpatialJoin, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape regression guards: the SCALE.md shuffle counts are assertions
 * about physical plans, so pin them — a refactor that silently reintroduces
 * a window re-cluster exchange or a cartesian product fails here, not at
 * 100 TB.
 */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** Count data-shuffle Exchange nodes (broadcast exchanges excluded) in
    * the formatted plan: node headers look like "(3) Exchange". */
  private def shuffleCount(df: DataFrame): Int =
    "\\(\\d+\\) Exchange\\b".r
      .findAllIn(df.queryExecution.explainString(FormattedMode)).size

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  test("quantileGate: exactly one data exchange (range), no window re-cluster") {
    val q = TextAnalysis.withQuality(docs, col("text"))
    val gated = Pipeline.quantileGate(q, col("source"), 1, 4,
      col("quality_e6").desc, col("doc_id"))
    assert(shuffleCount(gated) == 1, formatted(gated))
    assert(!formatted(gated).contains("Window"), "no window operator expected")
  }

  test("packSequences: exactly one data exchange (range), scan not window") {
    val packed = Pipeline.packSequences(docs, col("source"), col("doc_id"),
      length(col("text")), budget = 4096L)
    assert(shuffleCount(packed) == 1, formatted(packed))
    assert(!formatted(packed).contains("Window"), "no window operator expected")
  }

  test("epochShuffle: exactly one data exchange (range)") {
    val shuffled = Pipeline.epochShuffle(docs, col("doc_id"), "e0")
    assert(shuffleCount(shuffled) == 1, formatted(shuffled))
  }

  test("spatial cell join: no cartesian product, no broadcast nested loop") {
    val n = Tables.nationRects(spark, "/root/testdata/sf0.001")
    val c = Tables.customerPts(spark, "/root/testdata/sf0.001")
    val joined = SpatialJoin.join(n, c, col("n_geo"), col("c_geo"),
      JoinPredicate.Contains, cellSize = 100.0)
    val plan = formatted(joined)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("vocabTopK: top-k is TakeOrdered, not a global sort") {
    val v = TextAnalysis.vocabTopK(docs, col("text"), 50)
    assert(formatted(v).contains("TakeOrderedAndProject"), formatted(v))
  }
}
