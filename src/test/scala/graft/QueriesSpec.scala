package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs end-to-end on sf0.001 and returns rows.
  * (Value-level correctness is checked differentially against DuckDB by the
  * driver at sf0.01, and in dev by dev/check_oracle.py.) */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs and returns rows") {
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
