package graft

import graft.functions.stf
import graft.operators.JoinPredicate
import graft.syntax._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fluent API produces the same results as the operator objects. */
class SyntaxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fluent chain: filter -> knn matches direct operators") {
    val c = Tables.customerPts(spark, dir)
    val poly = stf.st_geomfromwkt("POLYGON ((100 100, 600 100, 600 700, 100 700, 100 100))")
    val fluent = c.stContainedBy(col("c_geo"), poly)
      .stKnn(col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), k = 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val direct = graft.operators.KNN.knn(
        graft.operators.SpatialOps.containedBy(c, col("c_geo"), poly),
        col("c_geo"), stf.st_point(lit(500.0), lit(500.0)), 5)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(fluent == direct && fluent.size == 5)
  }

  test("fluent join and cluster run end-to-end") {
    val n = Tables.nationRects(spark, dir)
    val c = Tables.customerPts(spark, dir)
    val joined = n.stJoin(c, col("n_geo"), col("c_geo"), JoinPredicate.Contains, 100.0)
    assert(joined.count() > 0)
    val clustered = c.stCluster(col("c_custkey"), col("cx"), col("cy"), 32.0, 5)
    assert(clustered.count() == c.count())
  }
}
