package graft

import graft.operators.Skyline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Skyline dominance semantics — ports the reference's own hand cases
 * (reference src/test/scala/dbis/stark/spatial/SkylineTest.scala: the
 * dominates-relation and insert scenarios), exercised through the public
 * operator so the per-partition frontier and the merge are both on the
 * hook. Dominance: <= in both dims, strictly < in at least one.
 */
class SkylineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sky(pts: (Double, Double)*): Set[(Double, Double)] = {
    import spark.implicits._
    val df = pts.toDF("x", "y").repartition(3)
    Skyline.skyline(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
  }

  test("a point does not dominate itself: duplicates both survive") {
    import spark.implicits._
    val df = Seq((1.0, 1.0), (1.0, 1.0)).toDF("x", "y")
    assert(Skyline.skyline(df, "x", "y").count() == 2)
  }

  test("smaller x with equal y dominates") {
    assert(sky((1.0, 2.0), (2.0, 2.0)) == Set((1.0, 2.0)))
  }

  test("smaller y with equal x dominates") {
    assert(sky((2.0, 1.0), (2.0, 2.0)) == Set((2.0, 1.0)))
  }

  test("incomparable points all stay on the frontier") {
    assert(sky((3.0, 1.0), (1.0, 3.0), (2.0, 2.0)) ==
      Set((3.0, 1.0), (1.0, 3.0), (2.0, 2.0)))
  }

  test("a dominated insert is filtered; a dominating insert evicts") {
    // (2.5, 2.5) is dominated by (2, 2); (1, 1) evicts everything
    assert(sky((3.0, 1.0), (1.0, 3.0), (2.0, 2.0), (2.5, 2.5)) ==
      Set((3.0, 1.0), (1.0, 3.0), (2.0, 2.0)))
    assert(sky((3.0, 1.0), (1.0, 3.0), (2.0, 2.0), (1.0, 1.0)) ==
      Set((1.0, 1.0)))
  }

  test("integer and long columns satisfy the documented numeric contract") {
    import spark.implicits._
    val df = Seq((3, 1L), (1, 3L), (2, 2L), (3, 3L)).toDF("x", "y")
    val got = Skyline.skyline(df, "x", "y").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((3, 1L), (1, 3L), (2, 2L)))
  }

  test("angular skyline agrees with plain off the first quadrant too") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 400).map(_ =>
      (rnd.nextDouble() * 200 - 100, rnd.nextDouble() * 200 - 100))
      .toDF("x", "y").repartition(7)
    val plain = Skyline.skyline(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val angular = Skyline.skylineAngular(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(angular == plain && plain.nonEmpty)
  }

  test("partition-dominance pruning drops dominated partitions, result unchanged") {
    // unit: partition 1's best corner (5,5) is dominated by partition 0's
    // worst corner (2,2) -> prune 1; 0 and 2 are incomparable -> kept
    val bounds = Seq(
      (0, 1.0, 1.0, 2.0, 2.0),
      (1, 5.0, 5.0, 9.0, 9.0),
      (2, 0.5, 8.0, 0.9, 9.0))
    assert(Skyline.prunePartitions(bounds) == Set(1))
    // mutual dominance cannot prune everything: identical corner boxes with
    // no strict component survive
    assert(Skyline.prunePartitions(Seq(
      (0, 1.0, 1.0, 1.0, 1.0), (1, 1.0, 1.0, 1.0, 1.0))) == Set.empty)
    // end-to-end: range-partitioned so one partition holds only dominated
    // points; the result is still the exact skyline
    import spark.implicits._
    val pts = (1 to 50).map(i => (i.toDouble, 51.0 - i)) ++ // anti-correlated frontier
      (1 to 50).map(i => (100.0 + i, 100.0 + i))            // far dominated cloud
    val df = pts.toDF("x", "y").repartitionByRange(2, col("x"))
    val got = Skyline.skyline(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(got == (1 to 50).map(i => (i.toDouble, 51.0 - i)).toSet)
  }

  test("stSkyline: open intervals use their start; a timeless ref fails loudly") {
    import graft.functions.stf
    import spark.implicits._
    val base = Seq((1L, 1.0, 10L), (2L, 2.0, 20L)).toDF("id", "x", "ts")
    val openIv = base.withColumn("sto",
      stf.st_with_open_interval(stf.st_point(col("x"), lit(0.0)), col("ts")))
    val instant = base.withColumn("sto",
      stf.st_with_instant(stf.st_point(col("x"), lit(0.0)), col("ts")))
    val ref = stf.st_with_instant(stf.st_point(lit(0.0), lit(0.0)), lit(0L))
    val a = Skyline.stSkyline(openIv, col("sto"), ref)
      .select("id").as[Long].collect().toSet
    val b = Skyline.stSkyline(instant, col("sto"), ref)
      .select("id").as[Long].collect().toSet
    assert(a == b && a == Set(1L)) // (1, 10) dominates (2, 20)
    val timelessRef = stf.st_point(lit(0.0), lit(0.0))
    val err = intercept[Exception] {
      Skyline.stSkyline(instant, col("sto"), timelessRef).collect()
    }
    assert(err.getMessage != null)
  }

  test("angular variant and no-part variant agree with the plain skyline") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = (0 until 400).map(_ => (rnd.nextDouble() * 100, rnd.nextDouble() * 100))
      .toDF("x", "y").repartition(7)
    val plain = Skyline.skyline(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val angular = Skyline.skylineAngular(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val noPart = Skyline.skylineAngularNoPart(df, "x", "y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(angular == plain && noPart == plain && plain.nonEmpty)
    // every excluded point is dominated by some skyline point
    val all = df.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    (all -- plain).foreach { case (x, y) =>
      assert(plain.exists { case (sx, sy) =>
        (sx <= x && sy < y) || (sx < x && sy <= y) })
    }
  }
}
