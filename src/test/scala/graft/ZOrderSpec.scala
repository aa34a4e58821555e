package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Z-order layout: interleave kernel against hand-computed Morton codes,
 * scaling edge cases, content preservation through the layout, and the
 * load-bearing claim — files written under the curve carry TIGHT
 * per-column min/max boxes (the property parquet row-group pruning feeds
 * on), versus hash-layout files that each span the whole domain.
 */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("interleave matches hand-computed Morton codes") {
    // x=5(101), y=3(011), 3 bits: x bits at even lanes -> 1+0+16 = 17,
    // y bits at odd lanes -> 2+8+0 = 10, morton = 27
    val df = spark.range(1).select(lit(5L).as("x"), lit(3L).as("y"))
    val got = df.select(ZOrder.interleave(Seq(col("x"), col("y")), 3)).head().getLong(0)
    assert(got == 27L)
    // single dim degenerates to identity
    val one = spark.range(1).select(lit(45L).as("x"))
    assert(one.select(ZOrder.interleave(Seq(col("x")), 6)).head().getLong(0) == 45L)
    // three dims: x=1,y=1,z=1 with 1 bit -> bits 0,1,2 -> 7
    val three = spark.range(1).select(lit(1L).as("a"), lit(1L).as("b"), lit(1L).as("c"))
    assert(three.select(
      ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 1)).head().getLong(0) == 7L)
  }

  test("mortonKey scaling: bounds clamp, constant column degenerates to 0") {
    val df = spark.createDataFrame(Seq((0.0, 7.0), (100.0, 7.0), (150.0, 7.0)))
      .toDF("x", "c")
    val key = ZOrder.mortonKey(Seq(col("x"), col("c")),
      Seq(lit(0.0), lit(7.0)), Seq(lit(100.0), lit(7.0)), bits = 4)
    val got = df.select(col("x"), key.as("k")).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.0) == 0L)
    // x=100 -> rank 15 -> bits at even lanes of k=2: 1+4+16+64 = 85
    assert(got(100.0) == 85L)
    assert(got(150.0) == 85L) // out-of-bounds saturates, never wraps
  }

  test("zorder layout preserves content and tightens per-file column boxes") {
    val n = 20000
    val src = spark.range(n).select(col("id"),
        pmod(xxhash64(col("id")), lit(1000L)).cast("double").as("x"),
        pmod(xxhash64(col("id") * 7 + 1), lit(1000L)).cast("double").as("y"))
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    ZOrder.write(src, s"$dir/z", Seq("x", "y"), bits = 10, partitions = 32)
    src.repartition(32).write.parquet(s"$dir/h") // hash layout control

    val zBack = spark.read.parquet(s"$dir/z")
    // layout must not change content
    assert(zBack.count() == n)
    assert(zBack.select(sum(col("id"))).head().getLong(0) ==
      src.select(sum(col("id"))).head().getLong(0))

    def avgFileBoxArea(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(((max(col("x")) - min(col("x"))) * (max(col("y")) - min(col("y")))).as("a"))
        .agg(avg(col("a"))).head().getDouble(0)

    val zArea = avgFileBoxArea(s"$dir/z")
    val hArea = avgFileBoxArea(s"$dir/h")
    // 32 curve segments over a 2^20 grid cover ~1/30 of the domain each;
    // hash files each span ~the whole 1000×1000 domain. 4× headroom.
    assert(zArea < hArea / 4,
      s"zorder files must be tighter: zorder avg box $zArea vs hash $hArea")
    assert(zArea < 1000.0 * 1000.0 / 8)
  }

  test("null key values cluster together and survive the layout") {
    val src = spark.createDataFrame(Seq(
        (1L, java.lang.Double.valueOf(5.0), java.lang.Double.valueOf(1.0)),
        (2L, null.asInstanceOf[java.lang.Double], java.lang.Double.valueOf(2.0)),
        (3L, java.lang.Double.valueOf(9.0), null.asInstanceOf[java.lang.Double]),
        (4L, null.asInstanceOf[java.lang.Double], null.asInstanceOf[java.lang.Double])))
      .toDF("id", "x", "y")
    val out = ZOrder.zorderBy(src, Seq("x", "y"), bits = 8, partitions = 2)
    // nothing dropped, nothing duplicated, no key column leaked
    assert(out.columns.toSeq == Seq("id", "x", "y"))
    assert(out.select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
  }

  test("input contracts fail loudly") {
    val df = spark.range(4).select(col("id"), col("id").cast("double").as("x"))
    val e = intercept[IllegalArgumentException] {
      ZOrder.zorderBy(df, Seq("x"), bits = 64)
    }
    assert(e.getMessage.contains("63-bit"))
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.zorderBy(df.withColumn("__zkey", lit(1)), Seq("x"))
    }
    assert(e2.getMessage.contains("__zkey"))
  }
}
