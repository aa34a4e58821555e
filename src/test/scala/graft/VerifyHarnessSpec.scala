package graft

import org.scalatest.funsuite.AnyFunSuite

/** Verification-harness integrity: the conf-gating helper and the
  * code-salted store cache — the two places where a harness bug would
  * not fail a query but silently weaken what Verify proves. */
class VerifyHarnessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("withConf restores (or unsets) gated confs even when the body throws") {
    val key = "spark.graft.join.timeBucket"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.unset(key)
      intercept[RuntimeException] {
        SparkEntry.withConf(spark, key -> "123")(throw new RuntimeException("boom"))
      }
      assert(spark.conf.getOption(key).isEmpty,
        "a thrown body must still unset the gate")
      // pre-existing value: restored, not unset
      spark.conf.set(key, "7")
      intercept[RuntimeException] {
        SparkEntry.withConf(spark, key -> "123")(throw new RuntimeException("boom"))
      }
      assert(spark.conf.get(key) == "7")
      // the gate is live inside the body and the plan is forced there
      spark.conf.unset(key)
      val df = SparkEntry.withConf(spark, key -> "100") {
        import spark.implicits._
        Seq((1L, 0L, 10L)).toDF("id_a", "sa", "ea").createOrReplaceTempView("wc_a")
        Seq((2L, 5L, 15L)).toDF("id_b", "sb", "eb").createOrReplaceTempView("wc_b")
        spark.sql("SELECT id_a, id_b FROM wc_a JOIN wc_b ON sa <= eb AND sb <= ea")
      }
      assert(spark.conf.getOption(key).isEmpty)
      // optimized while the bucket was set: the range-join rewrite fired
      assert(!df.queryExecution.optimizedPlan.toString.contains("BroadcastNestedLoop"))
      assert(df.queryExecution.optimizedPlan.toString.contains("st_t_ref_bucket"))
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("storedOnce cache keys include a bytecode-derived code salt (a kernel edit invalidates /tmp stores)") {
    // the salt hashed real bytecode — a classpath-lookup regression would
    // otherwise silently collapse it to a constant and resurrect the r12
    // stale-store hole
    assert(SparkEntry.codeSalt.matches("[0-9a-f]{12}"), SparkEntry.codeSalt)
    assert(SparkEntry.codeSaltInputs > 50,
      s"expected the full graft class tree, hashed only ${SparkEntry.codeSaltInputs}")
    assert(SparkEntry.codeSalt == SparkEntry.codeSalt) // stable per JVM
    val dir = java.nio.file.Files.createTempDirectory("graft_salt_spec").toFile
    try {
      java.nio.file.Files.write(new java.io.File(dir, "x.parquet").toPath,
        Array[Byte](1, 2, 3))
      val path = SparkEntry.storedOnce("saltspec", dir.getPath) { stage =>
        new java.io.File(stage).mkdirs()
        java.nio.file.Files.write(new java.io.File(stage, "_SUCCESS").toPath,
          Array.empty[Byte])
        ()
      }
      assert(path.contains(s"_${SparkEntry.codeSalt}"),
        s"cache path must be salted by code version: $path")
      assert(new java.io.File(path, "_SUCCESS").exists())
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }
}
