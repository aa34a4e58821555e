package graft

import graft.operators.Classifier
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Hashed-linear classifier: feature hashing replays the house xxHash64
 * kernel exactly, training counts/weights match a local replay, scoring
 * matches an independent explode-join-sum plan, and the model store round
 * trips.
 */
class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Dim = Classifier.DefaultDim

  private def featRef(tok: String): Long =
    graft.functions.TextOps.hashUtf8(
      UTF8String.fromString(tok), graft.functions.TextOps.SEED) & (Dim - 1).toLong

  test("features = xxhash64(token) & (dim-1), one per token, empties kept") {
    import spark.implicits._
    val got = Seq("spark joins data", "  x").toDF("text")
      .select(Classifier.features(col("text")).as("f"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0) == Seq("spark", "joins", "data").map(featRef))
    assert(got(1) == Seq("", "", "x").map(featRef)) // split keeps empties
    assert(got.flatten.forall(f => f >= 0 && f < Dim))
  }

  test("train: per-occurrence counts and integer polarity weights replay locally") {
    import spark.implicits._
    val df = Seq(
      ("good good spark", true),
      ("good bad", true),
      ("bad bad bad", false)
    ).toDF("text", "label")
    val model = Classifier.train(df, col("text"), col("label"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    def w(p: Long, n: Long): Long = {
      val d = p - n
      (if (d < 0) -1L else 1L) * (1000000L * math.abs(d)) / (p + n + 1)
    }
    assert(model(featRef("good")) == ((3L, 0L, w(3, 0))))
    assert(model(featRef("bad")) == ((1L, 3L, w(1, 3))))
    assert(model(featRef("spark")) == ((1L, 0L, w(1, 0))))
    assert(model.size == 3)
  }

  test("scoreWith margin equals the independent explode-join-sum plan; gate keeps margin>0") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Classifier.trainFromSeed(docs, col("text"))
    val scored = Classifier.scoreWith(docs, col("text"), model)
      .select(col("doc_id"), col("margin_e6"), col("pred"))
    // independent plan: explode features, broadcast-join the model, sum
    val viaJoin = docs
      .select(col("doc_id"), explode(Classifier.features(col("text"))).as("feature"))
      .join(broadcast(model.select("feature", "weight_e6")), Seq("feature"), "left")
      .groupBy("doc_id")
      .agg(sum(coalesce(col("weight_e6"), lit(0L))).as("margin_e6"))
    val a = scored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = viaJoin.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    val gated = Classifier.gate(docs, col("text"), model)
      .select("doc_id").as[Long].collect().toSet
    assert(gated == a.filter(_._2 >= 0).keySet) // default tau = 0
    assert(scored.collect().forall(r => r.getBoolean(2) == (r.getLong(1) >= 0)))
    // cross-multiplied tau rule: mean token polarity >= tau, length-invariant
    val tau = -400000L
    val withTau = Classifier.scoreWith(docs, col("text"), model, tauE6 = tau)
      .select(col("doc_id"), col("margin_e6"), col("n_tokens"), col("pred")).collect()
    assert(withTau.forall(r =>
      r.getBoolean(3) == (r.getLong(1) >= tau * r.getLong(2))))
    // n_tokens is the whitespace token count (empties kept)
    val ntokWant = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withTau.map(r => r.getLong(0) -> r.getLong(2)).toMap == ntokWant)
  }

  test("meanPolarityE6 equals the local sign-magnitude replay over model rows") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Classifier.trainFromSeed(docs, col("text"))
    val rows = model.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val s = rows.map { case (p, n, w) => BigInt(w) * (p + n) }.sum
    val t = rows.map { case (p, n, _) => BigInt(p + n) }.sum
    val want = (if (s < 0) -((-s) / t) else s / t).toLong
    assert(Classifier.meanPolarityE6(model) == want)
    // the self-calibrated gate is non-degenerate on the real corpus:
    // some docs above the corpus mean, some below
    val gated = Classifier.gate(docs, col("text"), model, tauE6 = want).count()
    assert(gated > 0 && gated < docs.count())
    // empty model calibrates to zero
    assert(Classifier.meanPolarityE6(model.filter(lit(false))) == 0L)
  }

  test("disjoint-vocabulary toy corpus: predictions recover the labels") {
    import spark.implicits._
    val df = Seq.tabulate(20) { i =>
      if (i % 2 == 0) (s"alpha beta gamma w$i", true)
      else (s"noise junk spam w$i", false)
    }.toDF("text", "label")
    val model = Classifier.train(df, col("text"), col("label"))
    val scored = Classifier.scoreWith(df, col("text"), model)
      .select(col("label"), col("pred")).collect()
    assert(scored.forall(r => r.getBoolean(0) == r.getBoolean(1)))
  }

  test("model store round-trips exactly") {
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val model = Classifier.trainFromSeed(docs, col("text"))
    val path = java.nio.file.Files.createTempDirectory("clf_model").toString + "/m"
    Classifier.saveModel(model, path)
    val back = Classifier.loadModel(spark, path)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("feature", "n_pos", "n_neg", "weight_e6").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows(back) == rows(model))
  }

  test("dim contract: non-power-of-two and oversized dims fail loudly") {
    import spark.implicits._
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException](Classifier.features(col("text"), 1000))
    intercept[IllegalArgumentException](
      Classifier.train(df, col("text"), lit(true), Classifier.MaxDim * 2))
  }

  test("store freezes the training dim; scoring enforces it") {
    import spark.implicits._
    val df = Seq.tabulate(20) { i =>
      if (i % 2 == 0) (s"alpha beta gamma w$i", true)
      else (s"noise junk spam w$i", false)
    }.toDF("text", "label")
    val dim = 1 << 10
    val model = Classifier.train(df, col("text"), col("label"), dim)
    val path = java.nio.file.Files.createTempDirectory("clf_dim").toString + "/m"
    Classifier.saveModel(model, path, dim)
    assert(Classifier.storedDim(spark, path) == dim)
    // store-side scorer hashes at the FROZEN dim — matches the live scorer
    val want = Classifier.scoreWith(df, col("text"), model, dim)
      .select(col("text"), col("margin_e6")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Classifier.scoreFromStore(df, col("text"), path)
      .select(col("text"), col("margin_e6")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    // a caller-supplied dim that disagrees with training is refused loudly
    // (a different mask silently yields wrong margins otherwise)
    val err = intercept[IllegalArgumentException] {
      graft.streaming.EventStreams.classifyLinear(df, "text", path,
        dim = Classifier.DefaultDim)
    }
    assert(err.getMessage.contains("training dim"))
    // omitted dim = stored dim; margins match the live scorer
    val viaStream = graft.streaming.EventStreams.classifyLinear(df, "text", path)
      .select(col("text"), col("margin_e6")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaStream == want)
  }

  test("null text rows score null instead of failing the job") {
    import spark.implicits._
    val df = Seq(Some("alpha beta"), None, Some("noise junk")).toDF("text")
    val model = Classifier.train(
      Seq(("alpha beta", true), ("noise junk", false)).toDF("text", "label"),
      col("text"), col("label"))
    val rows = Classifier.scoreWith(df, col("text"), model)
      .select(col("text"), col("margin_e6")).collect()
    assert(rows.length == 3)
    val nullRow = rows.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(1), "null text must yield null margin")
    assert(rows.filterNot(_.isNullAt(0)).forall(!_.isNullAt(1)))
    // and the gate drops the null row rather than crashing
    assert(Classifier.gate(df, col("text"), model).count() >= 1)
  }
}
