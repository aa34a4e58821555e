package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Hashed-feature linear quality classifier — the fastText-style "seed
 * heuristic → linear model → corpus-wide scoring" loop used to bootstrap
 * quality filters for LLM training corpora (cf. the CCNet / GPT-3 /
 * Llama-2 data pipelines: a cheap classifier trained on a heuristic seed
 * set, then applied to every document at corpus scale).
 *
 * Design for 100 TB:
 *  - Featurization is the hashing trick: each whitespace token maps to
 *    `xxhash64(token) & (dim-1)` — a pure codegen'd expression (Spark's
 *    built-in XXH64, seed 42, the same kernel the SimHash/MinHash family
 *    uses), no vocabulary build, no shuffle.
 *  - Training is one `groupBy(feature)` over exploded tokens — the key
 *    space is bounded by `dim` (default 2^15), so partial aggregation
 *    collapses each map task to at most `dim` rows regardless of corpus
 *    size; the shuffle is O(tasks × dim), not O(tokens).
 *  - Scoring is map-side only: the model (≤ `dim` rows, hard-bounded by
 *    [[MaxDim]]) is collected into one dense `Array[Long]` and broadcast;
 *    each document sums its features' weights in a single pass. Zero
 *    shuffle, so scoring pipelines into whatever comes next.
 *
 * Determinism contract: weights are exact integers —
 * `sign(p−n) · (1e6·|p−n|) div (p+n+1)` over per-occurrence counts — and
 * the margin is their exact BIGINT sum, so an external SQL engine
 * replaying the same hash → count → weight → sum chain matches
 * bit-for-bit (the driver's DuckDB oracle does exactly that via
 * [[graft.SimhashOracle.hashCtes]]).
 *
 * Reference scope: the reference engine has no classifier surface; this
 * extends the LLM-pipeline family (SURVEY §2-adjacent) alongside
 * dedup/quality/DSIR.
 */
object Classifier {

  /** Default feature-space size (power of two so the mask equals the
    * unsigned modulus the SQL oracle computes). */
  val DefaultDim = 1 << 15

  /** Hard bound on the broadcastable model: 2^20 weights = 8 MB dense. */
  val MaxDim = 1 << 20

  private def requireDim(dim: Int): Unit = {
    require(dim > 0 && (dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    require(dim <= MaxDim, s"dim $dim exceeds MaxDim $MaxDim (8 MB dense broadcast bound)")
  }

  /** One hashed feature id per whitespace token (empties kept — matches
    * `split(text, ' ')` everywhere else in the text family): array<long>
    * in [0, dim). Pure codegen — xxhash64 is Spark's native XXH64(seed 42)
    * expression, and the power-of-two mask keeps the signed-long low bits
    * identical to the oracle's unsigned `h % dim`. */
  def features(text: Column, dim: Int = DefaultDim): Column = {
    requireDim(dim)
    transform(split(text, " "), t => xxhash64(t).bitwiseAND(lit((dim - 1).toLong)))
  }

  /** Heuristic seed labels: the house quality score (type-token +
    * stopword ratio, [[TextAnalysis.withQuality]]) thresholded at a FIXED
    * cut — no global percentile, so labeling is a pure per-row map. */
  def withSeedLabel(df: DataFrame, textCol: Column,
                    threshold: Long = 700000L): DataFrame =
    TextAnalysis.withQuality(df, textCol)
      .withColumn("label", col("quality_e6") >= threshold)

  /**
   * Train the linear model: per-occurrence positive/negative counts per
   * hashed feature, polarity weight
   * `weight_e6 = sign(p−n) · (1e6·|p−n|) div (p+n+1)` (an integer-exact
   * odds proxy; the +1 is the usual add-one smoothing that also caps
   * |weight| < 1e6). Output: (feature, n_pos, n_neg, weight_e6), one row
   * per feature that occurs in the corpus.
   */
  def train(df: DataFrame, textCol: Column, labelCol: Column,
            dim: Int = DefaultDim): DataFrame = {
    requireDim(dim)
    df.select(explode(features(textCol, dim)).as("feature"), labelCol.as("__lab"))
      .groupBy("feature")
      .agg(sum(when(col("__lab"), 1L).otherwise(0L)).as("n_pos"),
           sum(when(col("__lab"), 0L).otherwise(1L)).as("n_neg"))
      .withColumn("weight_e6",
        when(col("n_pos") - col("n_neg") < 0, -1L).otherwise(1L) *
          expr("(1000000 * abs(n_pos - n_neg)) div (n_pos + n_neg + 1)"))
      .withColumn("feature", col("feature").as("feature", dimMetadata(dim)))
  }

  /** The training dim rides on the model itself as column metadata on
    * `feature` — so [[saveModel]] can freeze the dim the model was
    * actually trained at without trusting the caller to repeat it, and
    * scorers can reject a mismatched caller dim loudly instead of
    * silently hashing under the wrong mask. */
  private val DimMetaKey = "graft.clf.dim"

  private def dimMetadata(dim: Int) =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putLong(DimMetaKey, dim.toLong).build()

  /** The dim stamped on a model by [[train]], if the stamp survived the
    * caller's transforms (plain select/filter keep column metadata). */
  def trainedDim(model: DataFrame): Option[Int] = {
    val md = model.schema("feature").metadata
    if (md.contains(DimMetaKey)) Some(md.getLong(DimMetaKey).toInt) else None
  }

  private def checkAgainstStamp(model: DataFrame, dim: Int, op: String): Unit =
    trainedDim(model).foreach(d => require(d == dim,
      s"Classifier.$op: model was trained at dim=$d but caller passed " +
      s"dim=$dim — scoring under a different hash mask than training " +
      "silently produces wrong margins"))

  /** Seed-label + train in one call (the bootstrap loop's first half). */
  def trainFromSeed(df: DataFrame, textCol: Column, dim: Int = DefaultDim,
                    threshold: Long = 700000L): DataFrame =
    train(withSeedLabel(df, textCol, threshold), textCol, col("label"), dim)

  /** Dense weight vector from a model DataFrame. The collect is bounded
    * by construction: `train` emits at most `dim` ≤ [[MaxDim]] rows
    * (feature is masked into [0, dim)). */
  def collectWeights(model: DataFrame, dim: Int = DefaultDim): Array[Long] = {
    requireDim(dim)
    val w = new Array[Long](dim)
    model.select(col("feature").cast("long"), col("weight_e6").cast("long"))
      .collect().foreach { r =>
        val f = r.getLong(0)
        require(f >= 0 && f < dim, s"model feature $f outside [0, $dim)")
        w(f.toInt) = r.getLong(1)
      }
    w
  }

  /**
   * Score documents against a trained model: `margin_e6` = exact sum of
   * the document's per-occurrence feature weights, `n_tokens` = the
   * feature count, `pred` = `margin_e6 >= tauE6 · n_tokens` — a
   * length-invariant mean-token-polarity threshold, compared
   * cross-multiplied so the rule stays integer-exact (τ = 0 is the plain
   * margin-sign rule). τ is the operator's decision knob, like DBSCAN's
   * eps. Map-side only (broadcast dense weights; the features column is
   * the same codegen'd expression as training) — zero shuffle, safe to
   * chain ahead of any downstream gate at any corpus size.
   */
  def scoreWith(df: DataFrame, textCol: Column, model: DataFrame,
                dim: Int = DefaultDim, tauE6: Long = 0L): DataFrame = {
    checkAgainstStamp(model, dim, "scoreWith")
    val w = collectWeights(model, dim)
    val bc = df.sparkSession.sparkContext.broadcast(w)
    // per-row Long loop over a broadcast array — the documented UDF
    // exception (no vectorized expression can index a broadcast vector).
    // Null text → null features → null margin (and a null pred any gate
    // drops), never an NPE that fails the whole scoring job.
    val sumW = udf { fs: Seq[Long] =>
      if (fs == null) None
      else {
        val arr = bc.value; var s = 0L; var i = 0
        while (i < fs.length) { s += arr(fs(i).toInt); i += 1 }
        Some(s)
      }
    }
    val feats = features(textCol, dim)
    df.withColumn("margin_e6", sumW(feats))
      .withColumn("n_tokens", size(feats).cast("long"))
      .withColumn("pred", col("margin_e6") >= lit(tauE6) * col("n_tokens"))
  }

  /** Keep only documents the model accepts at mean token polarity ≥ τ. */
  def gate(df: DataFrame, textCol: Column, model: DataFrame,
           dim: Int = DefaultDim, tauE6: Long = 0L): DataFrame =
    scoreWith(df, textCol, model, dim, tauE6).filter(col("pred"))

  /**
   * Self-calibrating τ: the TRAINING corpus's mean token polarity,
   * computed from the model alone — Σ weight·(n_pos+n_neg) / Σ(n_pos+n_neg)
   * (each feature's occurrence count is already in the model, so no
   * second corpus pass). Fixed at train time, exactly the operational
   * contract for scoring later batches through a stored model. DECIMAL(38)
   * sums keep the aggregate exact at any corpus size; the division is
   * sign-magnitude truncation so an external engine's `//` on the
   * negated magnitude matches bit-for-bit. One driver row — bounded by
   * construction.
   */
  def meanPolarityE6(model: DataFrame): Long = {
    val occ = (col("n_pos") + col("n_neg")).cast("decimal(38,0)")
    val r = model.agg(
      sum(col("weight_e6").cast("decimal(38,0)") * occ).as("s"),
      sum(occ).as("t")).head()
    if (r.isNullAt(1)) return 0L
    val s = BigInt(r.getDecimal(0).toBigInteger)
    val t = BigInt(r.getDecimal(1).toBigInteger)
    if (t == 0) 0L else (if (s < 0) -((-s) / t) else s / t).toLong
  }

  /** Persist the model as one small parquet sorted by feature (≤ dim ≤
    * [[MaxDim]] rows), plus a `_graft_clf_params` sidecar freezing the
    * TRAINING dim — the hash-space parameter, like every other persisted
    * model's sidecar (binary index, MinHash, cosine-LSH, WordPiece).
    * Scoring with a different dim hashes features under a different mask
    * than training and silently produces wrong margins; the sidecar lets
    * every store-side scorer enforce the trained dim. Callers that need
    * crash-atomicity stage the path (the driver's storedOnce pattern);
    * the write itself is a single task.
    *
    * The frozen dim comes from the stamp [[train]] put on the model, so a
    * caller cannot accidentally freeze a dim the model was not trained at.
    * An explicit `dim` is only needed for models whose stamp was stripped
    * by an intermediate transform — and is cross-checked against the
    * stamp when both are present. */
  def saveModel(model: DataFrame, path: String, dim: Int = -1): Unit = {
    val d = if (dim > 0) dim else trainedDim(model).getOrElse(
      throw new IllegalArgumentException(
        "Classifier.saveModel: the model carries no training-dim stamp " +
        "(an intermediate transform stripped the column metadata) and no " +
        "explicit dim was passed — pass the dim the model was trained at"))
    requireDim(d)
    checkAgainstStamp(model, d, "saveModel")
    model.select("feature", "n_pos", "n_neg", "weight_e6")
      .coalesce(1).sortWithinPartitions("feature")
      .write.mode("overwrite").parquet(path)
    graft.sources.Sidecar.writeText(model.sparkSession,
      path + "/_graft_clf_params", d.toString)
  }

  /** The training dim frozen in the store's params sidecar. Stores
    * predating the sidecar were all trained at [[DefaultDim]]. */
  def storedDim(spark: org.apache.spark.sql.SparkSession, path: String): Int =
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_clf_params"))
      graft.sources.Sidecar.readText(spark, path + "/_graft_clf_params").trim.toInt
    else DefaultDim

  /** Load a persisted model, re-stamping the frozen training dim from the
    * params sidecar so a load → saveModel round trip (or a scoreWith at a
    * wrong caller dim) keeps the drift protection of a freshly trained
    * model. */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val df = spark.read.parquet(path)
    // pre-sidecar stores carry no frozen dim — leave them unstamped so a
    // caller who KNOWS the legacy training dim can still score at it
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_clf_params"))
      df.withColumn("feature",
        col("feature").as("feature", dimMetadata(storedDim(spark, path))))
    else df
  }

  /** [[scoreWith]] against a persisted model store, scoring at the dim
    * the sidecar froze at train time — the safe store-side entry point
    * (a caller-supplied dim can't drift from the training mask). */
  def scoreFromStore(df: DataFrame, textCol: Column, path: String,
                     tauE6: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    scoreWith(df, textCol, loadModel(spark, path), storedDim(spark, path), tauE6)
  }
}
