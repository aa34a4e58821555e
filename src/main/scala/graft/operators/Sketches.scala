package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Mergeable sketch summaries — HyperLogLog distinct counting and Count-Min
 * heavy hitters. Not in the reference (a spatio-temporal engine); first-class
 * here because corpus telemetry at 100 TB runs on sketches, not exact
 * aggregates: "how many distinct pages per crawl source" and "which tokens
 * dominate the corpus" must be answerable from kilobytes of mergeable state
 * that any new batch folds into without rescanning history.
 *
 * Both sketches are DETERMINISTIC and ENGINE-REPLAYABLE: every hash is an
 * md5 prefix (identical text in Spark and DuckDB), every register update is
 * integer arithmetic, so the driver oracle replays the sketch CONTENT
 * bit-for-bit — the estimate itself is hash-matched, not just bounded.
 * Merging is the native Spark aggregation the sketch is built from:
 * HLL registers merge by `max`, CMS counters by `sum`, so incremental
 * ingestion is a union + groupBy with map-side partial aggregation — never
 * a rescan, never driver state.
 *
 * Scale: an HLL register table is at most m = 2^p rows per group (p ≤ 11 ⇒
 * ≤ 2048 rows); a CMS table is depth×width rows TOTAL. Both are broadcast-
 * sized by construction, which is what makes the estimate joins cheap.
 */
object Sketches {

  /** Bits hashed into the rho field (hex digits 5..16 of the md5). */
  val RhoFieldBits = 48

  /** Largest possible register value: 48-bit field of zeros ⇒ rho = 49. */
  val MaxRho: Int = RhoFieldBits + 1

  /**
   * HyperLogLog register table for distinct-`value` estimation per group:
   * one row per (group, bucket) holding the max rank rho observed.
   *
   *   h      = md5(value ++ ":" ++ salt)           (hex)
   *   bucket = first 16 hash bits mod 2^p          (power-of-two mod of a
   *                                                 uniform field — unbiased)
   *   w      = next 48 hash bits                   (independent of bucket)
   *   rho    = leading zeros of w in 48 bits + 1   (= 49 - bitlength(w))
   *
   * Duplicated values hash identically, so duplicates are free — the
   * register table depends only on the SET of values. Registers merge
   * across batches/partitions by `max`, which is exactly the groupBy
   * aggregate used here (map-side combined; the shuffle carries at most
   * m rows per group per input partition).
   *
   * @param pBits register-index bits; m = 2^p registers. 4 ≤ p ≤ 16
   *              (the first hex-digit field is 16 bits); the exact-integer
   *              estimator needs p ≤ 11 (see [[hllEstimate]]).
   */
  def hllRegisters(df: DataFrame, groupCol: Column, valueCol: Column,
                   pBits: Int = 10, salt: String = "hll",
                   groupName: String = "group"): DataFrame = {
    val (bucket, rho) = hllBucketRho(valueCol, pBits, salt)
    df.select(groupCol.as(groupName), bucket.as("bucket"), rho.as("rho"))
      .groupBy(col(groupName), col("bucket")).agg(max(col("rho")).as("rho"))
  }

  /** The (bucket, rho) column derivation behind [[hllRegisters]] — shared
    * with the streaming register aggregations, which group by event-time
    * window instead of a column and must therefore build the aggregation
    * themselves. Pure codegen'd expressions, batch/stream agnostic. */
  def hllBucketRho(valueCol: Column, pBits: Int, salt: String): (Column, Column) = {
    require(pBits >= 4 && pBits <= 16, s"pBits must be in [4,16], got $pBits")
    val h = md5(concat(valueCol.cast("string"), lit(":" + salt)).cast("binary"))
    val bucket = conv(substring(h, 1, 4), 16, 10).cast("long") % (1L << pBits)
    val w = conv(substring(h, 5, 12), 16, 10).cast("long")
    val rho = when(w === 0L, lit(MaxRho))
      .otherwise(lit(MaxRho) - length(bin(w))).cast("int")
    (bucket, rho)
  }

  /** Merge two register tables (same pBits/salt): union + per-bucket max.
    * Associative and commutative, so stores fold in any batch order. */
  def hllMerge(a: DataFrame, b: DataFrame, groupName: String = "group"): DataFrame =
    a.unionByName(b).groupBy(col(groupName), col("bucket"))
      .agg(max(col("rho")).as("rho"))

  /**
   * Pairwise source-overlap report — the sketch-ALGEBRA payoff: for every
   * unordered group pair (a < b), the UNION's registers are just the
   * per-bucket max of the two sides (set union is the sketch's native
   * merge), and inclusion-exclusion turns three cardinality estimates
   * into an overlap estimate: |A ∩ B| ≈ |A| + |B| − |A∪B|. "Which crawl
   * duplicates which" over G sources from G sketch tables — the exact
   * answer would be a G-way corpus self-join.
   *
   * Output per pair: (`source_a`, `source_b`, `n_registers`, `sum_rho`,
   * `est_raw_e6` — the union sketch's integer replay columns, engine-
   * exact) plus `est_union`, `est_a`, `est_b`, `est_overlap` (corrected
   * doubles; overlap clamps at 0). Overlap precision is the DIFFERENCE of
   * estimates — absolute error ~1.04·√(|A|+|B|)/√m — so size m to the
   * overlap magnitudes that matter.
   *
   * Scale: the pair table is G² rows of group labels and each group's
   * registers replicate G−1 times (≤ G²·2^p rows total) — report-sized by
   * contract (a report over 10³ sources is ~10⁶·2^p rows, still sketch
   * territory; for 10⁶ sources, report on the pairs you care about, not
   * all of them).
   */
  def hllUnionPairs(registers: DataFrame, pBits: Int = 10,
                    groupName: String = "group"): DataFrame = {
    val groups = registers.select(col(groupName)).distinct()
    val pairs = groups.select(col(groupName).as("source_a"))
      .crossJoin(groups.select(col(groupName).as("source_b")))
      .filter(col("source_a") < col("source_b"))
    val regs = registers.select(col(groupName).as("__g"), col("bucket"), col("rho"))
    val unioned = pairs.join(regs, col("__g") === col("source_a"))
      .unionByName(pairs.join(regs, col("__g") === col("source_b")))
      .groupBy(col("source_a"), col("source_b"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
    val perPair = hllEstimateBy(unioned, pBits, Seq("source_a", "source_b"))
      .withColumnRenamed("est", "est_union")
    val single = hllEstimate(registers, pBits, groupName)
      .select(col(groupName), col("est"))
    perPair
      .join(single.select(col(groupName).as("source_a"), col("est").as("est_a")),
        "source_a")
      .join(single.select(col(groupName).as("source_b"), col("est").as("est_b")),
        "source_b")
      .withColumn("est_overlap",
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")))
  }

  /**
   * Per-group cardinality estimates from a register table.
   *
   * `est_raw_e6` is the raw HLL estimator floor(10^6 · α_m·m²/Σ2^-M_j) in
   * EXACT integer arithmetic, replayable in any engine with 128-bit
   * integers: the register sum is scaled by 2^49 so each term 2^(49-rho)
   * is an integer (absent buckets contribute 2^49), and α_m = 0.7213 /
   * (1 + 1.079/m) is carried as the exact rational 7213000·m /
   * (10000·(1000·m+1079)). All factors stay under 10^38 for p ≤ 11 —
   * hence the tighter bound here than in [[hllRegisters]].
   *
   * `est` is the user-facing corrected estimate (double): linear counting
   * m·ln(m/V) when the raw estimate is below 2.5m and V>0 registers are
   * still zero — the standard small-range correction. It is NOT hash-
   * matched across engines (ln is libm-dependent); driver queries pin an
   * accuracy invariant on it instead. Known accuracy band: cardinalities
   * between ~2.5m and ~5m fall past the linear-counting switch but still
   * carry the raw estimator's positive bias (up to ~20% — the gap
   * HyperLogLog++ closes with empirical tables); outside that band the
   * error is the classic 1.04/√m. Size pBits so the cardinalities you
   * care about sit below 2m or above 5m.
   *
   * @return one row per group: (group, n_registers, sum_rho, est_raw_e6, est)
   */
  def hllEstimate(registers: DataFrame, pBits: Int = 10,
                  groupName: String = "group"): DataFrame =
    hllEstimateBy(registers, pBits, Seq(groupName))

  /** [[hllEstimate]] over a composite group key (e.g. the pair keys of
    * [[hllUnionPairs]]). */
  def hllEstimateBy(registers: DataFrame, pBits: Int,
                    groupNames: Seq[String]): DataFrame = {
    require(pBits >= 7 && pBits <= 11,
      s"exact-integer estimator needs pBits in [7,11], got $pBits")
    val m = 1L << pBits
    // numerator 10^6 * 7213000 * m^3 * 2^49  (≤ 3.5e37 at p=11)
    val num = (BigInt(1000000) * 7213000 * BigInt(m).pow(3) * (BigInt(1) << 49))
    val d1 = 10000L * (1000L * m + 1079L) // alpha denominator, constant
    registers
      .groupBy(groupNames.map(col): _*)
      .agg(count(lit(1)).as("n_registers"),
        sum(col("rho")).cast("long").as("sum_rho"),
        sum(expr(s"shiftleft(cast(1 as bigint), $MaxRho - rho)"))
          .cast("long").as("__nz"))
      // absent buckets carry rho=0 ⇒ 2^49 each
      .withColumn("__n", col("__nz") + (lit(m) - col("n_registers")) * (1L << 49))
      .withColumn("est_raw_e6",
        expr(s"cast('$num' as decimal(38,0)) div " +
          s"(cast($d1 as decimal(38,0)) * cast(__n as decimal(38,0)))"))
      .withColumn("__zero", lit(m) - col("n_registers"))
      .withColumn("est",
        when(col("__zero") > 0 &&
             col("est_raw_e6") <= lit(2.5e6 * m),
          lit(m.toDouble) * log(lit(m.toDouble) / col("__zero")))
          .otherwise(col("est_raw_e6") / lit(1e6)))
      .drop("__nz", "__n", "__zero")
  }

  /** Build (or overwrite) a persisted HLL store: the register table as
    * parquet, one file per group region. Re-ingesting a batch is
    * [[hllMerge]] with the stored table + overwrite — sketch size, never
    * corpus size, is what's rewritten. */
  def buildHllStore(df: DataFrame, groupCol: Column, valueCol: Column,
                    path: String, pBits: Int = 10, salt: String = "hll"): Unit =
    hllRegisters(df, groupCol, valueCol, pBits, salt)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Fold a new batch into a persisted HLL store (read-merge-rewrite of
    * sketch-sized state; the historical corpus is never touched). A
    * missing store bootstraps from the batch alone, so streaming ingest
    * needs no separate initialization step. Crash-safe: the merged table
    * is STAGED to `<path>.tmp` while the old store is still intact, and
    * only then swapped in (delete + rename through the path's own Hadoop
    * filesystem — works on hdfs/s3a, not just local disk); a crash inside
    * the swap window leaves the full merged store recoverable at the
    * staging path. */
  def mergeIntoHllStore(batch: DataFrame, groupCol: Column, valueCol: Column,
                        path: String, pBits: Int = 10, salt: String = "hll"): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, path)
    val fresh = hllRegisters(batch, groupCol, valueCol, pBits, salt)
    if (!storeExists(spark, path)) {
      fresh.repartition(1).write.mode("overwrite").parquet(path)
    } else {
      stagedSwap(spark, path)(tmp =>
        hllMerge(spark.read.parquet(path), fresh)
          .repartition(1).write.mode("overwrite").parquet(tmp))
    }
  }

  /**
   * Column profiler — the `DESCRIBE`-grade data-quality report, sketch-
   * powered: one output row per requested column with row count, null
   * count, the HLL distinct estimate (integer replay columns + corrected
   * double), and typed min/max rendered as strings. The first look at an
   * unfamiliar 100 TB table, costing one multi-column pass for all basic
   * stats (the row count is computed once, not per column) plus one
   * column-pruned pass per column for its distinct-count registers.
   *
   * Nulls are excluded from the distinct estimate (a null is the absence
   * of a value, counted separately in `n_null`); min/max are computed on
   * the column's own type BEFORE the string render, so numeric columns
   * order numerically, not lexicographically.
   */
  def profile(df: DataFrame, cols: Seq[String], pBits: Int = 10,
              salt: String = "hll"): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    // ONE multi-column pass for every column's basic stats (count is
    // shared); the row is k columns × 3 scalars — driver-bounded by
    // construction, materialized once instead of re-scanned per column
    val aggs = count(lit(1)).as("n") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"__nn_$c"),
      min(col(c)).cast("string").as(s"__min_$c"),
      max(col(c)).cast("string").as(s"__max_$c")))
    val b = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val est = hllEstimate(
        hllRegisters(df.filter(col(c).isNotNull), lit(c), col(c), pBits, salt),
        pBits)
      // LEFT join: an all-null (or empty) column has no registers, but its
      // report row must still appear — n_registers 0, estimator fields
      // NULL, n_null carrying the whole story (matches the SQL-replay
      // shape, where the aggregate over zero registers yields one row)
      spark.range(1).select(lit(c).as("group"),
          lit(b.getAs[Long]("n")).as("n"),
          lit(b.getAs[Long](s"__nn_$c")).as("n_null"),
          lit(b.getAs[String](s"__min_$c")).as("min_v"),
          lit(b.getAs[String](s"__max_$c")).as("max_v"))
        .join(est, Seq("group"), "left")
        .withColumn("n_registers", coalesce(col("n_registers"), lit(0L)))
    }.reduce(_.unionByName(_))
      .withColumnRenamed("group", "column")
      .select(col("column"), col("n"), col("n_null"), col("n_registers"),
        col("sum_rho"), col("est_raw_e6"), col("est"), col("min_v"), col("max_v"))
  }

  /** Read an HLL store written as `batch_id=` partitions (the streaming
    * telemetry layout) or flat, folding all partitions into one register
    * table — the fold IS the sketch merge, over sketch-sized rows. */
  def readHllStore(spark: org.apache.spark.sql.SparkSession, path: String,
                   groupName: String = "group"): DataFrame =
    spark.read.parquet(path)
      .groupBy(col(groupName), col("bucket")).agg(max(col("rho")).as("rho"))

  /** Read a CMS store (batch-partitioned or flat), folding per-batch
    * counters by the sketch's sum merge. */
  def readCmsStore(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))

  /** Existence through the path's OWN filesystem — a java.io.File check
    * would be permanently false on hdfs://s3a:// and silently turn every
    * merge into a from-scratch bootstrap that discards history. */
  private def storeExists(spark: org.apache.spark.sql.SparkSession,
                          path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Complete a swap interrupted between delete and rename: if the main
    * store is gone but a COMMITTED staging directory survives, the staging
    * copy IS the store (it holds the full merged history) — rename it in.
    * Without this, the next merge's bootstrap branch would overwrite the
    * only surviving copy with just its own batch. */
  private def recoverStaging(spark: org.apache.spark.sql.SparkSession,
                             path: String): Unit =
    if (!storeExists(spark, path) && storeExists(spark, path + ".tmp")) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true) // partial leftovers
      require(fs.rename(new org.apache.hadoop.fs.Path(path + ".tmp"),
        new org.apache.hadoop.fs.Path(path)),
        s"recoverStaging: rename $path.tmp -> $path failed")
    }

  /** Write the replacement store to `<path>.tmp` via `write`, then swap it
    * into place (delete old, rename staging). The old store stays intact
    * until the staged copy is fully committed (_SUCCESS present); the only
    * crash window is delete-before-rename, and there the staged directory
    * still holds the complete merged result. */
  private def stagedSwap(spark: org.apache.spark.sql.SparkSession,
                         path: String)(write: String => Unit): Unit = {
    val tmp = path + ".tmp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    write(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)),
      s"stagedSwap: rename $tmp -> $path failed; the merged store is intact at $tmp")
  }

  // ---------------------------------------------------------------------
  // Count-Min sketch
  // ---------------------------------------------------------------------

  /**
   * Count-Min counter table over a weighted key column: `depth` rows of
   * `width` counters; key k adds its weight to counter (i, h_i(k)) for
   * each row i, where h_i(k) = first 48 bits of md5(i:salt:k) mod width.
   *
   * Built as: exact per-key partial counts (one map-side-combined groupBy —
   * the explode factor `depth` applies to DISTINCT keys, not occurrences),
   * then a groupBy over at most depth·width counter cells. Counters merge
   * across batches by SUM — the other classic mergeable sketch shape.
   *
   * Point estimates OVERCOUNT only: est(k) = min_i counter(i, h_i(k)) ≥
   * true(k), with the excess bounded by colliding mass. depth=4,
   * width=2048 bounds the expected excess by total/2048 per row with 4
   * independent chances — the standard (ε=e/w, δ=e^-d) contract.
   */
  def cmsCounters(df: DataFrame, keyCol: Column, weightCol: Column,
                  depth: Int = 4, width: Int = 2048,
                  salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val perKey = df.select(keyCol.cast("string").as("__k"), weightCol.as("__w"))
      .groupBy(col("__k")).agg(sum(col("__w")).cast("long").as("__cnt"))
    perKey
      .select(explode(cmsCells(col("__k"), depth, width, salt)).as("rc"),
        col("__cnt"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(sum(col("__cnt")).as("cnt"))
  }

  /** h_i(k): first 48 md5 bits of "i:salt:k", mod width. */
  def cmsCol(key: Column, row: Int, width: Int, salt: String): Column =
    conv(substring(md5(concat(lit(s"$row:$salt:"), key).cast("binary")), 1, 12),
      16, 10).cast("long") % width

  /** The full depth-row cell array for a key — ONE definition of the cell
    * derivation shared by [[cmsCounters]], [[cmsEstimate]], and the
    * streaming windowed sketch, so a hash/layout change can never make
    * one site silently stop matching the others. */
  def cmsCells(key: Column, depth: Int, width: Int, salt: String): Column =
    array((0 until depth).map(i =>
      struct(lit(i).as("row"), cmsCol(key, i, width, salt).as("col"))): _*)

  /** Merge two counter tables (same depth/width/salt): union + per-cell sum. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("row"), col("col")).agg(sum(col("cnt")).as("cnt"))

  /**
   * Point estimates for a set of candidate keys against a counter table:
   * est(k) = min over rows of the counter each h_i(k) lands in. The
   * counter table is depth·width rows — broadcast by size, so the corpus-
   * sized candidate side never shuffles for this join. The counter table
   * is SPARSE (untouched cells have no row), so the join is a LEFT join
   * with absent cells counting 0 — a candidate key the sketch never saw
   * correctly estimates 0 whenever any of its cells is empty, instead of
   * inheriting the min of only its colliding cells (or vanishing).
   */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, keyCol: Column,
                  depth: Int = 4, width: Int = 2048,
                  salt: String = "cms"): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    val c = counters.select(col("row").as("__crow"), col("col").as("__ccol"),
      col("cnt"))
    keys.select(keyCol.cast("string").as("key"))
      .distinct()
      .select(col("key"), explode(cmsCells(col("key"), depth, width, salt)).as("rc"))
      .join(broadcast(c),
        col("rc.row") === col("__crow") && col("rc.col") === col("__ccol"), "left")
      .groupBy(col("key")).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /**
   * Heavy hitters: candidate keys whose Count-Min estimate reaches
   * `threshold`. Sound (never misses a true heavy hitter — estimates only
   * overcount); the candidate set is the batch's distinct keys, so at
   * corpus scale the sketch answers from the CURRENT batch's vocabulary
   * plus the persisted counters of all history.
   */
  def cmsHeavyHitters(counters: DataFrame, candidates: DataFrame, keyCol: Column,
                      threshold: Long, depth: Int = 4, width: Int = 2048,
                      salt: String = "cms"): DataFrame =
    cmsEstimate(counters, candidates, keyCol, depth, width, salt)
      .filter(col("est") >= threshold)

  /** Persist a CMS counter table (sketch-sized: ≤ depth·width rows). */
  def buildCmsStore(df: DataFrame, keyCol: Column, weightCol: Column,
                    path: String, depth: Int = 4, width: Int = 2048,
                    salt: String = "cms"): Unit =
    cmsCounters(df, keyCol, weightCol, depth, width, salt)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Fold a new batch into a persisted CMS store (read-merge-rewrite of
    * depth·width rows; history is never rescanned). A missing store
    * bootstraps from the batch alone; the rewrite goes through the same
    * staged swap as [[mergeIntoHllStore]]. */
  def mergeIntoCmsStore(batch: DataFrame, keyCol: Column, weightCol: Column,
                        path: String, depth: Int = 4, width: Int = 2048,
                        salt: String = "cms"): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, path)
    val fresh = cmsCounters(batch, keyCol, weightCol, depth, width, salt)
    if (!storeExists(spark, path)) {
      fresh.repartition(1).write.mode("overwrite").parquet(path)
    } else {
      stagedSwap(spark, path)(tmp =>
        cmsMerge(spark.read.parquet(path), fresh)
          .repartition(1).write.mode("overwrite").parquet(tmp))
    }
  }

  // ---------------------------------------------------------------------
  // HDR-style quantile histogram (the third mergeable sketch: MAX merges
  // HLL, SUM merges CMS and this histogram)
  // ---------------------------------------------------------------------

  /**
   * Log-bucket id for a NON-NEGATIVE e6-fixed-point value (HdrHistogram's
   * bucketing, integer-exact): values < 64 get their own bucket (exact);
   * larger values keep 5 bits of mantissa after the leading bit, so every
   * bucket's relative width is ≤ 1/32 (~3.1% worst-case quantile error).
   *
   *   msb    = length(bin(v))            (= floor(log2 v) + 1)
   *   bucket = 64 + (msb−7)·32 + ((v >> (msb−6)) & 31)
   *
   * `bin`/shift/mask evaluate identically in Spark and DuckDB, so the SQL
   * oracle replays bucketing bit-for-bit. Negative input is a contract
   * violation and raises (silently landing negatives in the two's-
   * complement top bucket would corrupt every quantile above them).
   */
  def hdrBucket(v: Column): Column =
    when(v < 0, raise_error(concat(lit("hdrBucket: negative value "), v.cast("string"))))
      .otherwise(when(v < 64, v).otherwise(
        lit(64L) + (length(bin(v)) - 7).cast("long") * 32L +
          call_function("shiftright", v, length(bin(v)) - 6).bitwiseAND(lit(31L))))

  /** Inclusive lower bound of a bucket (its representative value for
    * quantile reporting) — the exact inverse of [[hdrBucket]]'s floor. */
  def hdrLowerBound(bucket: Column): Column =
    when(bucket < 64, bucket).otherwise(
      call_function("shiftleft",
        (bucket - 64).bitwiseAND(lit(31L)) + 32L,
        ((bucket - 64) / 32L).cast("int") + 1))

  /**
   * Histogram counts per group: (group, bucket, cnt) — one map-side-
   * combined groupBy whose key space is bounded by groups × ~2k buckets,
   * so the shuffle is sketch-sized at any corpus size. `valueE6` is the
   * caller's e6 fixed-point LONG (quantize doubles as
   * `round(value * 1e6)` so the oracle's double arithmetic matches).
   */
  def histCounts(df: DataFrame, groupCol: Column, valueE6: Column): DataFrame =
    df.select(groupCol.as("group"), hdrBucket(valueE6).as("bucket"))
      .groupBy("group", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merge two histogram tables: SUM per (group, bucket). */
  def histMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("group", "bucket").agg(sum("cnt").as("cnt"))

  /**
   * Quantile estimates from a histogram: for each percentile p (integer,
   * 1..100) the smallest bucket whose cumulative count reaches
   * `ceil(p·total/100)`, reported as the bucket's lower bound (≤ 1/32
   * relative error by construction). The only window is partitioned by
   * `group` and ordered over that group's ≤ ~2k bucket rows — never a
   * global window; the target join is group-keyed.
   *
   * Output: (group, p, bucket, lb_e6).
   */
  def histQuantiles(counts: DataFrame, ps: Seq[Int]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got $ps")
    // both the running and the group-total sum ride the SAME group
    // partitioning (one shuffle, no self-join); the |ps|-way explode
    // happens on the ≤ ~2k bucket rows per group, never on raw data
    val byBucket = org.apache.spark.sql.expressions.Window
      .partitionBy("group").orderBy("bucket")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("group")
    counts
      .withColumn("cum", sum(col("cnt")).over(byBucket))
      .withColumn("total", sum(col("cnt")).over(whole))
      .withColumn("p", explode(lit(ps.toArray)))
      .filter(col("cum") >= expr("(p * total + 99) div 100"))
      .groupBy("group", "p").agg(min(col("bucket")).as("bucket"))
      .withColumn("lb_e6", hdrLowerBound(col("bucket")))
  }

  /** Persist a histogram store (sketch-sized rows, like the HLL/CMS
    * stores). */
  def buildHistStore(df: DataFrame, groupCol: Column, valueE6: Column,
                     path: String): Unit =
    histCounts(df, groupCol, valueE6)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Fold a batch into a persisted histogram store — read-merge-rewrite
    * of sketch-sized state through the same crash-safe staged swap as
    * [[mergeIntoHllStore]]; a missing store bootstraps from the batch. */
  def mergeIntoHistStore(batch: DataFrame, groupCol: Column, valueE6: Column,
                         path: String): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, path)
    val fresh = histCounts(batch, groupCol, valueE6)
    if (!storeExists(spark, path)) {
      fresh.repartition(1).write.mode("overwrite").parquet(path)
    } else {
      stagedSwap(spark, path)(tmp =>
        histMerge(spark.read.parquet(path), fresh)
          .repartition(1).write.mode("overwrite").parquet(tmp))
    }
  }

  /** Read a histogram store (batch-partitioned or flat), folding by the
    * sketch's SUM merge. */
  def readHistStore(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("group"), col("bucket")).agg(sum(col("cnt")).as("cnt"))

  /**
   * Percentile outlier gate — the telemetry put to work: keep rows whose
   * value reaches their group's p-th-percentile bucket in a (typically
   * persisted) histogram. The thresholds are ≤ one row per group
   * ([[histQuantiles]] output), broadcast against the stream of rows —
   * a pure map-side filter at any input size, and the cut is the decoded
   * bucket lower bound, so the rule is integer-exact and SQL-replayable.
   * The classic "alert on above-p99 latency" / "quarantine outlier-sized
   * documents" shape with the threshold FROZEN at histogram-build time.
   */
  def histOutliers(df: DataFrame, groupCol: Column, valueE6: Column,
                   counts: DataFrame, p: Int): DataFrame = {
    val th = histQuantiles(counts, Seq(p))
      .select(col("group").as("__hg"), col("lb_e6").as("p_lb_e6"))
    df.withColumn("__g", groupCol).withColumn("v_e6", valueE6)
      .join(broadcast(th), col("__g") === col("__hg"))
      .filter(col("v_e6") >= col("p_lb_e6"))
      .drop("__g", "__hg")
  }

  // ---------------------------------------------------------------------
  // Bloom filter (the fourth merge monoid: HLL merges by MAX, CMS and the
  // histogram by SUM, the Bloom bitset by bitwise OR)
  // ---------------------------------------------------------------------

  /**
   * The k bit positions of a key: position_i = first 48 md5 bits of
   * "i:salt:key" mod mBits — the [[cmsCol]] derivation pointed at one
   * shared bit space instead of per-row counter arrays. Replayable in any
   * engine with md5 (the same contract as every other sketch here), and
   * the k hashes are independent by salt-index, the standard partitioned-
   * hash construction.
   */
  def bloomPositions(key: Column, mBits: Long, k: Int,
                     salt: String = "bloom"): Column = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(mBits >= 64 && mBits <= (1L << 40),
      s"mBits must be in [64, 2^40], got $mBits")
    array((0 until k).map(i =>
      conv(substring(md5(concat(lit(s"$i:$salt:"), key.cast("string"))
        .cast("binary")), 1, 12), 16, 10).cast("long") % mBits): _*)
  }

  /**
   * Word-packed Bloom bitset rows `(word, bits)` for a key column: bit p
   * lives at bit `p % 64` of word `p div 64`. The table is at most
   * ceil(mBits/64) rows NO MATTER how many keys were added (m = 2^23 bits
   * ⇒ 131072 rows ≈ 2 MB) — that fixed size is what makes the membership
   * join broadcastable at any reference-set cardinality, where a join
   * against the raw reference set would shuffle the probed corpus.
   * Duplicate keys are free (OR is idempotent) and the map-side partial
   * `bit_or` collapses each input partition to ≤ m/64 rows before the one
   * word-keyed shuffle.
   */
  def bloomWords(df: DataFrame, keyCol: Column, mBits: Long, k: Int,
                 salt: String = "bloom"): DataFrame =
    df.select(explode(bloomPositions(keyCol, mBits, k, salt)).as("__p"))
      .select(expr("__p div 64").as("word"),
        call_function("shiftleft", lit(1L), (col("__p") % 64).cast("int")).as("__m"))
      .groupBy(col("word")).agg(expr("bit_or(__m)").as("bits"))

  // ---- counting Bloom filter (DELETABLE membership) ----
  // The plain Bloom bitset cannot forget — a set bit may be shared. The
  // counting variant stores per-cell INSERTION COUNTS as replay-safe
  // `cells/batch_id=` segments (one (cell, n) row per touched cell;
  // deletion = a negative segment in the reserved negative batch-id
  // range), and membership tests against the cells whose folded count is
  // still positive — so the decontamination/membership gate joins the
  // takedown family: removing a benchmark or opted-out key takes effect
  // without rebuilding the filter. Same md5 positions as the plain
  // Bloom ⇒ the SQL oracle replays membership exactly. CONTRACT (the
  // classic CBF contract): delete only keys previously inserted, at most
  // as many times as inserted — the store cannot detect a violation.

  /** Freeze the hash space: mBits, k, salt — written once, enforced by
    * every append/delete/probe reading it back. */
  def initCountingBloomStore(spark: org.apache.spark.sql.SparkSession,
                             path: String, mBits: Long, k: Int,
                             salt: String = "bloom"): Unit = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(mBits >= 64 && mBits <= (1L << 40),
      s"mBits must be in [64, 2^40], got $mBits")
    graft.sources.Sidecar.writeText(spark, path + "/_graft_cbloom_params",
      s"$mBits $k $salt")
  }

  private def cbloomParams(spark: org.apache.spark.sql.SparkSession,
                           path: String): (Long, Int, String) = {
    val Array(m, k, salt) = graft.sources.Sidecar
      .readText(spark, path + "/_graft_cbloom_params").trim.split(" ")
    (m.toLong, k.toInt, salt)
  }

  private def cbloomCounts(batch: DataFrame, keyCol: Column, mBits: Long,
                           k: Int, salt: String): DataFrame =
    batch.select(explode(bloomPositions(keyCol, mBits, k, salt)).as("cell"))
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))

  /** Append one key batch's per-cell insertion counts as segment
    * `batchId` (replays overwrite only their own partition). */
  def appendCountingBloomBatch(batch: DataFrame, keyCol: Column,
                               path: String, batchId: Long): Unit = {
    require(batchId >= 0,
      s"appendCountingBloomBatch: batchId must be >= 0, got $batchId")
    val (m, k, salt) = cbloomParams(batch.sparkSession, path)
    cbloomCounts(batch, keyCol, m, k, salt)
      .repartitionByRange(col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$path/cells/batch_id=$batchId")
  }

  /** Forget previously-inserted keys: their counts land as a NEGATIVE
    * segment the read-time fold cancels exactly (see the CBF contract
    * above). */
  def deleteFromCountingBloom(batch: DataFrame, keyCol: Column,
                              path: String, batchId: Long): Unit = {
    require(batchId >= 0,
      s"deleteFromCountingBloom: batchId must be >= 0, got $batchId")
    val (m, k, salt) = cbloomParams(batch.sparkSession, path)
    batch.select(explode(bloomPositions(keyCol, m, k, salt)).as("cell"))
      .groupBy(col("cell")).agg((-count(lit(1))).as("n"))
      .repartitionByRange(col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("overwrite").parquet(s"$path/cells/batch_id=${-batchId - 1}")
  }

  /**
   * Membership probe against the LIVE cells (folded count > 0): adds
   * `flagName` — true iff all k of the key's cells are live, i.e. the
   * key may be in the remaining (post-deletion) set, with the plain
   * Bloom's one-sided error. The live-cell table is bounded by mBits
   * (broadcast like the bitset-word table of the plain gate).
   */
  def countingBloomMightContain(df: DataFrame, keyCol: Column, path: String,
                                flagName: String = "might_contain"): DataFrame = {
    val spark = df.sparkSession
    val (m, k, salt) = cbloomParams(spark, path)
    val live = spark.read.parquet(path + "/cells")
      .groupBy(col("cell")).agg(sum(col("n")).as("n"))
      .filter(col("n") > 0).select(col("cell"))
    val withPos = df.withColumn("__cbp", bloomPositions(keyCol, m, k, salt))
    val joined = (0 until k).foldLeft(withPos) { (acc, i) =>
      acc.join(broadcast(live.select(col("cell").as(s"__cb$i"))),
        element_at(col("__cbp"), i + 1) === col(s"__cb$i"), "left")
    }
    val allSet = (0 until k).map(i => col(s"__cb$i").isNotNull).reduce(_ && _)
    joined.withColumn(flagName, allSet)
      .drop((0 until k).map(i => s"__cb$i") :+ "__cbp": _*)
  }

  /** Admit only rows whose key is (probably-not) in the remaining set —
    * the deletable decontamination gate. */
  def countingBloomGate(df: DataFrame, keyCol: Column, path: String): DataFrame =
    countingBloomMightContain(df, keyCol, path, "__cb_flag")
      .filter(!col("__cb_flag")).drop("__cb_flag")

  /** Compact a counting-Bloom store: fold every segment (insertions and
    * deletion negatives) into ONE live-cell segment at the reserved
    * compact id (Long.MinValue — outside both id spaces, so a fresh
    * stream restarting at batch 0 can never overwrite folded history).
    * Same staged-swap contract as the text-index compaction; probing is
    * identical before and after. */
  def compactCountingBloom(spark: org.apache.spark.sql.SparkSession,
                           path: String): Unit = {
    val params = graft.sources.Sidecar
      .readText(spark, path + "/_graft_cbloom_params")
    val tmp = path + ".tmp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    spark.read.parquet(path + "/cells")
      .groupBy(col("cell")).agg(sum(col("n")).as("n")).filter(col("n") > 0)
      .repartitionByRange(col("cell")).sortWithinPartitions(col("cell"))
      .write.mode("overwrite")
      .parquet(s"$tmp/cells/batch_id=${Long.MinValue}")
    graft.sources.Sidecar.writeText(spark, tmp + "/_graft_cbloom_params", params)
    graft.sources.Sidecar.markComplete(spark, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)),
      s"compactCountingBloom: rename $tmp -> $path failed; the compacted " +
      s"store is intact at $tmp")
  }

  /** Merge two word tables (same mBits/k/salt): union + per-word OR.
    * Associative, commutative, idempotent — stores fold in any batch
    * order, and re-merging a batch is harmless (exactly-once not
    * required of the ingest). */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))

  /** Persist a Bloom store (≤ mBits/64 rows). */
  def buildBloomStore(df: DataFrame, keyCol: Column, path: String,
                      mBits: Long, k: Int, salt: String = "bloom"): Unit =
    bloomWords(df, keyCol, mBits, k, salt)
      .repartition(1).write.mode("overwrite").parquet(path)

  /** Fold a batch into a persisted Bloom store — read-merge-rewrite of
    * bitset-sized state through the same crash-safe staged swap as
    * [[mergeIntoHllStore]]; a missing store bootstraps from the batch. */
  def mergeIntoBloomStore(batch: DataFrame, keyCol: Column, path: String,
                          mBits: Long, k: Int, salt: String = "bloom"): Unit = {
    val spark = batch.sparkSession
    recoverStaging(spark, path)
    val fresh = bloomWords(batch, keyCol, mBits, k, salt)
    if (!storeExists(spark, path)) {
      fresh.repartition(1).write.mode("overwrite").parquet(path)
    } else {
      stagedSwap(spark, path)(tmp =>
        bloomMerge(spark.read.parquet(path), fresh)
          .repartition(1).write.mode("overwrite").parquet(tmp))
    }
  }

  /** Read a Bloom store (batch-partitioned or flat), folding by the
    * sketch's OR merge. */
  def readBloomStore(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))

  /**
   * Membership probe: adds a boolean `might_contain` column — true iff
   * ALL k of the key's bits are set in `words`. No false negatives ever;
   * false positives at the classic (1 − e^(−k·n/m))^k rate, so size mBits
   * to the reference-set cardinality (k = 5, m = 20·n gives ~3·10⁻⁴).
   *
   * Plan shape: k LEFT broadcast joins of the fixed-size word table
   * against the probed stream (an absent word row means bit clear) — the
   * probe side NEVER shuffles, whatever its size. That is the entire
   * point of the sketch: membership against a billion-key reference set
   * costs a megabyte broadcast per executor, not a corpus-wide join.
   */
  def bloomMightContain(df: DataFrame, keyCol: Column, words: DataFrame,
                        mBits: Long, k: Int, salt: String = "bloom",
                        flagName: String = "might_contain"): DataFrame = {
    val withPos = df.withColumn("__bp", bloomPositions(keyCol, mBits, k, salt))
    val joined = (0 until k).foldLeft(withPos) { (acc, i) =>
      val w = words.select(col("word").as(s"__w$i"), col("bits").as(s"__b$i"))
      acc.join(broadcast(w),
        expr(s"element_at(__bp, ${i + 1}) div 64") === col(s"__w$i"), "left")
    }
    val allSet = (0 until k).map { i =>
      coalesce(col(s"__b$i").bitwiseAND(
        call_function("shiftleft", lit(1L),
          (element_at(col("__bp"), i + 1) % 64).cast("int"))) =!= 0L,
        lit(false))
    }.reduce(_ && _)
    joined.withColumn(flagName, allSet)
      .drop((0 until k).flatMap(i => Seq(s"__w$i", s"__b$i")) :+ "__bp": _*)
  }

  /**
   * Decontamination gate: KEEP rows that cannot be in the reference set.
   * One-sided by construction — every true member is dropped (no false
   * negatives), and a false positive costs a kept-anyway row of recall at
   * the documented FPR, never contamination leaking through. The shape
   * benchmark decontamination needs at 100 TB: the eval-set fingerprints
   * are a fixed-size bitset every executor holds, not a join target.
   */
  def bloomGate(df: DataFrame, keyCol: Column, words: DataFrame,
                mBits: Long, k: Int, salt: String = "bloom"): DataFrame =
    bloomMightContain(df, keyCol, words, mBits, k, salt, "__bloom_hit")
      .filter(!col("__bloom_hit")).drop("__bloom_hit")
}
