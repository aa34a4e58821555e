package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Corpus-assembly primitives for training-data pipelines — the operations
 * that sit between dedup/quality scoring and the final shuffled dataset.
 * None exist in the reference (it is a spatio-temporal engine); they are
 * first-class here because a 100 TB document corpus needs them on the same
 * engine that already holds the data.
 *
 * All three are deterministic: re-running a pipeline over the same corpus
 * yields byte-identical splits/caps/flags, which is what makes ablations
 * and incremental re-builds reproducible.
 */
object Pipeline {

  /** 4-hex-digit upper bound for a cumulative fraction of the 16-bit hash
    * space — shared by [[assignSplit]] and its SQL oracle so both compare
    * against identical literals. */
  def hexBound(cumFraction: Double): String = {
    val v = math.round(cumFraction * 65536.0)
    if (v >= 65536L) "g" // lexicographically above every 4-hex-digit string
    else f"${v.toInt}%04x"
  }

  /**
   * Deterministic train/val/test (or arbitrary) split assignment: each row
   * is labelled by where the first 4 hex digits of md5(id ++ ":" ++ salt)
   * fall among the cumulative-fraction cut points. A pure map — no shuffle,
   * no RNG state, stable under repartitioning, appends, and reruns (the
   * split of a document never depends on which other documents exist).
   * Changing `salt` re-draws every assignment independently.
   *
   * @param fractions ordered (label, fraction); fractions must sum to ~1
   *                  (the final label absorbs rounding).
   */
  def assignSplit(df: DataFrame, idCol: Column, salt: String,
                  fractions: Seq[(String, Double)],
                  splitName: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "assignSplit needs at least one label")
    val total = fractions.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"fractions must sum to 1, got $total")
    val h = substring(md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary")), 1, 4)
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail.map(hexBound)
    val label = fractions.zip(cuts).init.foldRight(lit(fractions.last._1)) {
      case (((name, _), cut), rest) => when(h < lit(cut), name).otherwise(rest)
    }
    df.withColumn(splitName, label)
  }

  /**
   * Cap rows per group at `n`, keeping the first `n` in `order` — source
   * balancing / per-domain quotas. Two-phase so a hot group (one domain
   * holding half the corpus) never funnels through a single task:
   *
   *  1. rank within (group, input partition) — the shuffle key carries the
   *     partition id, so a hot group spreads over as many tasks as it had
   *     input partitions; every survivor set is a superset of the global
   *     top-n (any global top-n row is top-n within its own partition);
   *  2. rank the ≤ n·partitions survivors per group globally and keep n.
   *
   * `order` must be a total order within each group (use a unique id or
   * hash) — ties would make the cap nondeterministic.
   */
  def capPerGroup(df: DataFrame, group: Column, order: Column, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    // column resolution is case-insensitive — a caller column named like a
    // working column would be silently clobbered and dropped
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("__cap_pid") || c.equalsIgnoreCase("__cap_rn")),
      "capPerGroup: input must not contain columns named __cap_pid/__cap_rn")
    // partition id materialized via Project first: nondeterministic
    // expressions are not allowed inside a window spec directly
    val local = row_number().over(
      Window.partitionBy(group, col("__cap_pid")).orderBy(order))
    val global = row_number().over(Window.partitionBy(group).orderBy(order))
    df.withColumn("__cap_pid", spark_partition_id())
      .withColumn("__cap_rn", local).filter(col("__cap_rn") <= n)
      .withColumn("__cap_rn", global).filter(col("__cap_rn") <= n)
      .drop("__cap_rn", "__cap_pid")
  }

  /**
   * Deterministic per-group TOKEN budget: within each group, keep the
   * prefix of rows in `order` whose running `tokens` total stays within
   * `budget` — the downsampling knob when sources are balanced by token
   * count, not document count (the usual unit a training mix is specified
   * in). Once a group's running total passes the budget every later row is
   * dropped (the cumulative sum is monotone because tokens must be
   * positive).
   *
   * Two-phase like [[capPerGroup]], with one subtlety running sums have
   * and ranks don't: a dropped row's tokens still count toward later rows'
   * totals, so phase 1 may only truncate AFTER keeping each partition's
   * first budget-crossing row as a sum witness. Phase 1 keeps every row
   * whose EXCLUSIVE local prefix fits the budget — the fitting local
   * prefix plus the first local crosser. Any globally-dropped row then
   * still sees a > budget running total in phase 2: if some partition
   * truncated at or before it, that partition's surviving prefix alone
   * (ending in its crosser) already exceeds the budget; if none did, the
   * phase-2 sum equals the true one. Kept rows precede every crosser (the
   * true cumulative sum is monotone), so their totals are exact. A hot
   * group funnels at most budget/min(tokens)+1 rows per input partition
   * into the single-task phase, never its full row count.
   *
   * `order` must be a total order within each group; `tokens` must be > 0.
   */
  def tokenBudgetPerGroup(df: DataFrame, group: Column, order: Column,
                          tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("__tb_pid") || c.equalsIgnoreCase("__tb_sum")),
      "tokenBudgetPerGroup: input must not contain columns named __tb_pid/__tb_sum")
    val local = sum(tokens).over(
      Window.partitionBy(group, col("__tb_pid")).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val global = sum(tokens).over(
      Window.partitionBy(group).orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    df.withColumn("__tb_pid", spark_partition_id())
      // keep the fitting local prefix AND the first local crosser (witness)
      .withColumn("__tb_sum", local).filter(col("__tb_sum") - tokens <= budget)
      .withColumn("__tb_sum", global).filter(col("__tb_sum") <= budget)
      .drop("__tb_sum", "__tb_pid")
  }

  /**
   * Deterministic per-group sampling RATES — the epoch-mixing primitive: a
   * training mix upsamples starved sources (rate > 1 ⇒ whole copies plus a
   * hash-selected fractional copy) and downsamples abundant ones
   * (rate < 1 ⇒ keep iff the row's hash falls under the rate cut). Output
   * repeats each kept row with `copy` = 0..k-1 so downstream shuffling
   * treats copies as rows. A pure map + bounded explode: no shuffle, no RNG
   * state, append/rerun/repartition stable (same guarantees as
   * [[assignSplit]], same 4-hex-digit hash cuts so an external SQL oracle
   * compares identical literals).
   *
   * @param rates   per-group-value rate; groups not listed use `default`
   */
  def sampleByRate(df: DataFrame, group: Column, idCol: Column, salt: String,
                   rates: Map[String, Double], default: Double,
                   copyName: String = "copy"): DataFrame = {
    (rates.values ++ Seq(default)).foreach(r =>
      require(r >= 0, s"rates must be non-negative, got $r"))
    val h = substring(md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary")), 1, 4)
    val rate = rates.foldRight(lit(default)) { case ((g, r), rest) =>
      when(group === lit(g), r).otherwise(rest)
    }
    val whole = floor(rate).cast("long")
    // fractional part selects one extra copy for hash < hexBound(frac);
    // cuts are driver-computed literals, so the whole row stays codegen'd
    val cutFor = (r: Double) => hexBound(r - math.floor(r))
    val cut = rates.foldRight(lit(cutFor(default))) { case ((g, r), rest) =>
      when(group === lit(g), cutFor(r)).otherwise(rest)
    }
    val copies = whole + when(h < cut, 1L).otherwise(0L)
    df.withColumn("__sr_n", copies)
      .filter(col("__sr_n") >= 1) // sequence(0, -1) would descend — guard first
      .withColumn(copyName, explode(sequence(lit(0L), col("__sr_n") - 1)))
      .drop("__sr_n")
  }

  /**
   * Mixture resampling to target TOKEN weights — the step that turns "we
   * want the training mix 3:1:2 across these sources inside a B-token
   * budget" into per-row keep/duplicate decisions. With T_g the group's
   * current token count and w_g its weight, each group-g row gets expected
   * multiplicity r_g = (B·w_g)/(Σw·T_g), so group g's expected token mass
   * is exactly B·w_g/Σw regardless of how skewed the corpus is. Groups
   * absent from `weights` are dropped.
   *
   * Integer-exact: whole copies ⌊r_g⌋ come from Long division and the
   * fractional extra copy is selected by `hash·den < rem·65536` on the
   * row's 16-bit id hash — no floating point anywhere, so an external SQL
   * oracle replays the selection bit-for-bit. Scale shape: one group agg
   * whose result collects to the driver (bounded by the number of groups,
   * the same bound as [[sampleByRate]]'s rate map), then a pure codegen'd
   * map + bounded explode; no further shuffle.
   */
  def mixtureSample(df: DataFrame, group: Column, idCol: Column, tokens: Column,
                    salt: String, weights: Map[String, Long], budget: Long,
                    copyName: String = "copy"): DataFrame = {
    require(weights.nonEmpty, "mixtureSample: weights must be non-empty")
    weights.foreach { case (g, w) =>
      require(w >= 0, s"mixtureSample: negative weight for group $g")
      require(w == 0 || budget <= Long.MaxValue / w,
        s"mixtureSample: budget·weight overflows Long for group $g")
    }
    require(budget >= 0, s"mixtureSample: budget must be non-negative")
    require(!df.columns.exists(c => c.equalsIgnoreCase("__mx_n") ||
      c.equalsIgnoreCase(copyName)),
      s"mixtureSample: input must not contain __mx_n or $copyName")
    val wsum = weights.values.sum
    require(wsum > 0, "mixtureSample: at least one weight must be positive")
    val sums = df.filter(group.isin(weights.keys.toSeq: _*))
      .groupBy(group.as("__mx_g")).agg(sum(tokens).as("__mx_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toList
    // per-group integer parameters (num = B·w_g, den = Σw·T_g); the hash
    // comparison multiplies by 2^16, so den must leave those bits free
    val par = sums.flatMap { case (g, t) =>
      if (t <= 0) None
      else {
        val den = wsum * t
        require(den <= Long.MaxValue / 65536,
          s"mixtureSample: Σw·T_g ($den) for group $g overflows the 16-bit hash comparison")
        val num = budget * weights(g)
        Some((g, num / den, num % den, den))
      }
    }
    val hv = conv(substring(md5(concat(idCol.cast("string"), lit(":" + salt))
      .cast("binary")), 1, 4), 16, 10).cast("long")
    def chain(f: ((String, Long, Long, Long)) => Long, zero: Column): Column =
      par.foldRight(zero) { case (p, rest) =>
        when(group === lit(p._1), lit(f(p))).otherwise(rest)
      }
    val whole = chain(_._2, lit(null).cast("long")) // null ⇒ group not sampled
    val rem = chain(_._3, lit(0L))
    val den = chain(_._4, lit(1L))
    val copies = when(whole.isNull, 0L)
      .otherwise(whole + when(hv * den < rem * lit(65536L), 1L).otherwise(0L))
    df.withColumn("__mx_n", copies)
      .filter(col("__mx_n") >= 1) // sequence(0, -1) would descend — guard first
      .withColumn(copyName, explode(sequence(lit(0L), col("__mx_n") - 1)))
      .drop("__mx_n")
  }

  /**
   * Deterministic sequence packing — concat-and-chop into fixed token
   * windows, the layout step before pretraining: within each group, rows
   * are laid end-to-end in `order` and cut every `budget` tokens. Each row
   * gets the context window its first token lands in (`bin`) and its offset
   * inside that window (`bin_offset`); a row straddling a cut starts in
   * `bin` and continues into the next window(s), exactly like token-level
   * packing concatenates documents across boundaries.
   *
   * Scale shape: the exclusive running sum is a DISTRIBUTED prefix scan,
   * not a single-task-per-group window — rows are range-partitioned AND
   * sorted by (group, order), each partition scans locally in ONE
   * mapPartitions pass (genuine per-partition imperative state; a window
   * over (group, partition) would re-shuffle the full data a second time),
   * and per-partition totals (one row per partition × group slice,
   * collected to the driver — bounded by partition count, not data) provide
   * the carry-in offsets. A group holding half the corpus spreads over as
   * many tasks as the range partitioner gives it; the data shuffles exactly
   * once.
   *
   * `order` must be a total order within each group; `tokens` must be >= 0.
   */
  def packSequences(df: DataFrame, group: Column, order: Column,
                    tokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("__pk_pid") || c.equalsIgnoreCase("__pk_sum") ||
      c.equalsIgnoreCase("__pk_off") || c.equalsIgnoreCase("__pk_start") ||
      c.equalsIgnoreCase("__pk_t") || c.equalsIgnoreCase("__pk_gv")),
      "packSequences: input must not contain columns named __pk_pid/__pk_sum/__pk_off/__pk_start/__pk_t/__pk_gv")
    val spark = df.sparkSession
    // range-partition so partition order agrees with (group, order): every
    // row in partition i precedes every row of the same group in partition
    // j > i — the precondition for per-partition scans + carry-in offsets
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // materialize the tokens and group-key expressions as columns so the
    // row scan below reads them positionally
    val withKeys = df.withColumn("__pk_t", tokens.cast("long"))
      .withColumn("__pk_gv", group)
      .repartitionByRange(parts, group, order)
      .sortWithinPartitions(group, order)
    val gvIdx = withKeys.schema.fieldIndex("__pk_gv")
    val tIdx = withKeys.schema.fieldIndex("__pk_t")
    val outSchema = org.apache.spark.sql.types.StructType(
      withKeys.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("__pk_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__pk_sum", org.apache.spark.sql.types.LongType, nullable = true)))
    // one-pass inclusive prefix sum per (group slice, partition) — rows
    // arrive sorted by (group, order), so a slice change is a key change.
    // A null token count contributes nothing to the running sum and yields
    // a null bin for its own row (the window-sum formulation's behavior —
    // never a mid-stage crash).
    val scanned = withKeys.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var curG: Any = null
      var started = false
      var acc = 0L
      it.map { r =>
        val g = r.get(gvIdx)
        if (!started || !java.util.Objects.equals(g, curG)) {
          curG = g; acc = 0L; started = true
        }
        val sum: Any = if (r.isNullAt(tIdx)) null else { acc += r.getLong(tIdx); acc }
        org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq[Any](pid, sum))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      // pin ONE materialized partitioning: the totals action and the final
      // join must see the SAME range boundaries (they are sampled per
      // physical plan — see epochShuffle) and the same scan output
      .localCheckpoint()
    // carry-in per (group, partition) = sum of the group's totals in all
    // earlier partitions; the totals table is tiny (<= partitions × groups
    // crossing a boundary) so the scan runs on the driver. The slice total
    // is the max inclusive prefix — no second pass over the tokens column.
    val groupName = "__pk_g"
    val totals = scanned.groupBy(col("__pk_gv").as(groupName), col("__pk_pid"))
      .agg(max(col("__pk_sum")).as("__pk_tot"))
    val offRows = totals.collect()
      .groupBy(_.get(0))
      .iterator.flatMap { case (_, rows) =>
        rows.sortBy(_.getInt(1)).foldLeft((0L, List.empty[org.apache.spark.sql.Row])) {
          case ((acc, out), r) =>
            // a slice whose every token is null has a null max-prefix: it
            // contributes nothing to the carry
            val tot = if (r.isNullAt(2)) 0L else r.getLong(2)
            (acc + tot, org.apache.spark.sql.Row(r.get(0), r.getInt(1), acc) :: out)
        }._2
      }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      totals.schema.fields(0).copy(name = groupName),
      org.apache.spark.sql.types.StructField("__pk_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__pk_off", org.apache.spark.sql.types.LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    scanned
      .join(broadcast(offDf),
        col("__pk_gv") <=> offDf(groupName) && scanned("__pk_pid") === offDf("__pk_pid"))
      .drop(offDf("__pk_pid")).drop(groupName)
      // exclusive prefix; pure LONG arithmetic (a double division would lose
      // exactness past 2^53 total tokens — reachable at corpus scale)
      .withColumn("__pk_start", col("__pk_off") + col("__pk_sum") - col("__pk_t"))
      .withColumn("bin", expr(s"__pk_start DIV ${budget}L"))
      .withColumn("bin_offset", col("__pk_start") % budget)
      .drop("__pk_pid", "__pk_sum", "__pk_off", "__pk_start", "__pk_t", "__pk_gv")
  }

  /**
   * Deterministic epoch shuffle: an EXACT global shuffle rank (0-based,
   * gap-free) by md5(id ++ ":" ++ salt) — the reproducible alternative to
   * `orderBy(rand())` for laying out one training epoch. Changing `salt`
   * re-draws the whole permutation; the same salt replays it bit-identically
   * on any cluster size.
   *
   * Scale shape: a global window would rank in ONE task; instead rows are
   * range-partitioned AND sorted by the hash key — after which the
   * per-partition index comes narrowly from `monotonically_increasing_id`
   * (partition id in the upper bits, in-partition position in the lower 33)
   * and only the per-partition row counts travel to the driver for the
   * carry offsets. The data itself shuffles exactly once (the range
   * exchange); no window re-cluster, no single-task rank. Ties (md5
   * collisions) break by id, so the rank is total.
   */
  def epochShuffle(df: DataFrame, idCol: Column, salt: String,
                   rankName: String = "shuffle_rank"): DataFrame = {
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("__es_key") || c.equalsIgnoreCase("__es_pid") ||
      c.equalsIgnoreCase("__es_mid")),
      "epochShuffle: input must not contain columns named __es_key/__es_pid/__es_mid")
    val spark = df.sparkSession
    val key = md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    // localCheckpoint pins ONE materialized partitioning: range boundaries
    // are SAMPLED with a seed derived from the physical RDD id, so the
    // counts action and the final join would otherwise re-plan and may
    // range-partition DIFFERENTLY — collected offsets then disagree with
    // join-time partition ids (ranks shift / rows drop). Bit at sf >= 0.1.
    val keyed = df.withColumn("__es_key", key)
      .repartitionByRange(parts, col("__es_key"), idCol)
      .sortWithinPartitions(col("__es_key"), idCol)
      .withColumn("__es_mid", monotonically_increasing_id())
      .withColumn("__es_pid", shiftrightunsigned(col("__es_mid"), 33).cast("int"))
      .localCheckpoint()
    val counts = keyed.groupBy(col("__es_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__es_pid", "__es_off")
    keyed.join(broadcast(offDf), "__es_pid")
      .withColumn(rankName,
        col("__es_off") + col("__es_mid").bitwiseAND(lit((1L << 33) - 1)))
      .drop("__es_key", "__es_pid", "__es_mid", "__es_off")
  }

  /**
   * Exact per-group quantile gate: keep each group's top `keepNum/keepDen`
   * fraction of rows in `order` — the quality-filtering knob specified the
   * way mixes are ("keep the best quarter of each source"), with an EXACT
   * rank so the kept set is reproducible and oracle-checkable (an
   * approx-percentile threshold is neither). A row survives iff
   * rank·keepDen <= count·keepNum (integer arithmetic; rank is 1-based
   * within its group under `order`).
   *
   * Scale shape: the global rank is a distributed prefix count, not a
   * single-task-per-group window — rows are range-partitioned AND sorted by
   * (group, order), the in-partition position comes narrowly from
   * `monotonically_increasing_id` (no window re-cluster exchange — the
   * [[epochShuffle]] trick), and only per-(group, partition) counts and
   * min-ids travel to the driver for carry offsets — one row per (group,
   * partition) slice, sized by GROUP CARDINALITY plus at most one boundary
   * crossing per partition, never by data. The operator targets
   * per-source/per-domain gating (groups 10²–10⁶); the data itself
   * shuffles exactly once.
   *
   * `order` must be a total order within each group (e.g.
   * `score.desc, id` — pass the score DESCENDING to keep the best).
   */
  def quantileGate(df: DataFrame, group: Column, keepNum: Int, keepDen: Int,
                   order: Column*): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum,
      s"keep fraction must be in (0, 1]: got $keepNum/$keepDen")
    groupRanksTotals(df, group, order, "quantileGate")
      .filter(col("__qg_rank") * keepDen <= col("__qg_tot") * keepNum)
      .drop("__qg_rank", "__qg_tot")
  }

  /**
   * Exact per-group quantile-bucket labels — the CCNet-style head/middle/
   * tail split generalized: rows of each group are ranked under `order`
   * (1-based) and labelled `bucket = floor((rank-1)·nBuckets / count)`, so
   * bucket 0 holds the first ceil-or-floor(count/nBuckets) rows and every
   * bucket's size differs by at most one — an EXACT, reproducible
   * bucketing (an approx-percentile split is neither). Same distributed
   * prefix-count rank as [[quantileGate]] (one range shuffle, per-(group,
   * partition) carry offsets — never a single-task-per-group window).
   *
   * `order` must be a total order within each group (e.g. `score.desc,
   * id`); pass the score DESCENDING so bucket 0 is the head.
   */
  def quantileBuckets(df: DataFrame, group: Column, nBuckets: Int,
                      bucketName: String, order: Column*): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(!df.columns.exists(_.equalsIgnoreCase(bucketName)),
      s"quantileBuckets: input already has a column named $bucketName")
    val x = (col("__qg_rank") - 1) * nBuckets
    groupRanksTotals(df, group, order, "quantileBuckets")
      .withColumn(bucketName,
        ((x - pmod(x, col("__qg_tot"))) / col("__qg_tot")).cast("long"))
      .drop("__qg_rank", "__qg_tot")
  }

  /**
   * Deterministic exact-n global sample — the eval-holdout / debugging
   * carve-out: the `n` rows with the smallest md5(id:salt), ties by id.
   * A pure function of (corpus, salt, n): rerun-identical, and growing
   * `n` only ADDS rows (the hash order is fixed), so nested carve-outs
   * (1k ⊂ 10k ⊂ 100k) are consistent by construction. Distributed
   * TakeOrdered — k rows per partition to the driver, no global sort.
   */
  def sampleExact(df: DataFrame, idCol: Column, salt: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val h = md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
    df.withColumn("__se_h", h).orderBy(col("__se_h"), idCol).limit(n).drop("__se_h")
  }

  /**
   * Stratified exact-n carve-out: within EACH group, the `n` rows with the
   * smallest md5(id ++ ":" ++ salt) — the per-group twin of [[sampleExact]]
   * for balanced per-source holdouts, with the same reproducibility
   * contract: a row's hash depends only on (id, salt), so the sample is
   * append-stable (new rows can push others out, never reshuffle the
   * order), nested-consistent (the size-m sample is a prefix of the size-n
   * sample for m < n under the same salt), and independent of partitioning
   * and reruns. Selection is the two-phase [[capPerGroup]] rank, so a
   * group holding half the corpus never funnels into one task; ties
   * (md5 collisions) fall to the id.
   */
  def sampleExactPerGroup(df: DataFrame, group: Column, idCol: Column,
                          salt: String, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    val h = md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
    capPerGroup(df, group, struct(h, idCol), n)
  }

  /**
   * Curriculum ordering — easy-to-hard training schedules: rows are cut
   * into `stages` quality tiers (stage 0 = best under `score` descending,
   * via [[quantileBuckets]] with one global group) and then ordered by
   * (stage, md5(id:salt), id) — deterministic shuffling WITHIN a stage,
   * strict easy-before-hard ACROSS stages. Appends `stage` and
   * `curriculum_rank` (0-based, dense).
   *
   * Scale shape: two passes of the shared distributed-rank kernel. The
   * "group" is the whole corpus, which is exactly the case the kernel was
   * built for — a group spanning every partition costs one range shuffle
   * and per-partition carry offsets, never a single-task global window.
   */
  def curriculumOrder(df: DataFrame, idCol: Column, scoreCol: Column,
                      stages: Int, salt: String): DataFrame = {
    require(stages > 0, s"stages must be positive, got $stages")
    require(!df.columns.exists(c => c.equalsIgnoreCase("stage") ||
      c.equalsIgnoreCase("curriculum_rank") || c.toLowerCase.startsWith("__cu_")),
      "curriculumOrder: input must not contain stage/curriculum_rank/__cu_*")
    // pmod(id, 1) = a NON-FOLDABLE zero: the whole corpus is one "group".
    // A literal 0 would be read as a positional ORDER BY reference in the
    // kernel's sort and folded out of the range partitioning.
    val one = pmod(idCol, lit(1))
    val staged = quantileBuckets(df, one, stages, "stage",
      scoreCol.desc, idCol)
    val h = md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
    groupRanksTotals(staged.withColumn("__cu_h", h), one,
        Seq(col("stage"), col("__cu_h"), idCol), "curriculumOrder")
      .withColumn("curriculum_rank", col("__qg_rank") - 1)
      .drop("__qg_rank", "__qg_tot", "__cu_h")
  }

  /**
   * Round-robin source interleaving — batch diversity without sampling:
   * rows are ranked within their group by a deterministic md5 shuffle,
   * then globally ordered by (within-rank, group, id), so consecutive
   * positions cycle through the groups for as long as groups have rows
   * left (small sources exhaust first, exactly like dealing cards).
   * Appends `interleave_rank` (0-based, dense). A training loader reading
   * in this order never sees a long single-source run — the failure mode
   * of source-sorted corpora — while staying a pure function of
   * (corpus, salt).
   *
   * Two passes of the shared distributed-rank kernel (per-group, then
   * global) — one range shuffle each, no global window.
   */
  def interleaveBySource(df: DataFrame, idCol: Column, group: Column,
                         salt: String): DataFrame = {
    require(!df.columns.exists(c => c.equalsIgnoreCase("interleave_rank") ||
      c.toLowerCase.startsWith("__il_")),
      "interleaveBySource: input must not contain interleave_rank/__il_*")
    val h = md5(concat(idCol.cast("string"), lit(":" + salt)).cast("binary"))
    val within = groupRanksTotals(df.withColumn("__il_h", h), group,
        Seq(col("__il_h"), idCol), "interleaveBySource")
      .withColumnRenamed("__qg_rank", "__il_w")
      .drop("__qg_tot", "__il_h")
    groupRanksTotals(within, pmod(idCol, lit(1)),
        Seq(col("__il_w"), group, idCol), "interleaveBySource")
      .withColumn("interleave_rank", col("__qg_rank") - 1)
      .drop("__qg_rank", "__qg_tot", "__il_w")
  }

  /** The shared distributed-rank kernel behind [[quantileGate]] and
    * [[quantileBuckets]]: appends `__qg_rank` (1-based within the group
    * under `order`) and `__qg_tot` (the group's row count) via the
    * range-partition + prefix-count machinery documented on
    * [[quantileGate]]. Callers must drop both columns. */
  private def groupRanksTotals(df: DataFrame, group: Column,
                               order: Seq[Column], caller: String): DataFrame = {
    require(!df.columns.exists(c =>
      c.equalsIgnoreCase("__qg_pid") || c.equalsIgnoreCase("__qg_mid") ||
      c.equalsIgnoreCase("__qg_g") || c.equalsIgnoreCase("__qg_rank") ||
      c.equalsIgnoreCase("__qg_tot")),
      s"$caller: input must not contain __qg_* columns")
    require(order.nonEmpty, s"$caller needs at least one order column")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val sortKeys = group +: order
    // localCheckpoint pins ONE materialized partitioning — the counts
    // action and the final join must see the SAME sampled range boundaries
    // (see epochShuffle for the failure mode)
    val keyed = df.repartitionByRange(parts, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
      .withColumn("__qg_mid", monotonically_increasing_id())
      .withColumn("__qg_pid", shiftrightunsigned(col("__qg_mid"), 33).cast("int"))
      .localCheckpoint()
    // per-(group, partition) count + first id -> driver: global rank of a
    // row = (rows of its group in earlier partitions) + (mid - first mid
    // of its group slice) + 1. Rows within a partition are sorted by
    // (group, order), so mid offsets ARE in-slice ranks.
    val groupName = "__qg_g"
    val countsDf = keyed.groupBy(group.as(groupName), col("__qg_pid"))
      .agg(count(lit(1)).as("__qg_n"), min(col("__qg_mid")).as("__qg_min"))
    val counts = countsDf.collect()
    val offRows = counts.groupBy(_.get(0)).iterator.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      val total = sorted.map(_.getLong(2)).sum
      sorted.foldLeft((0L, List.empty[org.apache.spark.sql.Row])) {
        case ((acc, out), r) =>
          // rank = base + mid, with base = prior-count - slice-min-mid + 1
          (acc + r.getLong(2),
            org.apache.spark.sql.Row(r.get(0), r.getInt(1),
              acc - r.getLong(3) + 1L, total) :: out)
      }._2
    }.toSeq
    val offSchema = org.apache.spark.sql.types.StructType(Seq(
      countsDf.schema.fields(0).copy(name = groupName),
      org.apache.spark.sql.types.StructField("__qg_pid", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("__qg_base", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("__qg_tot", org.apache.spark.sql.types.LongType, nullable = false)))
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows, 1), offSchema)
    keyed
      .join(broadcast(offDf),
        group <=> offDf(groupName) && keyed("__qg_pid") === offDf("__qg_pid"))
      .drop(offDf("__qg_pid")).drop(groupName)
      .withColumn("__qg_rank", col("__qg_base") + col("__qg_mid"))
      .drop("__qg_pid", "__qg_mid", "__qg_base")
  }

  /**
   * Benchmark decontamination: corpus documents sharing at least
   * `minOverlap` distinct word n-gram shingles with a benchmark document.
   * Output (corpus id, benchmark id, overlap count) for every contaminated
   * pair — feed the distinct corpus ids to an anti-join to drop them.
   *
   * Scale shape: the benchmark side is small by nature (an eval set), so
   * its exploded shingle index is broadcast; the corpus side streams
   * map-side through the join — the only shuffle is the groupBy on the
   * *matching* (corpus, benchmark) pairs, a set bounded by contamination
   * itself, never by corpus size.
   */
  def contaminationPairs(corpus: DataFrame, corpusId: Column, corpusText: Column,
                         benchmark: DataFrame, benchId: Column, benchText: Column,
                         n: Int = 3, minOverlap: Int = 5): DataFrame = {
    require(minOverlap > 0, s"minOverlap must be positive, got $minOverlap")
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    def shingleIndex(df: DataFrame, id: Column, text: Column, idName: String) =
      df.select(id.as(idName), explode(TextAnalysis.shingles(text, n)).as("__shingle"))
    val c = shingleIndex(corpus, corpusId, corpusText, "doc_id")
    val b = shingleIndex(benchmark, benchId, benchText, "bench_id")
    c.join(broadcast(b), "__shingle")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("overlap"))
      .filter(col("overlap") >= minOverlap)
  }

  /**
   * DSIR importance scores (Xie et al., "Data Selection for Language Models
   * via Importance Resampling", arXiv:2302.03169): score every raw document
   * by how much its hashed n-gram feature distribution looks like a TARGET
   * corpus (the data you wish you had more of) relative to the raw corpus
   * itself. Features are unigrams plus space-joined bigrams, hashed into
   * `buckets` buckets with xxHash64(seed 42); the two corpora induce
   * add-one-smoothed bucket distributions p (target) and q (raw), and a
   * document's score sums its features' p/q bucket ratios.
   *
   * Determinism (the repo's oracle rule — no logs, no doubles): the paper's
   * per-feature log(p/q) is replaced by the e6-floored fixed-point ratio
   *
   *   ratio_e6(b) = floor(1e6 * ((T(b)+1) * (RR+B)) / ((R(b)+1) * (TT+B)))
   *
   * (T/R = target/raw bucket counts, TT/RR totals, B = buckets), so a
   * document's score is an exact integer any SQL engine reproduces
   * bit-for-bit. Summing ratios instead of log-ratios weighs strong target
   * buckets linearly rather than logarithmically — a documented surrogate
   * with the same hashed-feature architecture and the same "target-like
   * text up, raw-typical text down" ordering.
   *
   * `buckets` must be a power of two: the oracle replays the hash as an
   * unsigned 64-bit integer while Spark's xxhash64 is signed, and
   * pmod(signed, B) == unsigned % B exactly when B divides 2^64.
   *
   * Output: `raw`'s columns + `dsir_score_e6` (long; every document has at
   * least one feature, so no null scores).
   *
   * Scale shape: bucket-count tables are at most `buckets` rows (map-side-
   * combined groupBys — vocabulary pressure is absorbed by the hash), the
   * totals ride a broadcast one-row cross join, and the ratio table
   * broadcast-joins onto the raw feature stream (narrow), leaving ONE
   * corpus-sized shuffle: the per-document score aggregation keyed by id.
   * The target corpus is re-scanned once; nothing quadratic, no windows.
   *
   * CONTRACT: `idCol` non-null and unique in `raw` (the score joins back
   * on it).
   */
  def dsirScores(raw: DataFrame, rawId: Column, rawText: Column,
                 target: DataFrame, targetText: Column,
                 buckets: Int): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a positive power of two, got $buckets")
    require(!raw.columns.exists(c => c.toLowerCase.startsWith("__ds_") ||
      c.equalsIgnoreCase("dsir_score_e6")),
      "dsirScores: input must not contain __ds_* columns or the output " +
      "name dsir_score_e6")
    val rawFeats = dsirFeats(raw, rawId, rawText, buckets)
    val tgtFeats = dsirFeats(target, lit(0L), targetText, buckets)
    val (ratio, _) = dsirRatioAndTotals(rawFeats, tgtFeats, buckets)
    val scored = rawFeats
      .join(broadcast(ratio), "__ds_b")
      .groupBy(col("__ds_id"))
      .agg(sum(col("__ds_ratio")).cast("long").as("dsir_score_e6"))
    // left join + fill: a non-null text always yields >= 1 feature (split
    // of "" is [""]), but a NULL text row would otherwise vanish
    raw.join(scored, rawId === col("__ds_id"), "left")
      .drop("__ds_id")
      .na.fill(0L, Seq("dsir_score_e6"))
  }

  /**
   * Temperature-scaled mixture weights — the "alpha sampling" rule of
   * multilingual / multi-source training mixes (the exponent-smoothing
   * recipe of mBERT/XLM-R): a group's sampling weight is its token total
   * raised to alpha = 1/2^`sqrts`, computed as `sqrts` repeated square
   * roots. Upweights low-resource sources relative to proportional
   * sampling while preserving the size ordering; feed the collected
   * (group → weight) map into [[mixtureSample]] (weights are relative, so
   * the e6 scale cancels in the copy rate).
   *
   * Determinism across engines WITHOUT a fixed-point detour: IEEE 754
   * requires sqrt — unlike pow/ln/exp — to be correctly rounded, and the
   * final multiply by 1e6 rounds once more under the same rule, so
   * `weight_e6 = floor(1e6 · sqrt^[s](T_g))` is bit-identical in any IEEE
   * engine. pow(x, alpha) carries no such guarantee, which is why alpha is
   * restricted to 1/2^s (s=0 proportional, 1 the standard sqrt rule,
   * 2 quarter-power).
   *
   * Output: one row per group — `groupName`, `n_tokens`, `weight_e6`.
   * Scale shape: one map-side-combined group agg; output is group-bounded.
   */
  def temperatureWeights(df: DataFrame, group: Column, tokens: Column,
                         sqrts: Int = 1, groupName: String = "group"): DataFrame = {
    require(sqrts >= 0 && sqrts <= 4, s"sqrts must be in [0, 4], got $sqrts")
    val t = df.groupBy(group.as(groupName)).agg(sum(tokens).as("n_tokens"))
    val w = (0 until sqrts).foldLeft(col("n_tokens").cast("double"))((c, _) => sqrt(c))
    t.withColumn("weight_e6", floor(lit(1e6) * w).cast("long"))
  }

  /** e6 floor division in DECIMAL(38,0) — exact past int64 (same helper
    * contract as withBigramFluency). */
  private def dsirE6(a: Column, b: Column): Column = {
    val A = a.cast(org.apache.spark.sql.types.DecimalType(38, 0)) * 1000000L
    val B = b.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    ((A - pmod(A, B)) / B).cast(org.apache.spark.sql.types.DecimalType(38, 0))
  }

  /** Hashed DSIR features: unigrams ++ space-joined bigrams, one row per
    * feature INSTANCE (multiplicity matters for counts and scores), each
    * bucketed by pmod(xxHash64(feature), buckets). */
  private def dsirFeats(df: DataFrame, id: Column, text: Column,
                        buckets: Int): DataFrame = {
    val ws = TextAnalysis.tokens(text)
    val n = size(ws)
    val bigrams = zip_with(
      slice(ws, lit(1), greatest(n - 1, lit(0))),
      slice(ws, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    df.select(id.as("__ds_id"),
        explode(concat(ws, bigrams)).as("__ds_f"))
      .select(col("__ds_id"),
        pmod(xxhash64(col("__ds_f")), lit(buckets.toLong)).as("__ds_b"))
  }

  /** The bucket-ratio table (__ds_b, __ds_ratio decimal) over every bucket
    * the raw corpus hits, plus the 1-row totals frame (__ds_tt, __ds_rr).
    * Every bucket a raw document can hit is in the raw counts — the left
    * join loses nothing on the scoring path; target-only buckets never
    * score a raw document. */
  private def dsirRatioAndTotals(rawFeats: DataFrame, tgtFeats: DataFrame,
                                 buckets: Int): (DataFrame, DataFrame) = {
    val tCnt = tgtFeats.groupBy(col("__ds_b")).agg(count(lit(1)).as("__ds_t"))
    val rCnt = rawFeats.groupBy(col("__ds_b")).agg(count(lit(1)).as("__ds_r"))
    // coalesce: an EMPTY target (or raw) corpus sums to NULL — the smoothed
    // formula is still well-defined at T=0 (uniform p), so zero it instead
    // of nulling every ratio
    val totals = tCnt.agg(coalesce(sum(col("__ds_t")), lit(0L)).as("__ds_tt"))
      .crossJoin(rCnt.agg(coalesce(sum(col("__ds_r")), lit(0L)).as("__ds_rr")))
    val ratio = rCnt.join(tCnt, Seq("__ds_b"), "left")
      .na.fill(0L, Seq("__ds_t"))
      .crossJoin(broadcast(totals))
      .select(col("__ds_b"), dsirE6(
        (col("__ds_t") + 1) * (col("__ds_rr") + buckets.toLong),
        (col("__ds_r") + 1) * (col("__ds_tt") + buckets.toLong)).as("__ds_ratio"))
    (ratio, totals)
  }

  /**
   * Persist the DSIR model ([[dsirScores]]'s bucket-ratio table) — fit p/q
   * ONCE on reference raw/target corpora, score many batches or streams
   * against the FROZEN ratios (the DSIR deployment shape: a drifting
   * per-batch refit would make scores incomparable across batches).
   * Layout: `ratios` parquet range-sorted by bucket id + a
   * `_graft_dsir_stats` sidecar carrying (buckets, TT, RR) — enough to
   * reconstruct the smoothed default ratio for buckets the raw corpus
   * never hit. Same rebuild-crash contract as every other store.
   */
  def buildDsirStore(raw: DataFrame, rawText: Column,
                     target: DataFrame, targetText: Column,
                     buckets: Int, path: String): Unit = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a positive power of two, got $buckets")
    val spark = raw.sparkSession
    graft.sources.Sidecar.invalidateMarker(spark, path)
    val rawFeats = dsirFeats(raw, lit(0L), rawText, buckets)
    val tgtFeats = dsirFeats(target, lit(0L), targetText, buckets)
    val (ratio, totals) = dsirRatioAndTotals(rawFeats, tgtFeats, buckets)
    ratio.select(col("__ds_b").as("b"), col("__ds_ratio").cast("long").as("ratio_e6"))
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(path + "/ratios")
    val t = totals.collect()(0)
    graft.sources.Sidecar.writeText(spark, path + "/_graft_dsir_stats",
      s"$buckets ${t.getLong(0)} ${t.getLong(1)}")
    graft.sources.Sidecar.markComplete(spark, path)
  }

  /**
   * [[dsirScores]] against a [[buildDsirStore]] model: same integer math,
   * ratios joined from the store instead of recomputed. A batch feature
   * hashing to a bucket the store's raw corpus never saw scores the
   * smoothed default (T=0, R=0) ratio — reconstructed exactly from the
   * sidecar totals, so scoring the training corpora themselves reproduces
   * the live operator bit-for-bit. The ratio table is ≤ `buckets` rows by
   * construction — always broadcastable.
   */
  // ---- incremental (segmented) DSIR growth ----
  // The raw corpus a DSIR sampler scores against GROWS with the pipeline
  // (the target benchmark side is frozen). The segmented layout persists
  // COUNTS, not ratios — `target/` (b, t) written once at init, per-batch
  // `raw/batch_id=` (b, r) segments under the FROZEN bucket count — and
  // readers derive the smoothed ratio table at read time, so every score
  // equals a one-pass [[buildDsirStore]] over the accumulated raw corpus.
  // Deletion = negative raw-count segments in the reserved negative
  // batch-id range (the LM-store pattern; bigram features never cross
  // documents, so counts over disjoint docs are exactly additive).

  /** Freeze the target side + bucket count: write `target/` counts and
    * the params sidecar. Raw batches then accumulate via
    * [[appendDsirRawBatch]] / `EventStreams.ingestDsirRaw`. */
  def initDsirStore(target: DataFrame, targetText: Column, buckets: Int,
                    path: String): Unit = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a positive power of two, got $buckets")
    val spark = target.sparkSession
    graft.sources.Sidecar.writeText(spark, path + "/_graft_dsir_params",
      buckets.toString)
    dsirFeats(target, lit(0L), targetText, buckets)
      .groupBy(col("__ds_b")).agg(count(lit(1)).as("t"))
      .select(col("__ds_b").as("b"), col("t"))
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(path + "/target")
  }

  /** Append one raw batch's bucket counts as segment `batchId` (disjoint
    * docs across batches; replays overwrite only their own partition).
    * Refuses a [[buildDsirStore]] flat ratio store loudly. */
  def appendDsirRawBatch(batch: DataFrame, textCol: Column, path: String,
                         batchId: Long): Unit = {
    val spark = batch.sparkSession
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_dsir_stats"),
      s"appendDsirRawBatch: $path holds a buildDsirStore flat store whose " +
      "precomputed ratios cannot absorb appends — rebuild it segmented " +
      "(initDsirStore + appendDsirRawBatch) or keep rebuilding flat")
    require(batchId >= 0,
      s"appendDsirRawBatch: batchId must be >= 0, got $batchId")
    val buckets = graft.sources.Sidecar
      .readText(spark, path + "/_graft_dsir_params").trim.toInt
    dsirFeats(batch, lit(0L), textCol, buckets)
      .groupBy(col("__ds_b")).agg(count(lit(1)).as("r"))
      .select(col("__ds_b").as("b"), col("r"))
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(s"$path/raw/batch_id=$batchId")
  }

  /** Forget raw documents without a rebuild (the LM-store takedown
    * pattern): their bucket counts land as a NEGATIVE segment in the
    * reserved negative batch-id range, which the read-time fold cancels
    * exactly. CONTRACT: forget exactly documents previously appended,
    * each at most once. */
  def deleteFromDsirRaw(docs: DataFrame, textCol: Column, path: String,
                        batchId: Long): Unit = {
    val spark = docs.sparkSession
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_dsir_stats"),
      s"deleteFromDsirRaw: $path holds a buildDsirStore flat store — " +
      "takedown-by-append needs the segmented layout")
    require(batchId >= 0,
      s"deleteFromDsirRaw: batchId must be >= 0, got $batchId")
    val buckets = graft.sources.Sidecar
      .readText(spark, path + "/_graft_dsir_params").trim.toInt
    dsirFeats(docs, lit(0L), textCol, buckets)
      .groupBy(col("__ds_b")).agg((-count(lit(1))).as("r"))
      .select(col("__ds_b").as("b"), col("r"))
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(s"$path/raw/batch_id=${-batchId - 1}")
  }

  /** Compact a segmented DSIR store's raw side: fold every raw count
    * segment (appends and deletion negatives) into ONE segment at the
    * reserved compact id (Long.MinValue), dropping zero/negative cells;
    * target counts and the params sidecar carry over. Staged-swap
    * contract; scoring is identical before and after. */
  def compactDsirRaw(spark: org.apache.spark.sql.SparkSession,
                     path: String): Unit = {
    require(!graft.sources.Sidecar.exists(spark, path + "/_graft_dsir_stats"),
      s"compactDsirRaw: $path holds a buildDsirStore flat store — " +
      "already one ratio table, nothing to compact")
    val params = graft.sources.Sidecar
      .readText(spark, path + "/_graft_dsir_params")
    val tmp = path + ".tmp"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    spark.read.parquet(path + "/raw")
      .groupBy(col("b")).agg(sum(col("r")).as("r")).filter(col("r") > 0)
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(s"$tmp/raw/batch_id=${Long.MinValue}")
    spark.read.parquet(path + "/target")
      .repartitionByRange(col("b")).sortWithinPartitions(col("b"))
      .write.mode("overwrite").parquet(tmp + "/target")
    graft.sources.Sidecar.writeText(spark, tmp + "/_graft_dsir_params", params)
    graft.sources.Sidecar.markComplete(spark, tmp)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(path)),
      s"compactDsirRaw: rename $tmp -> $path failed; the compacted " +
      s"store is intact at $tmp")
  }

  /** The frozen scoring model of a store, whichever layout built it:
    * (buckets, defaultE6 for raw-absent buckets, the (b, ratio_e6) table).
    * Flat stores read their precomputed ratios + stats sidecar; segmented
    * stores fold the raw segments, join the frozen target counts, and
    * derive the SAME smoothed integer ratios — so a grown store scores
    * exactly like a one-pass build over the accumulated raw corpus. */
  private[graft] def loadDsirModel(spark: org.apache.spark.sql.SparkSession,
                                   path: String): (Int, Long, DataFrame) =
    if (graft.sources.Sidecar.exists(spark, path + "/_graft_dsir_stats")) {
      val Array(bStr, ttStr, rrStr) =
        graft.sources.Sidecar.readText(spark, path + "/_graft_dsir_stats").split(" ")
      val buckets = bStr.toInt
      val defaultE6 = (BigInt(rrStr.toLong + buckets) * 1000000 /
        BigInt(ttStr.toLong + buckets)).toLong
      (buckets, defaultE6, spark.read.parquet(path + "/ratios")
        .select(col("b").as("__ds_b"), col("ratio_e6").as("__ds_ratio")))
    } else {
      val buckets = graft.sources.Sidecar
        .readText(spark, path + "/_graft_dsir_params").trim.toInt
      val tCnt = spark.read.parquet(path + "/target")
        .select(col("b").as("__ds_b"), col("t").as("__ds_t"))
      val rCnt = spark.read.parquet(path + "/raw")
        .groupBy(col("b")).agg(sum(col("r")).as("__ds_r"))
        .filter(col("__ds_r") > 0) // deletion may cancel a bucket to zero
        .select(col("b").as("__ds_b"), col("__ds_r"))
      // two scalar totals — driver-size by construction
      val tt = tCnt.agg(coalesce(sum(col("__ds_t")), lit(0L))).head().getLong(0)
      val rr = rCnt.agg(coalesce(sum(col("__ds_r")), lit(0L))).head().getLong(0)
      val defaultE6 = (BigInt(rr + buckets) * 1000000 /
        BigInt(tt + buckets)).toLong
      val ratios = rCnt.join(tCnt, Seq("__ds_b"), "left")
        .na.fill(0L, Seq("__ds_t"))
        .select(col("__ds_b"), dsirE6(
            (col("__ds_t") + 1) * lit(rr + buckets.toLong),
            (col("__ds_r") + 1) * lit(tt + buckets.toLong))
          .cast("long").as("__ds_ratio")) // the flat store's ratio_e6 type
      (buckets, defaultE6, ratios)
    }

  def dsirScoresIndexed(df: DataFrame, idCol: Column, textCol: Column,
                        path: String): DataFrame = {
    require(!df.columns.exists(c => c.toLowerCase.startsWith("__ds_") ||
      c.equalsIgnoreCase("dsir_score_e6")),
      "dsirScoresIndexed: input must not contain __ds_* columns or the " +
      "output name dsir_score_e6")
    val spark = df.sparkSession
    val (buckets, defaultE6, ratios) = loadDsirModel(spark, path)
    val scored = dsirFeats(df, idCol, textCol, buckets)
      .join(broadcast(ratios), Seq("__ds_b"), "left")
      .groupBy(col("__ds_id"))
      .agg(sum(coalesce(col("__ds_ratio"), lit(defaultE6)))
        .cast("long").as("dsir_score_e6"))
    df.join(scored, idCol === col("__ds_id"), "left")
      .drop("__ds_id")
      .na.fill(0L, Seq("dsir_score_e6"))
  }

  /**
   * DSIR selection: keep the `n` raw documents most like the target —
   * [[dsirScores]] ranked by (score desc, id asc) with the distributed
   * TakeOrdered cut (k rows per partition to the driver, no global sort).
   * The tie-break on id makes the kept SET a pure function of the corpora.
   */
  def dsirSelect(raw: DataFrame, rawId: Column, rawText: Column,
                 target: DataFrame, targetText: Column,
                 buckets: Int, n: Int): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    dsirScores(raw, rawId, rawText, target, targetText, buckets)
      .orderBy(col("dsir_score_e6").desc, rawId)
      .limit(n)
  }

  /**
   * End-to-end benchmark decontamination: drop every corpus document that
   * [[contaminationPairs]] flags against the benchmark — the one-call form
   * of the standard eval-hygiene step. The flagged-id set is bounded by
   * contamination (≪ corpus), so the anti-join's build side stays small;
   * the corpus itself streams through one anti-join.
   */
  def decontaminate(corpus: DataFrame, corpusId: Column, corpusText: Column,
                    benchmark: DataFrame, benchId: Column, benchText: Column,
                    n: Int = 3, minOverlap: Int = 5): DataFrame = {
    val flagged = contaminationPairs(corpus, corpusId, corpusText,
        benchmark, benchId, benchText, n, minOverlap)
      .select(col("doc_id").as("__dc_flagged")).distinct()
    corpus.join(flagged, corpusId === col("__dc_flagged"), "left_anti")
  }

  /**
   * Snapshot diff: compare two corpus versions by id and content hash —
   * the audit step between crawl refreshes ("what changed since v1"):
   * one row per id present in either snapshot with status `added`
   * (new only), `removed` (old only), `changed` (both, different
   * content), or `unchanged`. One full-outer equi-join on the id; content
   * equality via md5 so the wide text column never shuffles.
   *
   * CONTRACT: ids unique within each snapshot (documents); duplicate ids
   * would cross-join inside the full-outer join.
   */
  def snapshotDiff(oldDf: DataFrame, oldId: Column, oldContent: Column,
                   newDf: DataFrame, newId: Column, newContent: Column): DataFrame = {
    // presence flags, NOT hash-nullness: a row with NULL content is still
    // PRESENT in its snapshot (md5(null) is null and would masquerade as
    // absence); the content compare is null-safe so null==null is
    // 'unchanged' and null vs text is 'changed'
    val o = oldDf.select(oldId.as("id"), md5(oldContent.cast("binary")).as("__h_old"),
      lit(true).as("__in_old"))
    val n = newDf.select(newId.as("id"), md5(newContent.cast("binary")).as("__h_new"),
      lit(true).as("__in_new"))
    o.join(n, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__h_old") <=> col("__h_new"), "unchanged")
          .otherwise("changed"))
      .select(col("id"), col("status"))
  }

  /**
   * Fuzzy decontamination: drop corpus documents whose n-gram Jaccard to
   * ANY benchmark document reaches p/q — the near-duplicate complement of
   * [[decontaminate]]'s exact-overlap rule, catching paraphrased benchmark
   * leakage that shares most-but-not-all shingles. Flagging is
   * [[graft.operators.Dedup.minhashCrossPairs]] (banded candidates, exact
   * refine); the kept set is the anti-join, so kept == corpus − flagged
   * exactly.
   */
  def decontaminateFuzzy(corpus: DataFrame, corpusId: Column, corpusText: Column,
                         benchmark: DataFrame, benchId: Column, benchText: Column,
                         n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                         p: Int = 4, q: Int = 5): DataFrame = {
    val flagged = graft.operators.Dedup.minhashCrossPairs(
        corpus, corpusId, corpusText, benchmark, benchId, benchText,
        n, numHashes, bands, p, q)
      .select(col("id_a").as("__dc_flagged")).distinct()
    corpus.join(flagged, corpusId === col("__dc_flagged"), "left_anti")
  }

  /**
   * Exact per-group percentile VALUES — the corpus-report twin of
   * [[quantileGate]]: for each group and each requested percent p, the
   * value at 1-based rank floor(p·(count−1)/100)+1 under `order` (the
   * nearest-rank definition on the sorted sequence; p=0 → min, p=50 →
   * lower median, p=100 → max). One row per (group, percent) — exact,
   * reproducible, and oracle-checkable, unlike approx_percentile. Same
   * distributed prefix-count rank kernel as the gate (one range shuffle,
   * no per-group window task); the percent match is a bounded explode of
   * `percents.size` literals per row, filtered to the hit ranks.
   *
   * Output: group (as `groupName`), `percent`, `value` (the order column's
   * value, as long).
   */
  def groupPercentiles(df: DataFrame, group: Column, value: Column,
                       percents: Seq[Int],
                       groupName: String = "group"): DataFrame = {
    require(percents.nonEmpty, "groupPercentiles needs at least one percent")
    require(percents.forall(p => p >= 0 && p <= 100),
      s"percents must be in [0, 100], got $percents")
    val ranked = groupRanksTotals(
      df.select(group.as(groupName), value.cast("long").as("value")),
      col(groupName), Seq(col("value")), "groupPercentiles")
    ranked
      .withColumn("percent", explode(array(percents.distinct.sorted.map(lit(_)): _*)))
      .filter(col("__qg_rank") ===
        ((col("percent") * (col("__qg_tot") - 1) -
          pmod(col("percent") * (col("__qg_tot") - 1), lit(100))) / 100).cast("long") + 1)
      .select(col(groupName), col("percent"), col("value"))
  }

  /**
   * Length-bucketed batching ("smart batching"): sort the corpus by token
   * count ascending (ties by id — a total order, so assignments are
   * rerun-identical) and cut it into fixed-count batches of `batchSize`
   * consecutive rows. Rows inside a batch have near-equal lengths, so
   * padding every row to its batch's max wastes far fewer tokens than
   * random batching — the standard efficiency lever when a trainer pads to
   * the longest sequence in a batch. The last batch may be partial.
   *
   * Output: input columns + `batch_id` (0-based, dense) +
   * `batch_max_tokens` (the batch's padding target).
   *
   * Scale shape: the global rank is the [[epochShuffle]] prefix-count trick
   * — one range exchange keyed by (tokens, id) with in-partition positions
   * from `monotonically_increasing_id` (narrow) plus driver-collected
   * per-partition counts (one row per partition, never data-sized) — NOT a
   * single-task global window. The per-batch max travels through a groupBy
   * on batch_id (n/batchSize keys, uniform by construction) and a hash
   * join back. The checkpoint pins one sampled range partitioning so the
   * counts action and the final join agree (same caveat as epochShuffle).
   */
  def lengthBucketBatches(df: DataFrame, idCol: Column, tokensCol: Column,
                          batchSize: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(!df.columns.exists(c =>
      c.toLowerCase.startsWith("__lb_") || c.equalsIgnoreCase("batch_id") ||
      c.equalsIgnoreCase("batch_max_tokens")),
      "lengthBucketBatches: input must not contain __lb_* columns or the " +
      "output names batch_id/batch_max_tokens")
    val spark = df.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism, 1)
    val keyed = df
      .withColumn("__lb_tok", tokensCol.cast("long"))
      .repartitionByRange(parts, col("__lb_tok"), idCol)
      .sortWithinPartitions(col("__lb_tok"), idCol)
      .withColumn("__lb_mid", monotonically_increasing_id())
      .withColumn("__lb_pid", shiftrightunsigned(col("__lb_mid"), 33).cast("int"))
      .localCheckpoint()
    val counts = keyed.groupBy(col("__lb_pid")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__lb_pid", "__lb_off")
    val ranked = keyed.join(broadcast(offDf), "__lb_pid")
      .withColumn("batch_id", floor(
        (col("__lb_off") + col("__lb_mid").bitwiseAND(lit((1L << 33) - 1)))
          / batchSize).cast("long"))
    val batchMax = ranked.groupBy(col("batch_id"))
      .agg(max(col("__lb_tok")).as("batch_max_tokens"))
    ranked.join(batchMax, "batch_id")
      .drop("__lb_tok", "__lb_mid", "__lb_pid", "__lb_off")
  }
}
