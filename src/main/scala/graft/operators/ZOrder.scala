package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Z-order (Morton-curve) clustering for data-skipping layouts — the
 * generic-column counterpart of [[graft.sources.CellStore]]'s spatial
 * cells: sort a table along an interleaved-bit curve over k numeric
 * columns before writing, and every written file's per-column min/max
 * range becomes tight, so parquet row-group statistics prune scans that
 * filter on ANY prefix-free subset of those columns (the Delta/Iceberg
 * `OPTIMIZE ZORDER BY` layout rule, built from plain Spark).
 *
 * At 100 TB the effect is the difference between "a quality-gate filter
 * reads every byte" and "it reads the 2% of row groups whose stats
 * overlap" — for the columns a curation pipeline actually filters on
 * (quality score, token count, language score, timestamp).
 *
 * The key is pure integer built-ins (shifts and ORs — codegen'd, no UDF):
 * each column is scaled to `bits`-bit rank space by its global min/max
 * (one map-side agg pass, broadcast back), then bits interleave
 * round-robin. Rows with a null in any key column get a null key and
 * cluster together at the range start — documented, not an error.
 */
object ZOrder {

  /** Interleave `bits` bits of each quantized dim (dim 0 owns the least
    * significant lane): bit i of dim d lands at position `i·k + d`. */
  private[graft] def interleave(qs: Seq[Column], bits: Int): Column = {
    val k = qs.length
    val terms = for {
      i <- 0 until bits
      d <- 0 until k
    } yield shiftleft(shiftrightunsigned(qs(d), i).bitwiseAND(lit(1L)), i * k + d)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Morton key over `cols` given per-column (min, max) bounds: each
    * column scales linearly to [0, 2^bits), clamped (values outside the
    * bounds — possible when bounds come from a stale stats pass — saturate
    * instead of wrapping). `max == min` degenerates to rank 0. */
  private[graft] def mortonKey(cols: Seq[Column], mins: Seq[Column], maxs: Seq[Column],
                               bits: Int): Column = {
    val top = (1L << bits) - 1
    val qs = cols.zip(mins.zip(maxs)).map { case (c, (mn, mx)) =>
      val scaled = floor((c.cast("double") - mn) / (mx - mn) * top).cast("long")
      val clamped = least(greatest(scaled, lit(0L)), lit(top))
      when(mx > mn, clamped).otherwise(lit(0L))
    }
    interleave(qs, bits)
  }

  /**
   * Cluster `df` along the Z-curve over `cols`: range-repartition into
   * `partitions` output slices by Morton key, sort within each. Write the
   * result with any sink; each output file then covers a compact curve
   * segment, i.e. a tight min/max box in every keyed column.
   *
   * `k·bits` must stay under 63 (long key). The min/max stats pass is part
   * of the returned plan (a broadcast one-row cross join), so the whole
   * thing stays lazy and re-optimizes with the rest of the query.
   */
  def zorderBy(df: DataFrame, cols: Seq[String], bits: Int = 16,
               partitions: Int = 0): DataFrame = {
    require(cols.nonEmpty, "zorderBy: need at least one column")
    require(cols.size * bits <= 63,
      s"zorderBy: ${cols.size} cols × $bits bits exceeds the 63-bit key " +
      "(lower bits or drop a column)")
    require(!df.columns.exists(_.equalsIgnoreCase("__zkey")),
      "zorderBy: input must not contain a column named __zkey")
    val reserved = cols.flatMap(c => Seq(s"__zmin_$c", s"__zmax_$c"))
    require(!df.columns.exists(c => reserved.exists(c.equalsIgnoreCase)),
      "zorderBy: input must not contain __zmin_*/__zmax_* columns")
    val statAggs = cols.flatMap(c => Seq(
      min(col(c)).cast("double").as(s"__zmin_$c"),
      max(col(c)).cast("double").as(s"__zmax_$c")))
    val stats = df.agg(statAggs.head, statAggs.tail: _*)
    val keyed = df.crossJoin(broadcast(stats))
      .withColumn("__zkey", mortonKey(
        cols.map(col), cols.map(c => col(s"__zmin_$c")), cols.map(c => col(s"__zmax_$c")), bits))
      .drop(reserved: _*)
    val parted =
      if (partitions > 0) keyed.repartitionByRange(partitions, col("__zkey"))
      else keyed.repartitionByRange(col("__zkey"))
    parted.sortWithinPartitions(col("__zkey")).drop("__zkey")
  }

  /** [[zorderBy]] + parquet write: the persisted layout whose files carry
    * tight per-column stats for scan pruning. */
  def write(df: DataFrame, path: String, cols: Seq[String], bits: Int = 16,
            partitions: Int = 0): Unit =
    zorderBy(df, cols, bits, partitions).write.mode("overwrite").parquet(path)
}
