package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Repartition}

/**
 * Logical-plan twin of `graft.operators.Dedup.spread` for the rewrite
 * rules (r15, guide §2/§6): the bucket/cell-replicate rewrites emit
 * `Join(Generate(explode…, l), Generate(explode…, r))`, and when Spark
 * broadcasts one side the OTHER side's explode+join+refine fuses into a
 * single codegen stage whose task count is the raw scan's partition
 * count — measured at sf1 as 1-3 runnable workers carrying a ~60 s
 * interval join (8-core vs 32-core ratio ≈ 1.0: the work was serial, so
 * cores did not matter). Wrapping an under-partitioned, exchange-free
 * child in a RoundRobin repartition to session parallelism moves only
 * the raw input rows and gives the fused stage real parallelism.
 *
 * Same provable no-op contract as the operator-side spread: only plans
 * whose PHYSICAL form is exchange-free (scan → narrow chain, any number
 * of leaves — a union concatenates its legs' partitions) with total leaf
 * partitions below `defaultParallelism` are wrapped; anything already
 * shuffled, or wide enough, passes through untouched — so at production
 * partition counts this never fires. The probe plans the child
 * physically (`sparkPlan`, pre-AQE — no job is submitted).
 */
private[plans] object SpreadNarrow {
  def apply(spark: SparkSession, child: LogicalPlan): LogicalPlan =
    try {
      val par = spark.sparkContext.defaultParallelism
      val phys = spark.sessionState.executePlan(child).sparkPlan
      val exchangeFree = phys.find(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.Exchange]).isEmpty
      val leaves = phys.collectLeaves()
      if (exchangeFree && leaves.nonEmpty) {
        // leaf execute() builds the scan RDD lazily — no job is submitted
        val n = leaves.map(_.execute().getNumPartitions).sum
        if (n < par) Repartition(par, shuffle = true, child) else child
      } else child
    } catch { case _: Throwable => child }
}
