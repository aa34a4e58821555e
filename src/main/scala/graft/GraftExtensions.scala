package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session extension entry point: `--conf spark.sql.extensions=graft.GraftExtensions`
 * registers the st_* function library for pure-SQL users (reference parity:
 * src/main/scala/dbis/stark/sql/STARKSession.scala:19-27 injects its strategy
 * and functions the same way).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => plans.SpatialJoinRule)
    ext.injectOptimizerRule(_ => plans.RangeJoinRule)
    ext.injectOptimizerRule(_ => plans.AsOfJoinRule)
    ext.injectOptimizerRule(_ => plans.CellPruneRule)
  }
}
