package graft.operators

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.{Column, DataFrame}

/**
 * Predicate filters over an stobj column — the `rdd.intersects(qry)` family
 * of the reference (reference src/main/scala/org/apache/spark/
 * PlainSpatialRDDFunctions.scala:92-109). Each is a plain Catalyst filter, so
 * predicate pushdown / partition pruning / whole-stage codegen apply.
 */
object SpatialOps {

  private def prep(df: DataFrame): DataFrame = { GraftFunctions.register(df.sparkSession); df }

  def intersects(df: DataFrame, col: Column, qry: Column): DataFrame =
    prep(df).filter(stf.st_intersects(col, qry))

  def contains(df: DataFrame, col: Column, qry: Column): DataFrame =
    prep(df).filter(stf.st_contains(col, qry))

  def containedBy(df: DataFrame, col: Column, qry: Column): DataFrame =
    prep(df).filter(stf.st_containedby(col, qry))

  def covers(df: DataFrame, col: Column, qry: Column): DataFrame =
    prep(df).filter(stf.st_covers(col, qry))

  def coveredBy(df: DataFrame, col: Column, qry: Column): DataFrame =
    prep(df).filter(stf.st_coveredby(col, qry))

  def withinDistance(df: DataFrame, col: Column, qry: Column, maxDist: Double): DataFrame =
    prep(df).filter(stf.st_within_distance(col, qry, org.apache.spark.sql.functions.lit(maxDist)))
}
