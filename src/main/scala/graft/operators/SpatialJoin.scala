package graft.operators

import graft.functions.{GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Join predicate enum (reference src/main/scala/dbis/stark/spatial/
  * PredicatesFunctions.scala:5-26). */
sealed abstract class JoinPredicate(val apply: (Column, Column) => Column)
object JoinPredicate {
  case object Intersects  extends JoinPredicate(stf.st_intersects)
  case object Contains    extends JoinPredicate(stf.st_contains)
  case object ContainedBy extends JoinPredicate(stf.st_containedby)
  case object Covers      extends JoinPredicate(stf.st_covers)
  case object CoveredBy   extends JoinPredicate(stf.st_coveredby)
}

/**
 * Spatio-temporal theta joins.
 *
 * The scale path is the cell-replicate equi-join: both sides explode the grid
 * cells covered by their geometry envelopes, Spark hash-joins on the cell id,
 * the exact predicate refines, and the reference-point rule (report a pair
 * only from the cell holding the lower-left corner of the envelope
 * intersection) removes duplicates without any post-join shuffle. This is the
 * declarative re-expression of the reference's grid-partitioned zipJoin +
 * distinct (reference src/main/scala/dbis/stark/spatial/SpatialJoinRDD.scala
 * and PlainSpatialRDDFunctions.scala:325-348); partition-pair pruning falls
 * out of the hash join automatically, and AQE handles skewed cells.
 *
 * The broadcast path (`broadcastJoin`) maps to BroadcastNestedLoopJoin —
 * right for small build sides (reference Plain:285-301).
 */
object SpatialJoin {

  /**
   * Cell-replicated spatial join.
   *
   * @param cellSize grid cell edge length in coordinate units; choose so an
   *                 average cell holds O(100-10k) rows at target scale.
   * Output: left columns ++ right columns (geometry columns included).
   */
  def join(left: DataFrame, right: DataFrame, leftCol: Column, rightCol: Column,
           pred: JoinPredicate, cellSize: Double): DataFrame = {
    GraftFunctions.register(left.sparkSession)
    val cs = lit(cellSize)
    val l = left.withColumn("__gcell_l", explode(stf.st_cells(leftCol, cs)))
    val r = right.withColumn("__gcell_r", explode(stf.st_cells(rightCol, cs)))
    l.join(r,
        l("__gcell_l") === r("__gcell_r") &&
        pred.apply(leftCol, rightCol) &&
        stf.st_ref_cell(leftCol, rightCol, cs, l("__gcell_l")))
      .drop("__gcell_l", "__gcell_r")
  }

  /** Within-distance join: pairs with geometry distance <= maxDist. */
  def distanceJoin(left: DataFrame, right: DataFrame, leftCol: Column, rightCol: Column,
                   maxDist: Double, cellSize: Double): DataFrame = {
    GraftFunctions.register(left.sparkSession)
    val cs = lit(cellSize)
    val l = left.withColumn("__gcell_l", explode(stf.st_cells(leftCol, cs, lit(maxDist))))
    val r = right.withColumn("__gcell_r", explode(stf.st_cells(rightCol, cs)))
    l.join(r,
        l("__gcell_l") === r("__gcell_r") &&
        stf.st_within_distance(leftCol, rightCol, lit(maxDist)) &&
        stf.st_ref_cell(leftCol, rightCol, cs, l("__gcell_l"), lit(maxDist)))
      .drop("__gcell_l", "__gcell_r")
  }

  /** Broadcast the (small) right side; Catalyst plans a BroadcastNestedLoopJoin. */
  def broadcastJoin(left: DataFrame, right: DataFrame, leftCol: Column, rightCol: Column,
                    pred: JoinPredicate): DataFrame = {
    GraftFunctions.register(left.sparkSession)
    left.join(broadcast(right), pred.apply(leftCol, rightCol))
  }
}
