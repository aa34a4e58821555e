package graft.operators

import graft.functions.{GeoOps, GraftFunctions, stf}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.locationtech.jts.geom.{Envelope, Geometry}
import org.locationtech.jts.index.strtree.{AbstractNode, Boundable, ItemBoundable, ItemDistance, STRtree}

/**
 * k-nearest-neighbor queries.
 *
 * Global kNN (the reference's kNN / knnTake / knnAgg / knn2 variants, which
 * all answer the same query — reference src/main/scala/org/apache/spark/
 * PlainSpatialRDDFunctions.scala:112-252) is expressed declaratively as
 * `ORDER BY distance LIMIT k`: Spark plans a TakeOrderedAndProject, which is
 * the per-partition-top-k + merge the reference hand-codes.
 *
 * kNN join: for every left row, its k nearest right rows. This
 * implementation broadcasts the right side and probes a per-partition JTS
 * STRtree (the index-accelerated broadcast strategy, reference
 * LiveIndexedSpatialRDDFunctions.scala:179-222). Unlike the reference's
 * per-right-partition k (no global re-merge — reference
 * SpatialKnnJoinRDD.scala:20-84, a documented semantics bug we do not copy),
 * results here are the true global k. Ties are resolved exactly: after the
 * tree's kNN pass we re-query everything within the k-th distance and order
 * by (distance, tieBreak).
 */
object KNN {

  /** Distance used throughout: euclidean between centroids — the reference's
    * default distance function (reference src/main/scala/dbis/stark/Distance.scala:118-128). */
  private def centroidDist(a: Geometry, b: Geometry): Double = {
    val ca = a.getCentroid; val cb = b.getCentroid
    val dx = ca.getX - cb.getX; val dy = ca.getY - cb.getY
    math.sqrt(dx * dx + dy * dy)
  }

  /**
   * Global kNN of `qry` within `df`. Adds `distName` with the centroid
   * distance; deterministic order via (distance, tieBreak...).
   */
  def knn(df: DataFrame, geo: Column, qry: Column, k: Int,
          distName: String = "dist", tieBreak: Seq[Column] = Nil): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    df.withColumn(distName, stf.st_centroid_distance(geo, qry))
      .orderBy(col(distName) +: tieBreak: _*)
      .limit(k)
  }

  private class CentroidItemDistance extends ItemDistance {
    override def distance(a: ItemBoundable, b: ItemBoundable): Double =
      centroidDist(a.getItem.asInstanceOf[(Geometry, Row)]._1,
                   b.getItem.asInstanceOf[(Geometry, Row)]._1)
  }

  /**
   * Broadcast kNN join: for each left row, the k nearest right rows by
   * centroid distance. Output = left.* ++ right.* ++ distName.
   *
   * @param tieBreak name of a numeric right-side column used to order equal
   *                 distances deterministically (null = arbitrary tie order).
   *
   * Scale: right side must fit in executor memory (same contract as any
   * broadcast join). For two large sides use [[SpatialJoin.distanceJoin]]
   * with a radius + window-rank instead.
   */
  /**
   * kNN join for TWO LARGE sides: candidates from the cell-replicated
   * within-distance join (radius bounds the search), then per-left-row
   * window rank by (distance, tieBreak). Scales as a shuffle join on grid
   * cells — no broadcast, no cartesian. Semantics: the k nearest neighbors
   * *within `radius`*; a left row with fewer than k in-radius neighbors
   * returns what exists (choose radius from data statistics, e.g. a
   * quantile of nearest-neighbor distances).
   */
  def knnJoinWithin(left: DataFrame, right: DataFrame, leftGeom: Column, rightGeom: Column,
                    leftId: Column, k: Int, radius: Double, cellSize: Double,
                    tieBreak: Column, distName: String = "knn_dist"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cands = SpatialJoin.distanceJoin(left, right, leftGeom, rightGeom, radius, cellSize)
      .withColumn(distName, stf.st_centroid_distance(leftGeom, rightGeom))
    val rn = row_number().over(
      Window.partitionBy(leftId).orderBy(col(distName), tieBreak))
    cands.withColumn("__rn", rn).filter(col("__rn") <= k).drop("__rn")
  }

  def knnJoin(left: DataFrame, right: DataFrame, leftGeom: String, rightGeom: String,
              k: Int, distName: String = "knn_dist", tieBreak: String = null): DataFrame = {
    GraftFunctions.register(left.sparkSession)
    val spark = left.sparkSession
    val rSchema = right.schema
    val rGeoIdx = rSchema.fieldIndex(rightGeom)
    val tieIdx = if (tieBreak == null) -1 else rSchema.fieldIndex(tieBreak)
    val lGeoIdx = left.schema.fieldIndex(leftGeom)
    val rightRows = right.collect()
    val bc = spark.sparkContext.broadcast(rightRows)
    val outSchema = StructType(left.schema.fields ++ rSchema.fields)
      .add(distName, org.apache.spark.sql.types.DoubleType, nullable = false)
    val kk = k

    left.mapPartitions { iter =>
      val rows = bc.value
      val entries: Array[(Geometry, Row)] = rows.map { r =>
        val sto = r.getStruct(rGeoIdx)
        (GeoOps.readGeom(sto.getAs[Array[Byte]](0)), r)
      }
      val tree = new STRtree()
      entries.foreach { case (g, r) => tree.insert(g.getEnvelopeInternal, (g, r)) }
      if (entries.nonEmpty) tree.build()
      val itemDist = new CentroidItemDistance

      // total order over any comparable tie-break value; never silently
      // collapses distinct values to "equal"
      def tieCompare(a: Any, b: Any): Int = (a, b) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x: Long, y: Long) => java.lang.Long.compare(x, y)
        case (x: Int, y: Int) => Integer.compare(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y)
        case (x: Float, y: Float) => java.lang.Float.compare(x, y)
        case (x: String, y: String) => x.compareTo(y)
        case (x, y) => x.toString.compareTo(y.toString)
      }

      iter.flatMap { lrow =>
        if (entries.isEmpty) Iterator.empty
        else {
          val lg = GeoOps.readGeom(lrow.getStruct(lGeoIdx).getAs[Array[Byte]](0))
          val nearest =
            if (entries.length <= kk) entries
            else {
              // pass 1: tree kNN for the k-th distance bound
              val approx = tree.nearestNeighbour(lg.getEnvelopeInternal, (lg, null: Row),
                itemDist, kk).asInstanceOf[Array[AnyRef]]
              val dk = approx.iterator
                .map(o => centroidDist(lg, o.asInstanceOf[(Geometry, Row)]._1)).max
              // pass 2: everything within dk (exact tie handling)
              val env = new Envelope(lg.getEnvelopeInternal); env.expandBy(dk)
              val cands = tree.query(env)
              val buf = new scala.collection.mutable.ArrayBuffer[(Geometry, Row)](cands.size())
              val it = cands.iterator()
              while (it.hasNext) buf += it.next().asInstanceOf[(Geometry, Row)]
              buf.toArray
            }
          val scored = nearest.map { case (g, r) =>
            (centroidDist(lg, g), if (tieIdx < 0) null else r.get(tieIdx), r)
          }
          java.util.Arrays.sort(scored, { (t1: (Double, Any, Row), t2: (Double, Any, Row)) =>
            val c = java.lang.Double.compare(t1._1, t2._1)
            if (c != 0) c else tieCompare(t1._2, t2._2)
          })
          scored.iterator.take(kk)
            .map { case (d, _, r) => Row.fromSeq(lrow.toSeq ++ r.toSeq :+ d) }
        }
      }
    }(Encoders.row(outSchema))
  }
}
