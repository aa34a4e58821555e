package graft

import graft.functions.GeoOps
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests of the predicate kernel (SURVEY §5 plan): interval algebra
 * and predicate symmetry laws over 500 seeded random spatio-temporal
 * objects, checked directly against [[GeoOps.relate]] — the single
 * evaluation path every expression routes through.
 */
class PropertySpec extends AnyFunSuite {

  private val allOps =
    Seq(GeoOps.INTERSECTS, GeoOps.CONTAINS, GeoOps.CONTAINEDBY, GeoOps.COVERS, GeoOps.COVEREDBY)

  private def sto(x: Double, y: Double, t: Option[(Long, Option[Long])]): GenericInternalRow = {
    val g = GeoOps.pointWkb(x, y)
    t match {
      case None => new GenericInternalRow(Array[Any](g, null, null))
      case Some((s, e)) => new GenericInternalRow(Array[Any](g, Long.box(s), e.map(Long.box).orNull))
    }
  }

  private val rnd = new scala.util.Random(42)
  private def genSto(): GenericInternalRow = {
    val x = rnd.nextInt(21).toDouble - 10 // small domain => frequent collisions
    val y = rnd.nextInt(21).toDouble - 10
    val t = rnd.nextInt(4) match {
      case 0 => None
      case 1 => val s = rnd.nextInt(100).toLong; Some((s, Some(s)))          // instant
      case 2 => val s = rnd.nextInt(100).toLong; Some((s, Some(s + rnd.nextInt(50)))) // closed
      case _ => Some((rnd.nextInt(100).toLong, None))                        // open
    }
    sto(x, y, t)
  }
  private val samples = Seq.fill(500)((genSto(), genSto()))

  test("contains/containedBy and covers/coveredBy are inverse relations") {
    samples.foreach { case (a, b) =>
      assert(GeoOps.relate(a, b, GeoOps.CONTAINS) == GeoOps.relate(b, a, GeoOps.CONTAINEDBY))
      assert(GeoOps.relate(a, b, GeoOps.COVERS) == GeoOps.relate(b, a, GeoOps.COVEREDBY))
    }
  }

  test("intersects is symmetric") {
    samples.foreach { case (a, b) =>
      assert(GeoOps.relate(a, b, GeoOps.INTERSECTS) == GeoOps.relate(b, a, GeoOps.INTERSECTS))
    }
  }

  test("reflexivity: intersects always; contains/covers unless open-ended time") {
    samples.map(_._1).foreach { a =>
      assert(GeoOps.relate(a, a, GeoOps.INTERSECTS))
      // an open-ended containee is contained/covered by nothing — its end is
      // undefined (reference Interval.scala:37-38; covers shares the gate)
      val openEnd = !a.isNullAt(1) && a.isNullAt(2)
      assert(GeoOps.relate(a, a, GeoOps.CONTAINS) == !openEnd)
      assert(GeoOps.relate(a, a, GeoOps.COVERS) == !openEnd)
    }
  }

  test("mixed temporal presence is always false; containment implies intersection") {
    var mixedSeen = 0
    samples.foreach { case (a, b) =>
      val aT = !a.isNullAt(1); val bT = !b.isNullAt(1)
      if (aT != bT) {
        mixedSeen += 1
        allOps.foreach(op => assert(!GeoOps.relate(a, b, op)))
      }
      if (GeoOps.relate(a, b, GeoOps.CONTAINS))
        assert(GeoOps.relate(a, b, GeoOps.INTERSECTS))
    }
    assert(mixedSeen > 50) // the law was actually exercised
  }

  test("distances: symmetry, non-negativity, identity") {
    samples.foreach { case (a, b) =>
      val d = GeoOps.centroidDistance(a, b)
      assert(d >= 0 && d == GeoOps.centroidDistance(b, a))
      // directed Hausdorff (reference shausdorff): non-negative, zero on self
      assert(GeoOps.hausdorffDistance(a, b) >= 0)
      assert(GeoOps.hausdorffDistance(a, a) == 0.0)
      assert(GeoOps.centroidDistance(a, a) == 0.0)
    }
  }
}
