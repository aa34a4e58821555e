package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(s)
    s
  }
}

/**
 * Unit tests of the st_* expression semantics — ports of the reference's
 * STObjectTest / InstantTest / IntervalTest contracts (reference
 * src/test/scala/dbis/stark), expressed as SQL one-liners.
 */
class SpatialFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def b(sql: String): Boolean =
    spark.sql(s"SELECT $sql").collect()(0).getBoolean(0)
  private def d(sql: String): Double =
    spark.sql(s"SELECT $sql").collect()(0).getDouble(0)

  private val poly = "st_geomfromwkt('POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))')"

  test("spatial predicates: point vs polygon") {
    assert(b(s"st_contains($poly, st_point(5.0, 5.0))"))
    assert(!b(s"st_contains($poly, st_point(15.0, 5.0))"))
    // boundary: contains=false, covers=true, intersects=true
    assert(!b(s"st_contains($poly, st_point(0.0, 5.0))"))
    assert(b(s"st_covers($poly, st_point(0.0, 5.0))"))
    assert(b(s"st_intersects($poly, st_point(0.0, 5.0))"))
    assert(b(s"st_containedby(st_point(5.0, 5.0), $poly)"))
    assert(b(s"st_coveredby(st_point(0.0, 5.0), $poly)"))
  }

  test("temporal rule: mixed presence is always false") {
    val a = "st_with_instant(st_point(5.0, 5.0), 100L)"
    assert(!b(s"st_intersects($a, $poly)"))
    assert(!b(s"st_intersects($poly, $a)"))
    assert(!b(s"st_contains($poly, $a)"))
    // both absent: spatial only
    assert(b(s"st_intersects($poly, st_point(5.0, 5.0))"))
  }

  test("temporal intersects: instants and intervals") {
    def pt(t: String) = s"st_with_instant(st_point(5.0, 5.0), $t)"
    def iv(s: String, e: String) = s"st_with_time(st_point(5.0, 5.0), $s, $e)"
    def openIv(s: String) = s"st_with_open_interval(st_point(5.0, 5.0), $s)"
    assert(b(s"st_intersects(${pt("100L")}, ${pt("100L")})"))
    assert(!b(s"st_intersects(${pt("100L")}, ${pt("101L")})"))
    assert(b(s"st_intersects(${iv("0L", "10L")}, ${iv("10L", "20L")})"))   // touching
    assert(!b(s"st_intersects(${iv("0L", "9L")}, ${iv("10L", "20L")})"))
    assert(b(s"st_intersects(${pt("15L")}, ${iv("10L", "20L")})"))
    assert(b(s"st_intersects(${openIv("10L")}, ${pt("1000L")})"))         // open end
    assert(!b(s"st_intersects(${openIv("10L")}, ${pt("9L")})"))
  }

  test("temporal contains: open-end edge cases (reference Interval.scala:37-38)") {
    def iv(s: String, e: String) = s"st_with_time(st_point(5.0, 5.0), $s, $e)"
    def openIv(s: String) = s"st_with_open_interval(st_point(5.0, 5.0), $s)"
    assert(b(s"st_contains(${iv("0L", "100L")}, ${iv("10L", "20L")})"))
    assert(!b(s"st_contains(${iv("0L", "15L")}, ${iv("10L", "20L")})"))
    // an open-ended container contains anything started inside it
    assert(b(s"st_contains(${openIv("0L")}, ${iv("10L", "1000000L")})"))
    // an open-ended containee is contained by nothing (its end is undefined)
    assert(!b(s"st_contains(${iv("0L", "100L")}, ${openIv("10L")})"))
    assert(!b(s"st_contains(${openIv("0L")}, ${openIv("10L")})"))
    // containedBy is the inverse
    assert(b(s"st_containedby(${iv("10L", "20L")}, ${iv("0L", "100L")})"))
  }

  test("distance functions") {
    assert(d("st_distance(st_point(0.0, 0.0), st_point(3.0, 4.0))") == 5.0)
    assert(d("st_centroid_distance(st_point(0.0, 0.0), st_point(3.0, 4.0))") == 5.0)
    assert(b("st_within_distance(st_point(0.0, 0.0), st_point(3.0, 4.0), 5.0)"))
    assert(!b("st_within_distance(st_point(0.0, 0.0), st_point(3.0, 4.0), 4.99)"))
    // polygon min distance vs centroid distance differ
    assert(d(s"st_distance($poly, st_point(15.0, 5.0))") == 5.0)
    assert(d(s"st_centroid_distance($poly, st_point(15.0, 5.0))") == 10.0)
  }

  test("hausdorff / temporal / weighted distances") {
    // farthest polygon vertex from (15,5) is corner (0,0)/(0,10): sqrt(250)
    assert(d(s"st_hausdorff($poly, st_point(15.0, 5.0))") == math.sqrt(250.0))
    val a = "st_with_time(st_point(0.0, 0.0), 0L, 10L)"   // center 5
    val b = "st_with_time(st_point(3.0, 4.0), 20L, 30L)"  // center 25
    assert(d(s"st_t_distance($a, $b)") == 20.0)
    assert(d(s"st_st_distance($a, $b, 1.0, 1.0)") == 25.0) // 5 spatial + 20 temporal
    assert(d(s"st_st_distance($a, $b, 2.0, 0.5)") == 20.0) // 10 + 10
  }

  test("interval distance: reference IntervalDistance(min,max) semantics") {
    import graft.functions.stf
    import org.apache.spark.sql.functions.{col, expr, lit}
    // point pair collapses to the scalar case: max == min == st_distance
    assert(d("st_max_distance(st_point(0.0, 0.0), st_point(3.0, 4.0))") == 5.0)
    // square (0,0)-(10,10) vs point (15,5): nearest edge point 5, farthest
    // corner (0,0)/(0,10) -> sqrt(250)
    assert(d(s"st_max_distance($poly, st_point(15.0, 5.0))") == math.sqrt(250.0))
    // two extended objects: [10, sqrt(1000)] between side-by-side squares
    val boxA = expr("st_box(0.0, 0.0, 10.0, 10.0)")
    val boxB = expr("st_box(20.0, 0.0, 30.0, 10.0)")
    val far  = expr("st_point(50.0, 5.0)")
    val one = spark.range(1).select(
      stf.st_distance_interval(boxA, boxB).as("ab"),
      stf.st_distance_interval(boxA, far).as("ap"),
      stf.st_scalar_interval(lit(5.0)).as("s5"),
      stf.st_distance_interval(expr("st_point(0.0, 0.0)"), expr("st_point(3.0, 4.0)")).as("pp"))
    val r = one.select(
      col("ab.min"), col("ab.max"),
      // ordering table (reference Distance.scala:41-80)
      stf.idist_lt(col("ab"), col("ap")),  // certainly closer: sqrt(1000) < 40
      stf.idist_gt(col("ap"), col("ab")),  // certainly farther
      stf.idist_lt(col("ap"), col("ab")),  // false: 40-ish not < 10
      stf.idist_le(col("ab"), col("ab")),  // max <= max: reflexive
      stf.idist_ge(col("ab"), col("ab")),  // min >= min: reflexive
      stf.idist_eq(col("ab"), col("ab")),
      stf.idist_eq(col("s5"), col("pp")))  // scalar embed == collapsed pair
      .head()
    assert(r.getDouble(0) == 10.0 && r.getDouble(1) == math.sqrt(1000.0))
    assert(r.getBoolean(2) && r.getBoolean(3) && !r.getBoolean(4))
    assert(r.getBoolean(5) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8))
  }

  test("accessors and constructors") {
    assert(spark.sql("SELECT st_wkt(st_point(1.0, 2.0))").collect()(0).getString(0)
      == "POINT (1 2)")
    assert(d(s"st_area($poly)") == 100.0)
    assert(d(s"st_minx($poly)") == 0.0 && d(s"st_maxx($poly)") == 10.0)
    assert(d("st_x(st_point(3.0, 4.0))") == 3.0)
    val r = spark.sql("SELECT st_tstart(st_with_time(st_point(1.0,1.0), 5L, 9L)), " +
      "st_tend(st_with_time(st_point(1.0,1.0), 5L, 9L)), st_tstart(st_point(1.0,1.0))").collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 9L && r.isNullAt(2))
  }

  test("kernel guards fail loudly instead of returning garbage") {
    // inverted interval (reference Interval requires start <= end)
    intercept[Exception] {
      spark.sql("SELECT st_with_time(st_point(1.0,1.0), 9L, 5L)").collect()
    }
    // dimension-mismatched dot product
    intercept[Exception] {
      spark.sql("SELECT vec_dot(array(CAST(1.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").collect()
    }
    // hausdorff over an empty geometry
    intercept[Exception] {
      spark.sql("SELECT st_hausdorff(st_point(1.0,1.0), st_geomfromwkt('POLYGON EMPTY'))").collect()
    }
    // band count that does not divide the signature
    intercept[Exception] {
      spark.sql("SELECT band_buckets(minhash_sig(array('a','b'), 128), 200)").collect()
    }
    // hyperplane config outside the bit-packing bounds
    intercept[Exception] {
      spark.sql("SELECT hyperplane_buckets(array(CAST(1.0 AS FLOAT)), 300, 60)").collect()
    }
  }

  test("empty shingle sets produce no LSH buckets (no constant-signature collisions)") {
    val r = spark.sql("SELECT size(minhash_sig(array(), 128)), " +
      "size(band_buckets(minhash_sig(array(), 128), 32))").collect()(0)
    assert(r.getInt(0) == 0 && r.getInt(1) == 0)
  }

  test("z points: WKB Z round-trip, predicates stay XY, 2-D points read NULL z") {
    // z survives the stobj struct (reference STObject(x,y,z), STObject.scala:245-248)
    val r = spark.sql("SELECT st_z(st_point(1.0, 2.0, 3.5)), st_x(st_point(1.0, 2.0, 3.5)), " +
      "st_y(st_point(1.0, 2.0, 3.5)), st_z(st_point(1.0, 2.0))").collect()(0)
    assert(r.getDouble(0) == 3.5 && r.getDouble(1) == 1.0 && r.getDouble(2) == 2.0)
    assert(r.isNullAt(3))
    // z survives a real exchange + parquet round trip, not just in-memory
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_zpoint_spec"
    Seq((1L, 7.25)).toDF("id", "z")
      .select(col("id"), graft.functions.stf.st_point(lit(1.0), lit(2.0), col("z")).as("p"))
      .repartition(2).write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
      .select(graft.functions.stf.st_z(col("p"))).collect()(0).getDouble(0)
    assert(back == 7.25)
    // predicate semantics: XY only — same xy, different z still intersects,
    // and distance ignores z (documented deviation-free reference parity:
    // its JTS-backed predicates read XY only)
    val p = spark.sql("SELECT st_intersects(st_point(1.0,2.0,3.0), st_point(1.0,2.0,9.0)), " +
      "st_distance(st_point(0.0,0.0,5.0), st_point(3.0,4.0,100.0))").collect()(0)
    assert(p.getBoolean(0) && p.getDouble(1) == 5.0)
    // WKT render keeps working on z points (JTS may print 2-D; just no crash)
    assert(spark.sql("SELECT st_wkt(st_point(1.0, 2.0, 3.0))").collect()(0)
      .getString(0).contains("POINT"))
    // geometry transforms that re-encode WKB must carry z through
    // (writeGeomKeepZ): mercator rewrites x/y only
    val mz = spark.sql(
      "SELECT st_z(st_mercator(st_point(10.0, 20.0, 7.5), 256, 256)), " +
      "st_z(st_mercator(st_point(10.0, 20.0), 256, 256))").collect()(0)
    assert(mz.getDouble(0) == 7.5 && mz.isNullAt(1))
    // a z parsed from 3-D WKT survives the same way st_point(x,y,z)'s does
    val wz = spark.sql("SELECT st_z(st_geomfromwkt('POINT Z (1 2 3)')), " +
      "st_z(st_geomfromwkt('POINT (1 2)'))").collect()(0)
    assert(wz.getDouble(0) == 3.0 && wz.isNullAt(1))
    // empty geometries have no first coordinate: NULL, not an NPE'd task
    val ez = spark.sql("SELECT st_z(st_geomfromwkt('LINESTRING EMPTY')), " +
      "st_z(st_geomfromwkt('POLYGON EMPTY'))").collect()(0)
    assert(ez.isNullAt(0) && ez.isNullAt(1))
  }

  test("temporal ordering and interval stats (reference before/after, center/length)") {
    // closed vs closed: strict on both bounds (Interval.scala:50-53)
    def q(sql: String) = spark.sql(s"SELECT $sql").collect()(0)
    val p = "st_point(0.0, 0.0)"
    def iv(s: Long, e: Long) = s"st_with_time($p, ${s}L, ${e}L)"
    def inst(v: Long) = s"st_with_instant($p, ${v}L)"
    assert(q(s"st_before(${iv(1, 4)}, ${iv(2, 5)})").getBoolean(0))
    assert(!q(s"st_before(${iv(1, 6)}, ${iv(2, 5)})").getBoolean(0)) // end not <
    assert(!q(s"st_before(${iv(2, 3)}, ${iv(2, 5)})").getBoolean(0)) // start not <
    assert(q(s"st_after(${iv(3, 9)}, ${iv(1, 5)})").getBoolean(0))
    assert(q(s"st_after(${iv(3, 9)}, ${iv(1, 5)})").getBoolean(0) ==
      q(s"st_before(${iv(1, 5)}, ${iv(3, 9)})").getBoolean(0))
    // open-ended receiver is before nothing (end undefined); an open-ended
    // ARGUMENT only needs the start compare
    assert(!q(s"st_before(st_with_open_interval($p, 1L), ${iv(2, 5)})").getBoolean(0))
    assert(q(s"st_before(${iv(1, 9)}, st_with_open_interval($p, 2L))").getBoolean(0))
    // degenerate instants reproduce the reference's Instant.< (start compare)
    assert(q(s"st_before(${inst(3)}, ${inst(5)})").getBoolean(0))
    assert(!q(s"st_before(${inst(5)}, ${inst(5)})").getBoolean(0))
    // time-less side -> NULL (reference: None / NPE; uniform NULL here)
    assert(q(s"st_before($p, ${iv(2, 5)})").isNullAt(0))
    assert(q(s"st_after(${iv(2, 5)}, $p)").isNullAt(0))
    // center = integer midpoint, length = end - start; instant center=self,
    // length=0; open/absent time -> NULL
    assert(q(s"st_tcenter(${iv(10, 21)})").getLong(0) == 15L)
    assert(q(s"st_tlength(${iv(10, 21)})").getLong(0) == 11L)
    assert(q(s"st_tcenter(${inst(7)})").getLong(0) == 7L)
    assert(q(s"st_tlength(${inst(7)})").getLong(0) == 0L)
    assert(q(s"st_tcenter(st_with_open_interval($p, 1L))").isNullAt(0))
    assert(q(s"st_tlength($p)").isNullAt(0))
  }

  test("st_sto overloads reproduce the reference's SqlFilterTest") {
    // reference sql/spatial SqlFilterTest: st_sto(wkt, 2020, 2, 16) and the
    // string-typed variant both carry Instant(1581811200) — midnight UTC in
    // epoch SECONDS; a DATE argument behaves the same
    val r = spark.sql(
      "SELECT st_tstart(st_sto('POINT(1 1)', 2020, 2, 16)), " +
      "st_tstart(st_sto('POINT(1 1)', '2020', '2', '16')), " +
      "st_tstart(st_sto('POINT(1 1)', DATE '2020-02-16')), " +
      "st_tstart(st_sto('POINT(1 1)', 1581811200L)), " +
      "st_wkt(st_sto('POINT(25 20)'))").collect()(0)
    assert(r.getLong(0) == 1581811200L)
    assert(r.getLong(1) == 1581811200L)
    assert(r.getLong(2) == 1581811200L)
    assert(r.getLong(3) == 1581811200L)
    assert(r.getString(4).replace(" (", "(") == "POINT(25 20)")
    // the invalid 3-arg form gets the structured arity error, not a raw
    // exception ({1,2,4} is not a (min,max) range)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT st_sto('POINT(1 1)', 2020, 2)").collect()
    }
    assert(e.getMessage.contains("st_sto"))
    // the filter the reference's first case runs: the point is contained,
    // the polygon is not — exactly one row survives
    val n = spark.sql(
      "SELECT * FROM (SELECT st_sto('POINT (25 20)') AS g UNION ALL " +
      "SELECT st_sto('POLYGON ((-73 40.5, -70 40.5, -72 41, -73 40.5))')) " +
      "WHERE st_containedby(g, st_geomfromwkt('POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))'))")
      .count()
    assert(n == 1L)
  }

  test("st_before reproduces the reference's IntervalTest '<' table") {
    // reference src/test/scala/dbis/stark/IntervalTest.scala:11-43 — every
    // lt/gt expectation, replayed through the SQL surface
    def q(sql: String) = spark.sql(s"SELECT $sql").collect()(0).getBoolean(0)
    val p = "st_point(0.0, 0.0)"
    def iv(s: Long, e: Long) = s"st_with_time($p, ${s}L, ${e}L)"
    def open(s: Long) = s"st_with_open_interval($p, ${s}L)"
    def inst(v: Long) = s"st_with_instant($p, ${v}L)"
    assert(q(s"st_before(${iv(1, 2)}, ${iv(2, 3)})"))        // lt
    assert(q(s"st_before(${iv(1, 2)}, ${iv(3, 4)})"))        // lt
    assert(!q(s"st_before(${iv(1, 3)}, ${iv(2, 3)})"))       // not lt
    assert(q(s"st_before(${iv(1, 4)}, ${iv(6, 9)})"))        // lt
    assert(!q(s"st_before(${iv(1, 2)}, ${iv(1, 2)})"))       // not lt (self)
    assert(!q(s"st_before(${iv(4, 6)}, ${iv(0, 1)})"))       // not lt
    assert(!q(s"st_before(${open(3)}, " +                    // open end: never lt
      s"${iv(Long.MinValue, Long.MaxValue)})"))
    assert(q(s"st_before(${iv(3, 7)}, ${open(9)})"))         // open ARG: start only
    // "comparable to instants" block
    assert(q(s"st_before(${inst(1)}, ${iv(2, 3)})"))         // Instant(1) lt
    assert(!q(s"st_before(${iv(2, 3)}, ${inst(1)})"))        // not lt
    assert(q(s"st_after(${iv(2, 3)}, ${inst(1)})"))          // gt(Instant(1))
  }

  test("grid cells") {
    val cells = spark.sql("SELECT st_cells(st_box(5.0, 5.0, 15.0, 15.0), 10.0)")
      .collect()(0).getSeq[Long](0)
    assert(cells.length == 4) // box straddles 4 cells of size 10
    val single = spark.sql("SELECT st_cells(st_point(5.0, 5.0), 10.0)")
      .collect()(0).getSeq[Long](0)
    assert(single.length == 1)
    // negative coordinates get distinct cells (no collision with positives)
    val neg = spark.sql("SELECT st_cell(st_point(-5.0, -5.0), 10.0), st_cell(st_point(5.0, 5.0), 10.0)").collect()(0)
    assert(neg.getLong(0) != neg.getLong(1))
  }
}
