package graft

import graft.expressions.{GeoKernels, StArea, StContains, StPolygonFromText}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftBridge

/** Polygon geospatial family (expressions/GeoExpressions): WKT parsing,
  * planted containment truth, shoelace area, closing-vertex handling, and
  * codegen↔interpreted parity through a real plan.
  */
class GeoPolySpec extends GraftSuite {

  private val square = "POLYGON ((0 0, 10 0, 10 10, 0 10))"
  private val squareClosed = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

  private def containsXY(wkt: String, x: Double, y: Double): Boolean =
    GeoKernels.contains(
      GeoKernels.parsePolygon(
        org.apache.spark.unsafe.types.UTF8String.fromString(wkt)),
      org.apache.spark.sql.catalyst.InternalRow(x, y))

  test("planted containment: square, concave polygon, outside points") {
    assert(containsXY(square, 5, 5))
    assert(containsXY(square, 0.001, 9.999))
    assert(!containsXY(square, -1, 5))
    assert(!containsXY(square, 11, 5))
    assert(!containsXY(square, 5, -0.5))
    // concave "L": the notch (6..10)×(6..10) is OUTSIDE
    val l = "POLYGON ((0 0, 10 0, 10 6, 6 6, 6 10, 0 10))"
    assert(containsXY(l, 3, 3))
    assert(containsXY(l, 3, 9))
    assert(containsXY(l, 9, 3))
    assert(!containsXY(l, 8, 8))
  }

  test("closing vertex is dropped; area matches shoelace") {
    val open = GeoKernels.parsePolygon(
      org.apache.spark.unsafe.types.UTF8String.fromString(square))
    val closed = GeoKernels.parsePolygon(
      org.apache.spark.unsafe.types.UTF8String.fromString(squareClosed))
    assert(open.numElements() === 4)
    assert(closed.numElements() === 4)
    assert(GeoKernels.area(open) === 100.0)
    assert(GeoKernels.area(closed) === 100.0)
    // triangle, counter-clockwise AND clockwise give the same |area|
    val tri = GeoKernels.parsePolygon(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "POLYGON ((0 0, 4 0, 0 3))"))
    val triCw = GeoKernels.parsePolygon(
      org.apache.spark.unsafe.types.UTF8String.fromString(
        "POLYGON ((0 0, 0 3, 4 0))"))
    assert(GeoKernels.area(tri) === 6.0)
    assert(GeoKernels.area(triCw) === 6.0)
  }

  test("malformed WKT fails loudly") {
    intercept[Exception](containsXY("POINT (1 2)", 0, 0))
    intercept[Exception](containsXY("POLYGON ((0 0, 1 1))", 0, 0))
  }

  test("codegen path through a plan matches the kernel (100 grid points)") {
    import spark.implicits._
    val pts = (for (x <- 0 until 10; y <- 0 until 10)
      yield (x * 1.3 - 2.0, y * 1.3 - 2.0)).toDF("px", "py")
    val wkt = "POLYGON ((0.5 0.5, 8.5 0.5, 8.5 8.5, 0.5 8.5))"
    val poly = StPolygonFromText(Literal(wkt))
    val got = pts
      .withColumn("inside",
        GraftBridge.column(StContains(poly,
          GraftBridge.expression(struct(col("px").as("x"), col("py").as("y"))))))
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getBoolean(2))
      .toMap
    got.foreach { case ((x, y), inside) =>
      assert(inside === containsXY(wkt, x, y), s"($x, $y)")
      assert(inside === (x > 0.5 && x < 8.5 && y > 0.5 && y < 8.5), s"($x, $y)")
    }
  }

  test("property: ray cast agrees with the half-plane test on random convex polygons") {
    val rnd = new scala.util.Random(0x6E0L)
    (1 to 50).foreach { _ =>
      // random convex polygon: points on a circle with jittered radius,
      // sorted by angle (convex by construction when radii are equal —
      // use a fixed radius for guaranteed convexity)
      val n = 3 + rnd.nextInt(6)
      val cx = rnd.nextDouble() * 10 - 5
      val cy = rnd.nextDouble() * 10 - 5
      val r = 1.0 + rnd.nextDouble() * 4
      val angles = Seq.fill(n)(rnd.nextDouble() * 2 * math.Pi).sorted
      val verts = angles.map(a => (cx + r * math.cos(a), cy + r * math.sin(a)))
      val wkt = verts.map { case (x, y) => s"$x $y" }
        .mkString("POLYGON ((", ", ", "))")
      // half-plane test (counter-clockwise ring): inside iff every cross
      // product has the same sign
      def halfPlane(px: Double, py: Double): Boolean = {
        val signs = verts.indices.map { i =>
          val (x1, y1) = verts(i)
          val (x2, y2) = verts((i + 1) % n)
          math.signum((x2 - x1) * (py - y1) - (y2 - y1) * (px - x1))
        }.filter(_ != 0.0)
        signs.nonEmpty && (signs.forall(_ > 0) || signs.forall(_ < 0))
      }
      (1 to 40).foreach { _ =>
        val px = cx + (rnd.nextDouble() * 2 - 1) * r * 1.5
        val py = cy + (rnd.nextDouble() * 2 - 1) * r * 1.5
        assert(containsXY(wkt, px, py) === halfPlane(px, py),
          s"($px, $py) in $wkt")
      }
    }
  }

  test("SQL spellings on the Pinot session: contains/within/area") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    val r = s.sql(
      s"""SELECT
         |  st_contains(st_geomfromtext('$square'), st_point(5, 5)) AS c_in,
         |  st_contains(st_geomfromtext('$square'), st_point(15, 5)) AS c_out,
         |  st_within(st_point(5, 5), st_geomfromtext('$square')) AS w_in,
         |  st_area(st_geomfromtext('$square')) AS a""".stripMargin).collect()(0)
    assert(r.getBoolean(0))
    assert(!r.getBoolean(1))
    assert(r.getBoolean(2))
    assert(r.getDouble(3) === 100.0)
  }

  test("st_astext round-trips both shapes") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    val r = s.sql(
      s"""SELECT st_astext(st_geomfromtext('$square')) AS poly_wkt,
         |       st_astext(st_point(1.5, -2.25)) AS pt_wkt,
         |       st_area(st_geomfromtext(st_astext(st_geomfromtext('$square')))) AS a2""".stripMargin)
      .collect()(0)
    // OGC-valid WKT: the ring is CLOSED (first vertex repeated), matching
    // JTS-backed Pinot ST_AsText output
    assert(r.getString(0) === "POLYGON ((0.0 0.0, 10.0 0.0, 10.0 10.0, 0.0 10.0, 0.0 0.0))")
    assert(r.getString(1) === "POINT (1.5 -2.25)")
    assert(r.getDouble(2) === 100.0)
  }
}
