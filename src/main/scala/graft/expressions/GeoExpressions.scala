package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pinot geospatial POLYGON family (ST_GeomFromText / ST_Contains /
  * ST_Within / ST_Area), extending the existing point family registered in
  * [[graft.PinotFunctions]] (Pinot 1.2.0 geospatial surface; version pin
  * `/root/reference/resources/bastion/bastionUserData.sh:7`). A polygon is
  * `array<struct<x:double, y:double>>` — the ring vertices, closing
  * duplicate dropped — so polygon values compose with the point family's
  * `struct<x, y>` representation and stay codegen-friendly columnar data.
  *
  * Numeric contract (what makes the DuckDB oracle exact): containment is
  * the canonical even-odd ray cast with the per-edge test
  * `(yi > py) != (yj > py) AND px < (xj - xi) * (py - yi) / (yj - yi) + xi`
  * and area is the sequential shoelace fold `acc += xi*yj - xj*yi` over
  * edges in ring order. Both are plain IEEE double arithmetic with a fixed
  * association, so an oracle that unrolls the same formula per edge (the
  * polygon is a literal) reproduces every boolean and every double bit for
  * bit — no epsilon anywhere.
  */
object GeoKernels {

  val pointType: StructType =
    StructType(Seq(StructField("x", DoubleType), StructField("y", DoubleType)))

  /** Parses `POLYGON ((x1 y1, x2 y2, ...))` (single ring). A closing
    * vertex equal to the first is dropped; the ring is implicitly closed. */
  def parsePolygon(wkt: UTF8String): ArrayData = {
    val s = wkt.toString.trim
    val up = s.toUpperCase
    require(up.startsWith("POLYGON"), s"not a POLYGON WKT: $s")
    val open = s.indexOf("((")
    val close = s.indexOf("))")
    require(open >= 0 && close > open, s"malformed POLYGON WKT: $s")
    val body = s.substring(open + 2, close)
    var pts = body.split(",").toSeq.map { p =>
      val xy = p.trim.split("\\s+")
      require(xy.length == 2, s"malformed POLYGON vertex '$p'")
      (xy(0).toDouble, xy(1).toDouble)
    }
    if (pts.length > 1 && pts.head == pts.last) pts = pts.dropRight(1)
    require(pts.length >= 3, s"POLYGON needs >= 3 distinct vertices: $s")
    new GenericArrayData(pts.map { case (x, y) => InternalRow(x, y) }.toArray)
  }

  /** Even-odd ray cast; boundary behavior is whatever the canonical formula
    * yields (consistent with the unrolled oracle by construction). */
  def contains(poly: ArrayData, pt: InternalRow): Boolean = {
    val px = pt.getDouble(0)
    val py = pt.getDouble(1)
    val n = poly.numElements()
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val vi = poly.getStruct(i, 2)
      val vj = poly.getStruct(j, 2)
      val xi = vi.getDouble(0); val yi = vi.getDouble(1)
      val xj = vj.getDouble(0); val yj = vj.getDouble(1)
      if (((yi > py) != (yj > py)) &&
          px < (xj - xi) * (py - yi) / (yj - yi) + xi) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }

  /** Planar shoelace area (geometry semantics — coordinates are treated as
    * a plane, matching Pinot's ST_Area on geometry values). */
  def area(poly: ArrayData): Double = {
    val n = poly.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val k = if (i + 1 == n) 0 else i + 1
      val vi = poly.getStruct(i, 2)
      val vk = poly.getStruct(k, 2)
      acc += vi.getDouble(0) * vk.getDouble(1) - vk.getDouble(0) * vi.getDouble(1)
      i += 1
    }
    math.abs(acc) / 2.0
  }
}

/** `st_geomfromtext('POLYGON ((...))')` → array<struct<x,y>>. Foldable when
  * the WKT is a literal, so polygon constants fold at plan time. */
case class StPolygonFromText(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(GeoKernels.pointType, containsNull = false)
  override def prettyName: String = "st_geomfromtext"

  override protected def nullSafeEval(input: Any): Any =
    GeoKernels.parsePolygon(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.GeoKernels.parsePolygon($c)")

  override protected def withNewChildInternal(newChild: Expression): StPolygonFromText =
    copy(child = newChild)
}

/** `st_astext(geom)` — Pinot's ST_AsText for BOTH geometry shapes this
  * engine carries: a point struct renders `POINT (x y)`, a polygon array
  * renders `POLYGON ((x1 y1, …))`. The shape is dispatched on the
  * resolved input type; doubles format via Double.toString, so
  * `st_geomfromtext(st_astext(p))` / `st_geogfromtext(...)` round-trip
  * exactly. Formatting is not a hot path — CodegenFallback. */
case class StAsText(child: Expression)
  extends UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private lazy val isPolygon: Boolean = child.dataType.isInstanceOf[ArrayType]

  private def isPoint(t: DataType): Boolean = t match {
    case StructType(Array(
      StructField("x", DoubleType, _, _), StructField("y", DoubleType, _, _))) => true
    case _ => false
  }

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case t if isPoint(t) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case ArrayType(et, _) if isPoint(et) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"st_astext expects a point struct<x,y> or a polygon array, got $other")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "st_astext"

  override protected def nullSafeEval(geom: Any): Any = {
    val sb = new java.lang.StringBuilder()
    if (isPolygon) {
      val arr = geom.asInstanceOf[ArrayData]
      sb.append("POLYGON ((")
      var i = 0
      while (i < arr.numElements()) {
        val v = arr.getStruct(i, 2)
        if (i > 0) sb.append(", ")
        sb.append(java.lang.Double.toString(v.getDouble(0))).append(' ')
          .append(java.lang.Double.toString(v.getDouble(1)))
        i += 1
      }
      // OGC WKT rings are CLOSED — repeat the first vertex (JTS-backed
      // Pinot ST_AsText always emits it; parsePolygon drops it on the way
      // back in, so the internal round-trip is unchanged)
      if (arr.numElements() > 0) {
        val v0 = arr.getStruct(0, 2)
        sb.append(", ").append(java.lang.Double.toString(v0.getDouble(0)))
          .append(' ').append(java.lang.Double.toString(v0.getDouble(1)))
      }
      sb.append("))")
    } else {
      val p = geom.asInstanceOf[InternalRow]
      sb.append("POINT (")
        .append(java.lang.Double.toString(p.getDouble(0))).append(' ')
        .append(java.lang.Double.toString(p.getDouble(1))).append(')')
    }
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): StAsText =
    copy(child = newChild)
}

/** `st_contains(polygon, point)` — even-odd ray cast (see GeoKernels). */
case class StContains(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(GeoKernels.pointType, containsNull = false), GeoKernels.pointType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "st_contains"

  override protected def nullSafeEval(poly: Any, pt: Any): Any =
    GeoKernels.contains(poly.asInstanceOf[ArrayData], pt.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (p, q) => s"graft.expressions.GeoKernels.contains($p, $q)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StContains =
    copy(left = newLeft, right = newRight)
}

/** `st_area(polygon)` — planar shoelace. */
case class StArea(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(GeoKernels.pointType, containsNull = false))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area"

  override protected def nullSafeEval(poly: Any): Any =
    GeoKernels.area(poly.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.GeoKernels.area($c)")

  override protected def withNewChildInternal(newChild: Expression): StArea =
    copy(child = newChild)
}
