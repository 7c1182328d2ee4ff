package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct counting with REAL set algebra — Pinot's
  * `DISTINCT_COUNT_THETA_SKETCH` / `DIST_COUNT_RAW_THETA_SKETCH` family
  * (`[P1.2]`, deployed unmodified by the reference stack). Unlike HLL,
  * theta sketches support arbitrary nested set EXPRESSIONS — union,
  * intersection, A-not-B — over mergeable, persistable sketch state:
  * inclusion–exclusion on HLL degrades past 2–3 predicates and cannot be
  * stored for later intersection, theta sketches compose exactly
  * (`org.apache.datasketches.theta`, the same library Pinot embeds).
  *
  * 100 TB posture: [[ThetaSketchAgg]] is a TypedImperativeAggregate, so
  * partial sketches combine map-side and the shuffle carries ONE ≤2^lgK-entry
  * sketch per group regardless of row count; the compact binary output is a
  * column value that can be written to parquet (the Pinot raw-sketch-column
  * pattern, cf. q_sketch_rollup) and re-merged or intersected at query time
  * by the scalar ops below.
  */
object ThetaOps {
  private def wrap(b: Array[Byte]): Sketch = Sketches.wrapSketch(Memory.wrap(b))

  def estimate(b: Array[Byte]): Long = Math.round(wrap(b).getEstimate)

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = SetOperation.builder().buildUnion()
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }

  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    SetOperation.builder().buildANotB().aNotB(wrap(a), wrap(b)).toByteArray
}

/** Base for the two theta aggregates: Union buffer, compact-binary storage. */
abstract class ThetaAggBase extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {
  def lgK: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }

  override def eval(u: Union): Any = u.getResult.toByteArray

  override def serialize(u: Union): Array[Byte] = u.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapSketch(Memory.wrap(bytes)))
    u
  }
}

/** `theta_sketch_agg(col[, lgK])` → compact theta sketch binary of the
  * column's distinct values (Pinot DIST_COUNT_RAW_THETA_SKETCH). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "theta_sketch_agg"

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case IntegerType => u.update(v.asInstanceOf[Int].toLong)
      case LongType => u.update(v.asInstanceOf[Long])
      case ShortType => u.update(v.asInstanceOf[Short].toLong)
      case ByteType => u.update(v.asInstanceOf[Byte].toLong)
      case DoubleType => u.update(v.asInstanceOf[Double])
      case FloatType => u.update(v.asInstanceOf[Float].toDouble)
      case StringType => u.update(v.asInstanceOf[UTF8String].toString)
      case BinaryType => u.update(v.asInstanceOf[Array[Byte]])
      case dt => throw new UnsupportedOperationException(
        s"theta_sketch_agg: unsupported input type $dt")
    }
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `theta_union_agg(sketchCol[, lgK])` → union of STORED theta sketches —
  * the query-time merge over a persisted sketch column (rollup pattern). */
case class ThetaUnionAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ThetaAggBase {

  override def prettyName: String = "theta_union_agg"

  override def update(u: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null)
      u.union(Sketches.wrapSketch(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** `theta_sketch_estimate(sketch)` → rounded distinct estimate. */
case class ThetaSketchEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "theta_sketch_estimate"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(b: Any): Any =
    ThetaOps.estimate(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.ThetaOps.estimate($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Scalar theta set operation over two serialized sketches — composable
  * into arbitrary nested set expressions (`op` ∈ union/intersect/anotb). */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ExpectsInputTypes {

  require(Set("union", "intersect", "anotb").contains(op), s"bad theta op: $op")

  override def dataType: DataType = BinaryType
  override def prettyName: String = s"theta_$op"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "union" => ThetaOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "intersect" => ThetaOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "anotb" => ThetaOps.aNotB(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val method = op match {
      case "union" => "union"; case "intersect" => "intersect"; case "anotb" => "aNotB"
    }
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.ThetaOps.$method($a, $b)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the theta family. */
object ThetaSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.GraftBridge.{column, expression}

  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    column(ThetaSketchAgg(expression(c), lgK).toAggregateExpression())
  def thetaUnionAgg(c: Column, lgK: Int = 12): Column =
    column(ThetaUnionAgg(expression(c), lgK).toAggregateExpression())
  def thetaEstimate(c: Column): Column = column(ThetaSketchEstimate(expression(c)))
  def thetaUnion(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "union"))
  def thetaIntersect(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "intersect"))
  def thetaANotB(a: Column, b: Column): Column =
    column(ThetaSetOp(expression(a), expression(b), "anotb"))
}

/** Pinot 1.2's FULL broker argument form for the theta family (the shape
  * the upstream docs use for funnel/retention examples against the deployed
  * endpoint):
  *
  *   distinctCountThetaSketch(col
  *     [, 'nominalEntries=K'
  *     [, 'predicate1', ..., 'predicateN'
  *     [, 'SET_OP($1, ..., $N)' ]]])
  *
  * Each predicate string is a filter expression evaluated per row — here
  * parsed with Spark's own SQL parser and attached as the FILTER clause of
  * an independent theta aggregate (one bounded sketch per predicate) — and
  * the trailing SET_UNION/SET_INTERSECT/SET_DIFF post-expression combines
  * the per-predicate sketches by `$i` reference (nested, n-ary). Without a
  * post-expression the predicate sketches union; without predicates the
  * plain single-sketch form applies. `raw = true` returns the serialized
  * result sketch (DIST_COUNT_RAW_THETA_SKETCH), else the estimate. */
object ThetaSketchSql {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

  def build(args: Seq[Expression], raw: Boolean): Expression = {
    require(args.nonEmpty, "distinctCountThetaSketch needs a column argument")
    val combined: Expression =
      if (args.length == 1)
        ThetaSketchAgg(args.head).toAggregateExpression()
      else {
        val strs: Seq[String] = args.tail.map {
          case Literal(s, StringType) if s != null => s.toString
          case other => throw new IllegalArgumentException(
            "distinctCountThetaSketch: parameters/predicates/set-expression " +
              s"must be string literals, got $other")
        }
        val lgK = parseLgK(strs.head)
        val rest = strs.tail
        val (preds, post) =
          if (rest.nonEmpty && rest.last.trim.toUpperCase.startsWith("SET_"))
            (rest.dropRight(1), Some(rest.last))
          else (rest, None)
        require(preds.nonEmpty || post.isEmpty,
          "distinctCountThetaSketch: a set expression needs predicate arguments")
        if (preds.isEmpty)
          ThetaSketchAgg(args.head, lgK).toAggregateExpression()
        else {
          val sketches: IndexedSeq[Expression] = preds.map { p =>
            ThetaSketchAgg(args.head, lgK).toAggregateExpression(
              isDistinct = false,
              filter = Some(CatalystSqlParser.parseExpression(p))): Expression
          }.toIndexedSeq
          post match {
            case None => sketches.reduceLeft(ThetaSetOp(_, _, "union"))
            case Some(e) => parseSetExpr(e, sketches)
          }
        }
      }
    if (raw) combined else ThetaSketchEstimate(combined)
  }

  /** `nominalEntries=K` (Pinot's thetaSketchParams) → lgK; blank → default
    * 12; any other key errors loudly (never a silently-ignored typo). */
  private def parseLgK(params: String): Int = {
    val trimmed = params.trim
    if (trimmed.isEmpty) 12
    else trimmed.split("[;,]").map(_.trim).filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.equalsIgnoreCase("nominalEntries") =>
          val n = v.trim.toLong
          require(n >= 16 && n <= (1L << 26), s"nominalEntries out of range: $n")
          64 - java.lang.Long.numberOfLeadingZeros(n - 1) // ceil(log2(n))
        case other => throw new IllegalArgumentException(
          s"distinctCountThetaSketch: unsupported parameter '$kv' (supported: nominalEntries)")
      }
    }.last
  }

  /** Recursive-descent parser for the post-aggregation set expression:
    * expr := '$'N | SET_UNION|SET_INTERSECT|SET_DIFF '(' expr (',' expr)* ')'
    * (n-ary union/intersect fold left; SET_DIFF is strictly binary). */
  private def parseSetExpr(s: String, sk: IndexedSeq[Expression]): Expression = {
    var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"distinctCountThetaSketch set expression '$s' at position $i: $msg")
    def parse(): Expression = {
      ws()
      if (i >= s.length) fail("unexpected end")
      if (s.charAt(i) == '$') {
        i += 1
        val st = i
        while (i < s.length && s.charAt(i).isDigit) i += 1
        if (st == i) fail("expected a digit after $")
        val n = s.substring(st, i).toInt
        if (n < 1 || n > sk.size) fail(s"$$${n} out of range (1..${sk.size})")
        sk(n - 1)
      } else {
        val st = i
        while (i < s.length && (s.charAt(i).isLetter || s.charAt(i) == '_')) i += 1
        val op = s.substring(st, i).toUpperCase match {
          case "SET_UNION" => "union"
          case "SET_INTERSECT" => "intersect"
          case "SET_DIFF" => "anotb"
          case other => fail(s"unknown set operation '$other'")
        }
        ws(); if (i >= s.length || s.charAt(i) != '(') fail("expected '('"); i += 1
        val as = scala.collection.mutable.ArrayBuffer(parse())
        ws()
        while (i < s.length && s.charAt(i) == ',') { i += 1; as += parse(); ws() }
        if (i >= s.length || s.charAt(i) != ')') fail("expected ')'"); i += 1
        if (op == "anotb") {
          if (as.size != 2) fail("SET_DIFF takes exactly two arguments")
          ThetaSetOp(as(0), as(1), "anotb")
        } else as.reduceLeft(ThetaSetOp(_, _, op))
      }
    }
    val r = parse()
    ws()
    if (i != s.length) fail("trailing input")
    r
  }
}
