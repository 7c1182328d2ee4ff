package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.aninteger.{IntegerSketch, IntegerSummary, IntegerSummaryDeserializer, IntegerSummarySetOperations}
import org.apache.datasketches.tuple.{CompactSketch, Intersection, Sketch => TupleSk, Sketches => TupleSketches, Union => TupleUnion}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Integer-sum TUPLE sketches — Pinot's `DISTINCT_COUNT_TUPLE_SKETCH` /
  * `SUM_VALUES_INTEGER_SUM_TUPLE_SKETCH` / `AVG_VALUE_INTEGER_SUM_TUPLE_SKETCH`
  * family (`[P1.2]`, available on the reference's unmodified Pinot 1.2
  * deployment — version pin
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`).
  *
  * A tuple sketch is a theta sketch whose retained keys each CARRY A METRIC
  * summary (here: a per-distinct-key integer SUM). That buys what neither
  * HLL nor plain theta can answer from sketch state alone: per-distinct-key
  * aggregates ("events per distinct user") and METRIC-WEIGHTED set algebra
  * ("total engagement of the users retained week-over-week" — the
  * intersection's summaries sum the two weeks' values per surviving key).
  *
  * 100 TB posture: [[TupleSketchAgg]] is a TypedImperativeAggregate —
  * partials combine map-side and the shuffle carries ONE ≤2^lgK-entry
  * sketch (keys + int summaries) per group regardless of row count. The
  * compact binary output is a persistable column (the Pinot raw-sketch
  * pattern, cf. q_sketch_rollup) that [[TupleUnionAgg]] re-merges and the
  * scalar ops below intersect at query time.
  */
object TupleOps {
  private[expressions] val mode: IntegerSummary.Mode = IntegerSummary.Mode.Sum

  private[expressions] def setOps = new IntegerSummarySetOperations(mode, mode)

  def wrap(b: Array[Byte]): TupleSk[IntegerSummary] =
    TupleSketches.heapifySketch(Memory.wrap(b), new IntegerSummaryDeserializer())

  /** Distinct-key estimate (DISTINCT_COUNT_TUPLE_SKETCH). */
  def estimate(b: Array[Byte]): Long = Math.round(wrap(b).getEstimate)

  /** Estimated total of the per-key sums — retained summaries scaled by 1/θ
    * in sampling mode (SUM_VALUES_INTEGER_SUM_TUPLE_SKETCH). */
  def sumValues(b: Array[Byte]): Long = {
    val sk = wrap(b)
    var s = 0L
    val it = sk.compact().iterator()
    while (it.next()) s += it.getSummary.getValue.toLong
    Math.round(s.toDouble / sk.getTheta)
  }

  /** Mean per-key sum over retained keys — both numerator and denominator
    * scale by θ, so the ratio needs no correction
    * (AVG_VALUE_INTEGER_SUM_TUPLE_SKETCH). */
  def avgValue(b: Array[Byte]): Double = {
    var s = 0L
    var n = 0L
    val it = wrap(b).compact().iterator()
    while (it.next()) { s += it.getSummary.getValue.toLong; n += 1 }
    if (n == 0) 0.0 else s.toDouble / n
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val u = new TupleUnion[IntegerSummary](setOps)
    u.union(wrap(a)); u.union(wrap(b))
    u.getResult.toByteArray
  }

  /** Intersection keeps keys present in BOTH sketches; Sum mode adds the
    * two sides' per-key values — the metric-weighted retention primitive. */
  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = new Intersection[IntegerSummary](setOps)
    i.intersect(wrap(a)); i.intersect(wrap(b))
    i.getResult.toByteArray
  }
}

/** Aggregation buffer: a live updatable sketch for raw rows plus a compact
  * accumulator for merged partials (tuple `Union` cannot absorb single-row
  * updates, unlike theta's). */
final class TupleSketchBuffer(val lgK: Int) {
  private var live: IntegerSketch = null
  private var merged: TupleSk[IntegerSummary] = null

  private def liveSketch: IntegerSketch = {
    if (live == null) live = new IntegerSketch(lgK, TupleOps.mode)
    live
  }

  def update(key: Long, value: Int): Unit = liveSketch.update(key, Int.box(value))
  def update(key: String, value: Int): Unit = liveSketch.update(key, Int.box(value))

  def absorb(sk: TupleSk[IntegerSummary]): Unit =
    merged = if (merged == null) sk
    else {
      val u = new TupleUnion[IntegerSummary](1 << lgK, TupleOps.setOps)
      u.union(merged); u.union(sk)
      u.getResult
    }

  def result: CompactSketch[IntegerSummary] = {
    val liveC = if (live == null || live.getRetainedEntries == 0) null else live.compact()
    (liveC, merged) match {
      case (null, null) => new IntegerSketch(lgK, TupleOps.mode).compact()
      case (c, null) => c
      case (null, m) => m.compact()
      case (c, m) =>
        val u = new TupleUnion[IntegerSummary](1 << lgK, TupleOps.setOps)
        u.union(m); u.union(c)
        u.getResult
    }
  }
}

/** `tuple_sketch_agg(key, value[, lgK])` → compact integer-sum tuple sketch:
  * distinct keys, each carrying the SUM of its integer values. */
case class TupleSketchAgg(
    left: Expression,
    right: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "tuple_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TupleSketchBuffer = new TupleSketchBuffer(lgK)

  private def intValue(v: Any): Int = right.dataType match {
    case IntegerType => v.asInstanceOf[Int]
    case LongType => Math.toIntExact(v.asInstanceOf[Long])
    case ShortType => v.asInstanceOf[Short].toInt
    case ByteType => v.asInstanceOf[Byte].toInt
    case dt => throw new UnsupportedOperationException(
      s"tuple_sketch_agg: integer value column required, got $dt")
  }

  override def update(buf: TupleSketchBuffer, input: InternalRow): TupleSketchBuffer = {
    val k = left.eval(input)
    val v = right.eval(input)
    if (k != null && v != null) {
      val iv = intValue(v)
      left.dataType match {
        case LongType => buf.update(k.asInstanceOf[Long], iv)
        case IntegerType => buf.update(k.asInstanceOf[Int].toLong, iv)
        case StringType => buf.update(k.asInstanceOf[UTF8String].toString, iv)
        case dt => throw new UnsupportedOperationException(
          s"tuple_sketch_agg: unsupported key type $dt")
      }
    }
    buf
  }

  override def merge(a: TupleSketchBuffer, b: TupleSketchBuffer): TupleSketchBuffer = {
    a.absorb(b.result); a
  }

  override def eval(buf: TupleSketchBuffer): Any = buf.result.toByteArray
  override def serialize(buf: TupleSketchBuffer): Array[Byte] = buf.result.toByteArray

  override def deserialize(bytes: Array[Byte]): TupleSketchBuffer = {
    val b = new TupleSketchBuffer(lgK)
    b.absorb(TupleOps.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TupleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TupleSketchAgg =
    copy(left = l, right = r)
}

/** `tuple_union_agg(sketchCol[, lgK])` → union of STORED tuple sketches —
  * query-time merge over a persisted sketch column; duplicate keys across
  * cells SUM their carried values (Sum mode), so per-key metrics stay
  * correct across the rollup. */
case class TupleUnionAgg(
    child: Expression,
    lgK: Int = 14,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleSketchBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "tuple_union_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TupleSketchBuffer = new TupleSketchBuffer(lgK)

  override def update(buf: TupleSketchBuffer, input: InternalRow): TupleSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.absorb(TupleOps.wrap(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: TupleSketchBuffer, b: TupleSketchBuffer): TupleSketchBuffer = {
    a.absorb(b.result); a
  }

  override def eval(buf: TupleSketchBuffer): Any = buf.result.toByteArray
  override def serialize(buf: TupleSketchBuffer): Array[Byte] = buf.result.toByteArray

  override def deserialize(bytes: Array[Byte]): TupleSketchBuffer = {
    val b = new TupleSketchBuffer(lgK)
    b.absorb(TupleOps.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TupleUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TupleUnionAgg =
    copy(child = c)
}

/** `tuple_sketch_estimate(sketch)` → rounded distinct-key estimate. */
case class TupleSketchEstimate(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "tuple_sketch_estimate"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(b: Any): Any =
    TupleOps.estimate(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.TupleOps.estimate($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `tuple_sketch_sum_values(sketch)` → estimated total of per-key sums. */
case class TupleSketchSumValues(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "tuple_sketch_sum_values"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(b: Any): Any =
    TupleOps.sumValues(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.TupleOps.sumValues($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `tuple_sketch_avg_value(sketch)` → mean per-key sum over retained keys. */
case class TupleSketchAvgValue(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "tuple_sketch_avg_value"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(b: Any): Any =
    TupleOps.avgValue(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.TupleOps.avgValue($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Scalar tuple set operation over two serialized sketches (`op` ∈
  * union/intersect); intersection SUMS the two sides' per-key values. */
case class TupleSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ExpectsInputTypes {

  require(Set("union", "intersect").contains(op), s"bad tuple op: $op")

  override def dataType: DataType = BinaryType
  override def prettyName: String = s"tuple_$op"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)

  override def nullSafeEval(a: Any, b: Any): Any = op match {
    case "union" => TupleOps.union(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
    case "intersect" => TupleOps.intersect(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.TupleOps.$op($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the tuple family. */
object TupleSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.GraftBridge.{column, expression}

  def tupleSketchAgg(key: Column, value: Column, lgK: Int = 14): Column =
    column(TupleSketchAgg(expression(key), expression(value), lgK).toAggregateExpression())
  def tupleUnionAgg(c: Column, lgK: Int = 14): Column =
    column(TupleUnionAgg(expression(c), lgK).toAggregateExpression())
  def tupleEstimate(c: Column): Column = column(TupleSketchEstimate(expression(c)))
  def tupleSumValues(c: Column): Column = column(TupleSketchSumValues(expression(c)))
  def tupleAvgValue(c: Column): Column = column(TupleSketchAvgValue(expression(c)))
  def tupleUnion(a: Column, b: Column): Column =
    column(TupleSetOp(expression(a), expression(b), "union"))
  def tupleIntersect(a: Column, b: Column): Column =
    column(TupleSetOp(expression(a), expression(b), "intersect"))
}
