package graft.expressions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy-hitters) sketches — Pinot's
  * `FREQUENT_STRINGS_SKETCH` (`[P1.2]`, available on the reference's
  * unmodified Pinot 1.2 deployment — version pin
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`),
  * backed by the same DataSketches `ItemsSketch` Pinot embeds.
  *
  * Unlike `approx_top_k` (q_sketch_topk), the sketch STATE here is a
  * first-class serialized binary column: per-segment sketches persist to
  * parquet and [[FreqUnionAgg]] merges stored cells at query time — the
  * rollup pattern — with the Misra–Gries guarantee intact (true count ∈
  * [estimate − maxError, estimate]; maxError = 0 ⇒ counts are EXACT, which
  * holds whenever a cell's distinct-item count stays under ~0.75·maxMapSize).
  *
  * 100 TB posture: TypedImperativeAggregate — partials combine map-side and
  * the shuffle carries one ≤maxMapSize-entry map per group regardless of
  * row count.
  */
object FreqOps {
  private def serde = new ArrayOfStringsSerDe

  def wrap(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), serde)

  def toBytes(sk: ItemsSketch[String]): Array[Byte] = sk.toByteArray(serde)

  /** Canonical top-k string `item:est|item:est|…`, ordered by (estimate
    * desc, item asc) — a deterministic scalar cell (array outputs break the
    * driver's hash compare). NO_FALSE_POSITIVES: every listed item's true
    * count genuinely exceeds the error bound. */
  def topK(b: Array[Byte], k: Int): UTF8String = {
    val rows = wrap(b).getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
    val sorted = rows.sortBy(r => (-r.getEstimate, r.getItem))(
      Ordering.Tuple2(Ordering.Long, Ordering.String))
    UTF8String.fromString(
      sorted.take(k).map(r => s"${r.getItem}:${r.getEstimate}").mkString("|"))
  }

  /** Worst-case count error of the sketch; 0 ⇒ all estimates exact. */
  def maxError(b: Array[Byte]): Long = wrap(b).getMaximumError

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    toBytes(wrap(a).merge(wrap(b)))
}

/** Shared plumbing for the two frequent-items aggregates. */
abstract class FreqAggBase extends TypedImperativeAggregate[ItemsSketch[String]]
    with UnaryLike[Expression] {
  def maxMapSize: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def merge(a: ItemsSketch[String], b: ItemsSketch[String]): ItemsSketch[String] =
    a.merge(b)

  override def eval(sk: ItemsSketch[String]): Any = FreqOps.toBytes(sk)
  override def serialize(sk: ItemsSketch[String]): Array[Byte] = FreqOps.toBytes(sk)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] = FreqOps.wrap(bytes)
}

/** `freq_sketch_agg(col[, maxMapSize])` → serialized frequent-strings
  * sketch of the column (Pinot FREQUENT_STRINGS_SKETCH). maxMapSize must be
  * a power of 2; counts are exact while distinct items < ~0.75·maxMapSize. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase {

  override def prettyName: String = "freq_sketch_agg"

  override def update(sk: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) sk.update(v.asInstanceOf[UTF8String].toString)
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** `freq_union_agg(sketchCol[, maxMapSize])` → merge of STORED
  * frequent-strings sketches — query-time rollup over a persisted sketch
  * column. */
case class FreqUnionAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends FreqAggBase {

  override def prettyName: String = "freq_union_agg"

  override def update(sk: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) sk.merge(FreqOps.wrap(v.asInstanceOf[Array[Byte]])) else sk
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqUnionAgg =
    copy(child = c)
}

/** `freq_sketch_topk(sketch, k)` → canonical `item:count|…` string of the k
  * most frequent items (estimate desc, item asc). */
case class FreqSketchTopK(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "freq_sketch_topk"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)

  override def nullSafeEval(b: Any, k: Any): Any =
    FreqOps.topK(b.asInstanceOf[Array[Byte]], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, k) => s"graft.expressions.FreqOps.topK($b, $k)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `freq_sketch_max_error(sketch)` → worst-case count error (0 = exact). */
case class FreqSketchMaxError(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_sketch_max_error"
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  override def nullSafeEval(b: Any): Any =
    FreqOps.maxError(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.expressions.FreqOps.maxError($b)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Column-API surface for the frequent-items family. */
object FreqSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.GraftBridge.{column, expression}
  import org.apache.spark.sql.functions.lit

  def freqSketchAgg(c: Column, maxMapSize: Int = 256): Column =
    column(FreqSketchAgg(expression(c), maxMapSize).toAggregateExpression())
  def freqUnionAgg(c: Column, maxMapSize: Int = 256): Column =
    column(FreqUnionAgg(expression(c), maxMapSize).toAggregateExpression())
  def freqTopK(c: Column, k: Int): Column =
    column(FreqSketchTopK(expression(c), expression(lit(k))))
  def freqMaxError(c: Column): Column = column(FreqSketchMaxError(expression(c)))
}
