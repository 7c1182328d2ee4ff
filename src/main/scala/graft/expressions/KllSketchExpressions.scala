package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KLL quantile sketches — Pinot's `PERCENTILE_KLL` / `PERCENTILE_RAW_KLL`
  * (`[P1.2]`, on the reference's unmodified Pinot 1.2 deployment — version
  * pin `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`),
  * backed by the same DataSketches `KllDoublesSketch` Pinot embeds. KLL
  * carries a PROVEN worst-case normalized rank error (~1.65% at k=200,
  * shrinking ~1/k) — a guarantee Spark's Greenwald–Khanna
  * `percentile_approx` does not make — and its serialized state is a
  * mergeable column: per-segment sketches persist and [[KllMergeAgg]]
  * rolls them up at query time.
  *
  * 100 TB posture: TypedImperativeAggregate — partials merge map-side, one
  * O(k·log(n/k))-entry sketch per group crosses the shuffle regardless of
  * row count.
  */
object KllOps {
  def wrap(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(b))

  /** Quantile at normalized rank `q` ∈ [0,1] (INCLUSIVE criteria — the
    * DataSketches/Pinot default: smallest value whose rank ≥ q). */
  def quantile(b: Array[Byte], q: Double): Double = {
    val sk = wrap(b)
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(q, QuantileSearchCriteria.INCLUSIVE)
  }
}

/** Shared plumbing for the two KLL aggregates: the buffer IS the sketch. */
abstract class KllAggBase extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {
  def k: Int

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(sk: KllDoublesSketch): Any = sk.toByteArray
  override def serialize(sk: KllDoublesSketch): Array[Byte] = sk.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllOps.wrap(bytes)
}

/** `kll_sketch_agg(col[, k])` → serialized KLL doubles sketch of the
  * column (Pinot PERCENTILE_RAW_KLL). k=200 ≈ 1.65% rank error; error
  * scales ~1/k. */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def prettyName: String = "kll_sketch_agg"

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType => sk.update(v.asInstanceOf[Double])
      case FloatType => sk.update(v.asInstanceOf[Float].toDouble)
      case IntegerType => sk.update(v.asInstanceOf[Int].toDouble)
      case LongType => sk.update(v.asInstanceOf[Long].toDouble)
      case ShortType => sk.update(v.asInstanceOf[Short].toDouble)
      case dt => throw new UnsupportedOperationException(
        s"kll_sketch_agg: numeric input required, got $dt")
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_merge_agg(sketchCol[, k])` → merge of STORED KLL sketches — the
  * query-time rollup over a persisted sketch column. */
case class KllMergeAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def prettyName: String = "kll_merge_agg"

  override def update(sk: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) sk.merge(KllOps.wrap(v.asInstanceOf[Array[Byte]]))
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_quantile(sketch, q)` → quantile at normalized rank q ∈ [0,1]. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override def inputTypes: Seq[DataType] = Seq(BinaryType, DoubleType)

  override def nullSafeEval(b: Any, q: Any): Any =
    KllOps.quantile(b.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, q) => s"graft.expressions.KllOps.quantile($b, $q)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API surface for the KLL family. */
object KllSketch {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.GraftBridge.{column, expression}
  import org.apache.spark.sql.functions.lit

  def kllSketchAgg(c: Column, k: Int = 200): Column =
    column(KllSketchAgg(expression(c), k).toAggregateExpression())
  def kllMergeAgg(c: Column, k: Int = 200): Column =
    column(KllMergeAgg(expression(c), k).toAggregateExpression())
  def kllQuantile(c: Column, q: Double): Column =
    column(KllQuantile(expression(c), expression(lit(q))))
}
