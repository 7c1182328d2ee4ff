package graft.expressions

import org.apache.datasketches.hll.{HllSketch, TgtHllType, Union => HllUnion}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Pinot MV (multi-value column) aggregate family — the `…MV` vocabulary of
  * the deployed Pinot 1.2.0 endpoint (version pinned at
  * `/root/reference/resources/pinot/userData/userdata-pinotserver.sh:5`):
  * DISTINCTCOUNTMV / DISTINCTCOUNTHLLMV / DISTINCTSUMMV / DISTINCTAVGMV /
  * PERCENTILEMV / MINMAXRANGEMV, complementing the COUNTMV/SUMMV/MINMV/
  * MAXMV/AVGMV compositions already in the registry.
  *
  * Why real aggregates instead of explode: an MV aggregate's group state is
  * a property of the ELEMENT set, so [[DistinctMvAgg]] and [[HllMvAgg]] are
  * TypedImperativeAggregates that iterate each row's ArrayData in place —
  * partials combine map-side, the shuffle carries one distinct-set (or one
  * HLL sketch) per group, and no exploded row stream ever exists. At 100 TB
  * that's the difference between shuffling |rows × arity| values and
  * |distinct| per group.
  */
object MvAggs {

  private def fn(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, false)

  /** Exact distinct element count across all arrays in the group. */
  def distinctCountMv(arr: Expression): Expression =
    DistinctMvAgg(arr, DistinctMvAgg.Count).toAggregateExpression()

  /** Approximate distinct element count (DataSketches HLL, default lgK 12 —
    * the Pinot DISTINCTCOUNTHLLMV default log2m). */
  def distinctCountHllMv(arr: Expression, lgK: Int = 12): Expression =
    HllMvAgg(arr, lgK).toAggregateExpression()

  /** Sum of the DISTINCT numeric elements (long for integral element types,
    * double otherwise — Pinot DISTINCTSUMMV result typing). */
  def distinctSumMv(arr: Expression): Expression =
    DistinctMvAgg(arr, DistinctMvAgg.Sum).toAggregateExpression()

  /** Mean of the DISTINCT numeric elements. */
  def distinctAvgMv(arr: Expression): Expression =
    DistinctMvAgg(arr, DistinctMvAgg.Avg).toAggregateExpression()

  /** Percentile (0-100, Pinot convention) over every element of every array
    * in the group, with the same linear interpolation as the registry's SV
    * `percentile` (Spark Percentile: index p·(n−1), interpolate between
    * floor and ceil) — so PERCENTILEMV(arr, p) on exploded data and
    * `percentile` agree bit-for-bit. Null elements are not expected (the
    * composition would sort them last; Percentile ignores them). */
  def percentileMv(arr: Expression, p: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("x"))
    val dbls = fn("transform", arr, LambdaFunction(Cast(x, DoubleType), Seq(x)))
    val lst = fn("array_sort",
      Flatten(CollectList(dbls).toAggregateExpression()))
    val n = Size(lst)
    val idx = Multiply(
      Divide(Cast(p, DoubleType), Literal(100.0)),
      Cast(Subtract(n, Literal(1)), DoubleType))
    val lo = Floor(idx)
    val hi = Ceil(idx)
    val vLo = ElementAt(lst, Cast(Add(lo, Literal(1L)), IntegerType))
    val vHi = ElementAt(lst, Cast(Add(hi, Literal(1L)), IntegerType))
    // Spark Percentile's association: (hi−pos)·vLo + (pos−lo)·vHi, with the
    // exact-index short-circuit — NOT vLo + (vHi−vLo)·frac, which differs by
    // up to 1 ulp on non-exact doubles (ADVICE r5)
    val interp = Add(
      Multiply(Subtract(Cast(hi, DoubleType), idx), vLo),
      Multiply(Subtract(idx, Cast(lo, DoubleType)), vHi))
    If(LessThan(n, Literal(1)),
      Literal(null, DoubleType),
      If(EqualTo(lo, hi), vLo, interp))
  }

  /** MAX(array_max) − MIN(array_min) over the group (MINMAXRANGEMV). */
  def minMaxRangeMv(arr: Expression): Expression =
    Subtract(
      Max(fn("array_max", arr)).toAggregateExpression(),
      Min(fn("array_min", arr)).toAggregateExpression())

  /** Approximate MV percentile (PERCENTILEKLLMV / PERCENTILEESTMV /
    * PERCENTILETDIGESTMV): one KLL doubles sketch per group, updated per
    * ELEMENT — the fixed-state alternative to [[percentileMv]]'s exact
    * collect (state ≤ the KLL k-bound however many rows × arity flow in).
    * p is the Pinot 0–100 convention. */
  def percentileKllMv(arr: Expression, p: Expression): Expression =
    KllQuantile(
      KllMvAgg(arr).toAggregateExpression(),
      Divide(Cast(p, DoubleType), Literal(100.0)))
}

object DistinctMvAgg {
  sealed trait Mode extends Serializable
  case object Count extends Mode
  case object Sum extends Mode
  case object Avg extends Mode
}

/** Exact distinct-element aggregate over an array column. Buffer = the set
  * of distinct elements seen (boxed primitives / strings — strictly smaller
  * state than collecting distinct ARRAYS, and no exploded rows). Elements
  * are normalized (integrals → Long, fractionals → Double, strings →
  * String) so 1 and 1L count once. Serialization is plain Java — the buffer
  * crosses the wire once per partition per group. */
case class DistinctMvAgg(
    child: Expression,
    mode: DistinctMvAgg.Mode,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]] with UnaryLike[Expression] {

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"${prettyName} expects an array column, got $other")
  }

  private lazy val integral: Boolean = elemType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def prettyName: String = mode match {
    case DistinctMvAgg.Count => "distinct_count_mv"
    case DistinctMvAgg.Sum => "distinct_sum_mv"
    case DistinctMvAgg.Avg => "distinct_avg_mv"
  }

  override def dataType: DataType = mode match {
    case DistinctMvAgg.Count => LongType
    case DistinctMvAgg.Sum => if (integral) LongType else DoubleType
    case DistinctMvAgg.Avg => DoubleType
  }

  override def nullable: Boolean = mode != DistinctMvAgg.Count

  override def createAggregationBuffer(): mutable.HashSet[Any] = mutable.HashSet.empty

  override def update(buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) buf += normalize(arr, i)
        i += 1
      }
    }
    buf
  }

  private def normalize(arr: ArrayData, i: Int): Any = elemType match {
    case ByteType => arr.getByte(i).toLong
    case ShortType => arr.getShort(i).toLong
    case IntegerType => arr.getInt(i).toLong
    case LongType => arr.getLong(i)
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case StringType => arr.getUTF8String(i).toString
    case BooleanType => arr.getBoolean(i)
    case other => throw new IllegalArgumentException(
      s"$prettyName: unsupported element type $other")
  }

  override def merge(a: mutable.HashSet[Any], b: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    a ++= b; a
  }

  override def eval(buf: mutable.HashSet[Any]): Any = mode match {
    case DistinctMvAgg.Count => buf.size.toLong
    case DistinctMvAgg.Sum =>
      if (buf.isEmpty) null
      else if (integral) buf.iterator.map(_.asInstanceOf[Long]).sum
      else buf.iterator.map(_.asInstanceOf[Double]).sum
    case DistinctMvAgg.Avg =>
      if (buf.isEmpty) null
      else {
        val it: Iterator[Double] = buf.iterator.map {
          case l: java.lang.Long => l.toDouble
          case d: java.lang.Double => d.doubleValue()
          case other => throw new IllegalArgumentException(
            s"distinct_avg_mv over non-numeric element $other")
        }
        var s = 0.0; var n = 0
        it.foreach { d => s += d; n += 1 }
        s / n
      }
  }

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buf); oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
    try ois.readObject().asInstanceOf[mutable.HashSet[Any]] finally ois.close()
  }

  override def withNewMutableAggBufferOffset(o: Int): DistinctMvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DistinctMvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Approximate distinct-element aggregate over an array column: one
  * DataSketches HLL union per group, updated per ELEMENT in place — the
  * Pinot DISTINCTCOUNTHLLMV shape (fixed ≤2^lgK state per group however
  * many rows or elements flow in). */
case class HllMvAgg(
    child: Expression,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllUnion] with UnaryLike[Expression] {

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"distinct_count_hll_mv expects an array column, got $other")
  }

  override def prettyName: String = "distinct_count_hll_mv"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): HllUnion = new HllUnion(lgK)

  override def update(u: HllUnion, input: InternalRow): HllUnion = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) elemType match {
          case ByteType => u.update(arr.getByte(i).toLong)
          case ShortType => u.update(arr.getShort(i).toLong)
          case IntegerType => u.update(arr.getInt(i).toLong)
          case LongType => u.update(arr.getLong(i))
          case FloatType => u.update(arr.getFloat(i).toDouble)
          case DoubleType => u.update(arr.getDouble(i))
          case StringType => u.update(arr.getUTF8String(i).toString)
          case other => throw new IllegalArgumentException(
            s"distinct_count_hll_mv: unsupported element type $other")
        }
        i += 1
      }
    }
    u
  }

  override def merge(a: HllUnion, b: HllUnion): HllUnion = {
    a.update(b.getResult(TgtHllType.HLL_8)); a
  }

  override def eval(u: HllUnion): Any = Math.round(u.getEstimate)

  override def serialize(u: HllUnion): Array[Byte] =
    u.getResult(TgtHllType.HLL_8).toCompactByteArray

  override def deserialize(bytes: Array[Byte]): HllUnion = {
    val u = new HllUnion(lgK)
    u.update(HllSketch.heapify(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): HllMvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllMvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Per-element KLL quantile sketch over an array column (the MV form of
  * `kll_sketch_agg`): serialized mergeable sketch bytes out, ≤k-bounded
  * state per group — feed [[KllQuantile]] for the PERCENTILE…MV estimate
  * or persist the bytes as a sketch column. */
case class KllMvAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"kll_mv_agg expects an array column, got $other")
  }

  override def prettyName: String = "kll_mv_agg"

  override def update(sk: org.apache.datasketches.kll.KllDoublesSketch,
      input: InternalRow): org.apache.datasketches.kll.KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) elemType match {
          case DoubleType => sk.update(arr.getDouble(i))
          case FloatType => sk.update(arr.getFloat(i).toDouble)
          case IntegerType => sk.update(arr.getInt(i).toDouble)
          case LongType => sk.update(arr.getLong(i).toDouble)
          case ShortType => sk.update(arr.getShort(i).toDouble)
          case ByteType => sk.update(arr.getByte(i).toDouble)
          case other => throw new IllegalArgumentException(
            s"kll_mv_agg: unsupported element type $other")
        }
        i += 1
      }
    }
    sk
  }

  override def withNewMutableAggBufferOffset(o: Int): KllMvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
