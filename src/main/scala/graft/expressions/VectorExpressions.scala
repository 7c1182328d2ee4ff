package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Static vector kernels called from both interpreted eval and generated
  * code (the standard Spark pattern for loop-heavy expressions: whole-stage
  * codegen emits one static call, keeping the operator inside the generated
  * stage with no virtual dispatch per element).
  *
  * Accumulation is float64 over float32 inputs — matches sequential
  * accumulation semantics, deterministic regardless of partitioning because
  * the loop order is the array order.
  */
object VectorOps {
  /** Cosine similarity; NaN when either norm is zero (mapped to SQL NULL). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) Double.NaN else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      }
      i += 1
    }
    acc
  }

  /** Minkowski distance, p ∈ {1, 2} (Pinot l1Distance / l2Distance). */
  def minkowski(a: ArrayData, b: ArrayData, p: Int): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      val y = if (b.isNullAt(i)) 0.0 else b.getFloat(i).toDouble
      val d = math.abs(x - y)
      acc += (if (p == 1) d else d * d)
      i += 1
    }
    if (p == 1) acc else math.sqrt(acc)
  }

  /** L2 norm (Pinot vectorNorm). */
  def norm(a: ArrayData): Double = {
    var acc = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      acc += x * x
      i += 1
    }
    math.sqrt(acc)
  }
}

/** `cosine_sim(a, b)` — native Catalyst expression for the similarity-search
  * extension (SURVEY.md §2.11 X2). A Scala UDF here would deserialize both
  * arrays per row; this stays on `ArrayData` (zero-copy over the columnar
  * batch) and participates in whole-stage codegen — the hot path of the
  * brute-force top-k scan at 100 TB.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r = VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (java.lang.Double.isNaN(r)) null else r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |double graftCos = graft.expressions.VectorOps.cosine($a, $b);
         |if (Double.isNaN(graftCos)) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graftCos;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `dot_product(a, b)` — float64 dot product over float32 embeddings. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `minkowski_distance(a, b, p)` with p ∈ {1,2} — Pinot's l1Distance /
  * l2Distance scalar vector family (vector index sidecar functions in 1.2). */
case class MinkowskiDistance(left: Expression, right: Expression, p: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(p == 1 || p == 2, s"minkowski_distance: p must be 1 or 2, got $p")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType, containsNull = true), ArrayType(FloatType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"l${p}_distance"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.minkowski(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorOps.minkowski($a, $b, $p)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `vector_norm(a)` — L2 norm (Pinot vectorNorm). */
case class VectorNorm(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType, containsNull = true))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_norm"

  override def nullSafeEval(a: Any): Any =
    VectorOps.norm(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.VectorOps.norm($a)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
