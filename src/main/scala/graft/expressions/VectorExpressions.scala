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
