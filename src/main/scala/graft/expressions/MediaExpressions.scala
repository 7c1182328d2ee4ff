package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types._

/** Byte-level media kernels for the multimodal family (SURVEY.md §2.11 X4):
  * feature extraction over opaque `binary` payloads runs as a single pass
  * over the byte array instead of per-byte SQL lambdas — the
  * `transform(sequence(1, n), i -> ascii(substring(...)))` form re-scans
  * the string per element (O(n²) per frame) and allocates an array row. */
object MediaOps {
  /** Mean unsigned byte value. Caller handles empty (expression → null). */
  def byteAvg(b: Array[Byte]): Double = {
    var s = 0L
    var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s.toDouble / b.length
  }
}

/** `byte_avg(binary)` → mean unsigned byte value; NULL for empty input. */
case class ByteAvg(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_avg"

  override def nullSafeEval(b: Any): Any = {
    val bytes = b.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) null else MediaOps.byteAvg(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |if ($b.length == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.expressions.MediaOps.byteAvg($b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
