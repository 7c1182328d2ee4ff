package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** CLP-class log encoding — the column model behind Pinot 1.2's CLPDECODE
  * (Pinot splits a CLP-ingested log field into `<f>_logtype`,
  * `<f>_dictionaryVars`, `<f>_encodedVars`; version pin
  * `/root/reference/resources/bastion/bastionUserData.sh:7`). The engine
  * ships both directions: [[ClpEncode]] produces the three-column struct
  * and [[ClpDecode]] losslessly reconstructs the original message, so the
  * Pinot query spelling `CLPDECODE(logtype, dictionaryVars, encodedVars)`
  * works over columns this engine ingested.
  *
  * Encoding contract (documented graft semantics — CLP's byte-level
  * archive format is not replicated, its COLUMN MODEL is):
  *   - tokens are maximal runs not containing a delimiter; delimiters are
  *     space and '=' (kept verbatim in the logtype);
  *   - a token of pure digits with optional leading '-' that round-trips
  *     through Long → ENCODED INT var (placeholder U+0011), value in
  *     `encoded_vars`;
  *   - a token that round-trips EXACTLY through Double.toString → ENCODED
  *     FLOAT var (placeholder U+0013), `doubleToLongBits` in
  *     `encoded_vars` — the round-trip test is what makes decode lossless;
  *   - any other token containing a digit → DICTIONARY var (placeholder
  *     U+0012), stored in `dictionary_vars`;
  *   - everything else stays in the logtype.
  * Decode walks the logtype, popping the right list per placeholder; ints
  * render via Long.toString, floats via Double.toString — bit-for-bit the
  * strings the encoder admitted. `decode(encode(x)) == x` for EVERY input
  * (ClpSpec property-checks this over fixture text and adversarial
  * strings).
  */
object ClpKernels {

  val DictPh: Char = '\u0012'
  val IntPh: Char = '\u0011'
  val FloatPh: Char = '\u0013'

  val structType: StructType = StructType(Seq(
    StructField("logtype", StringType),
    StructField("dictionary_vars", ArrayType(StringType, containsNull = false)),
    StructField("encoded_vars", ArrayType(LongType, containsNull = false))))

  private def isDelim(c: Char): Boolean = c == ' ' || c == '='

  private def classify(tok: String,
      logtype: java.lang.StringBuilder,
      dict: mutable.ArrayBuffer[UTF8String],
      enc: mutable.ArrayBuffer[Long]): Unit = {
    var hasDigit = false
    var i = 0
    while (i < tok.length && !hasDigit) {
      if (tok.charAt(i) >= '0' && tok.charAt(i) <= '9') hasDigit = true
      i += 1
    }
    if (!hasDigit) { logtype.append(tok); return }
    // int: optional '-', all digits, Long round-trip (rejects overflow and
    // leading zeros, which Long.toString would not reproduce)
    val intLike = tok.matches("-?[0-9]+")
    if (intLike) {
      try {
        val v = java.lang.Long.parseLong(tok)
        if (java.lang.Long.toString(v) == tok) {
          logtype.append(IntPh); enc += v; return
        }
      } catch { case _: NumberFormatException => }
    }
    // float: exact Double.toString round-trip (shortest-repr strings only)
    if (!intLike && tok.indexOf('.') >= 0) {
      try {
        val v = java.lang.Double.parseDouble(tok)
        if (!v.isNaN && !v.isInfinite && java.lang.Double.toString(v) == tok) {
          logtype.append(FloatPh)
          enc += java.lang.Double.doubleToLongBits(v)
          return
        }
      } catch { case _: NumberFormatException => }
    }
    logtype.append(DictPh)
    dict += UTF8String.fromString(tok)
  }

  /** message → InternalRow(logtype, dictionary_vars, encoded_vars). */
  def encode(msg: UTF8String): InternalRow = {
    val s = msg.toString
    val logtype = new java.lang.StringBuilder(s.length)
    val dict = mutable.ArrayBuffer.empty[UTF8String]
    val enc = mutable.ArrayBuffer.empty[Long]
    var i = 0
    var tokStart = -1
    while (i <= s.length) {
      val atEnd = i == s.length
      if (!atEnd && !isDelim(s.charAt(i))) {
        if (tokStart < 0) tokStart = i
      } else {
        if (tokStart >= 0) {
          classify(s.substring(tokStart, i), logtype, dict, enc)
          tokStart = -1
        }
        if (!atEnd) logtype.append(s.charAt(i))
      }
      i += 1
    }
    InternalRow(
      UTF8String.fromString(logtype.toString),
      new GenericArrayData(dict.toArray[Any]),
      new GenericArrayData(enc.toArray[Any]))
  }

  /** (logtype, dictionary_vars, encoded_vars) → original message. Returns
    * null when the variable counts do not satisfy the logtype (the Pinot
    * CLPDECODE default-on-failure contract). */
  def decode(logtype: UTF8String, dict: ArrayData, enc: ArrayData): UTF8String = {
    val s = logtype.toString
    val out = new java.lang.StringBuilder(s.length + 16 * (dict.numElements() + enc.numElements()))
    var di = 0
    var ei = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case DictPh =>
          if (di >= dict.numElements()) return null
          out.append(dict.getUTF8String(di).toString); di += 1
        case IntPh =>
          if (ei >= enc.numElements()) return null
          out.append(java.lang.Long.toString(enc.getLong(ei))); ei += 1
        case FloatPh =>
          if (ei >= enc.numElements()) return null
          out.append(java.lang.Double.toString(
            java.lang.Double.longBitsToDouble(enc.getLong(ei)))); ei += 1
        case c => out.append(c)
      }
      i += 1
    }
    if (di != dict.numElements() || ei != enc.numElements()) return null
    UTF8String.fromString(out.toString)
  }
}

/** `clp_encode(message)` → struct(logtype, dictionary_vars, encoded_vars). */
case class ClpEncode(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ClpKernels.structType
  override def prettyName: String = "clp_encode"

  override protected def nullSafeEval(input: Any): Any =
    ClpKernels.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ClpKernels.encode($c)")

  override protected def withNewChildInternal(newChild: Expression): ClpEncode =
    copy(child = newChild)
}

/** `clpdecode(logtype, dictionaryVars, encodedVars)` — Pinot spelling;
  * yields null (or the 4-arg default) when the columns are inconsistent. */
case class ClpDecode(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(
    StringType,
    ArrayType(StringType, containsNull = false),
    ArrayType(LongType, containsNull = false))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "clpdecode"

  override protected def nullSafeEval(l: Any, d: Any, e: Any): Any =
    ClpKernels.decode(
      l.asInstanceOf[UTF8String],
      d.asInstanceOf[ArrayData],
      e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, d, e) => {
      s"""
         |${ev.value} = graft.expressions.ClpKernels.decode($l, $d, $e);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ClpDecode =
    copy(first = f, second = s, third = t)
}
