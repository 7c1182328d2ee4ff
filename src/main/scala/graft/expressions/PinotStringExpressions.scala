package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pinot StringFunctions vocabulary with JAVA-EXACT semantics that Spark's
  * natives don't match (the reference's console/Tableau queries assume the
  * Pinot library behavior — e.g. `split` is a LITERAL whole-separator split
  * with empty tokens dropped, not Spark's regex split):
  *
  *  - `split(input, delimiter, limit)` — commons
  *    `StringUtils.splitByWholeSeparator(input, delimiter, limit)`: at most
  *    `limit` tokens, adjacent separators coalesce, the LAST token carries
  *    the remainder of the input including separators. (The 2-arg form is
  *    composed from native expressions in the registry; this class exists
  *    for the remainder-carrying limit form, whose semantics native
  *    expressions cannot express.)
  *  - `strpos(input, find, instance)` — commons
  *    `StringUtils.ordinalIndexOf`: 0-based index of the instance-th
  *    occurrence, −1 when absent (Pinot wraps Java `indexOf` conventions).
  *  - `hammingDistance(a, b)` — Pinot returns −1 on unequal lengths, else
  *    the count of differing UTF-16 positions (Java `charAt` loop).
  *
  * These are compat-session scalars off every hot path, so eval-mode
  * (CodegenFallback) is the right cost point — the kernels ARE the
  * library calls they replicate.
  */
case class SplitWholeLimit(str: Expression, sep: Expression, limitExpr: Expression)
  extends TernaryExpression with ExpectsInputTypes with CodegenFallback {

  override def first: Expression = str
  override def second: Expression = sep
  override def third: Expression = limitExpr

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "split"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, IntegerType)

  override protected def nullSafeEval(s: Any, d: Any, n: Any): Any = {
    val parts = org.apache.commons.lang3.StringUtils.splitByWholeSeparator(
      s.asInstanceOf[UTF8String].toString,
      d.asInstanceOf[UTF8String].toString,
      n.asInstanceOf[Int])
    new GenericArrayData(parts.map(p => UTF8String.fromString(p): Any))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SplitWholeLimit =
    copy(str = newFirst, sep = newSecond, limitExpr = newThird)
}

/** `strpos(input, find, instance)` — 0-based ordinal indexOf, −1 absent. */
case class StrPosOrdinal(str: Expression, find: Expression, instance: Expression)
  extends TernaryExpression with ExpectsInputTypes with CodegenFallback {

  override def first: Expression = str
  override def second: Expression = find
  override def third: Expression = instance

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "strpos"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, IntegerType)

  override protected def nullSafeEval(s: Any, f: Any, n: Any): Any =
    org.apache.commons.lang3.StringUtils.ordinalIndexOf(
      s.asInstanceOf[UTF8String].toString,
      f.asInstanceOf[UTF8String].toString,
      n.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): StrPosOrdinal =
    copy(str = newFirst, find = newSecond, instance = newThird)
}

/** `strrpos(input, find[, instance])` — 0-based LAST indexOf, −1 absent;
  * the instance form counts occurrences from the END (commons
  * `lastOrdinalIndexOf`; instance 1 ≡ plain `lastIndexOf`). */
case class StrRPosOrdinal(str: Expression, find: Expression, instance: Expression)
  extends TernaryExpression with ExpectsInputTypes with CodegenFallback {

  override def first: Expression = str
  override def second: Expression = find
  override def third: Expression = instance

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "strrpos"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType, IntegerType)

  override protected def nullSafeEval(s: Any, f: Any, n: Any): Any =
    org.apache.commons.lang3.StringUtils.lastOrdinalIndexOf(
      s.asInstanceOf[UTF8String].toString,
      f.asInstanceOf[UTF8String].toString,
      n.asInstanceOf[Int])

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): StrRPosOrdinal =
    copy(str = newFirst, find = newSecond, instance = newThird)
}

/** `normalize(str[, form])` — Pinot StringFunctions wraps
  * `java.text.Normalizer` (NFC default; NFD/NFKC/NFKD accepted). */
case class NormalizeStr(str: Expression, form: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def left: Expression = str
  override def right: Expression = form

  override def dataType: DataType = StringType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "normalize"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(
        f.asInstanceOf[UTF8String].toString.toUpperCase(java.util.Locale.ROOT))))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NormalizeStr =
    copy(str = newLeft, form = newRight)
}

/** `hammingDistance(a, b)` — −1 on unequal lengths, else differing
  * UTF-16 positions (Pinot StringFunctions' charAt loop, bit-exact). */
case class HammingDistanceStr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "hammingdistance"
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val s1 = a.asInstanceOf[UTF8String].toString
    val s2 = b.asInstanceOf[UTF8String].toString
    if (s1.length != s2.length) -1
    else {
      var d = 0; var i = 0
      while (i < s1.length) { if (s1.charAt(i) != s2.charAt(i)) d += 1; i += 1 }
      d
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistanceStr =
    copy(left = newLeft, right = newRight)
}
