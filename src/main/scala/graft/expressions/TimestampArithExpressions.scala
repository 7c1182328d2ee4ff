package graft.expressions

import java.time.{Instant, ZoneOffset, ZonedDateTime}
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Pinot `timestampAdd(unit, amount, ts)` / `timestampDiff(unit, ts1, ts2)`
  * (aliases `dateAdd` / `dateDiff`) — DateTimeFunctions in the deployed
  * Pinot 1.2.0 (`/root/reference/resources/bastion/bastionUserData.sh:7`).
  * The unit is a STRING LITERAL (Pinot's form), unlike Spark's native
  * `timestampadd(DAY, ...)` whose unit is special parser syntax — so
  * registering these names serves the ported spelling while the native
  * identifier form keeps parsing through its own grammar rule, never the
  * registry.
  *
  * Semantics: calendar arithmetic in the UTC chronology (Pinot uses the
  * UTC ISO chronology regardless of any session zone), end-of-month
  * clamping on add (Jan 31 + 1 MONTH = Feb 28/29), diff = full units
  * elapsed from ts1 to ts2 (calendar-aware, truncated toward zero — NOT
  * boundary counting). Units: YEAR QUARTER MONTH WEEK DAY HOUR MINUTE
  * SECOND MILLISECOND, case-insensitive; anything else fails loudly at
  * analysis.
  *
  * Polymorphic on the RESOLVED input type (the EpochField doctrine):
  * LONG/INT = Pinot epoch millis (result LONG millis), TIMESTAMP = micros
  * instant (result TIMESTAMP), TIMESTAMP_NTZ = wall time taken as UTC.
  * Code-generated via static [[TimestampArithKernels]] calls.
  */
object TimestampArithKernels {

  final val YEAR = 0
  final val QUARTER = 1
  final val MONTH = 2
  final val WEEK = 3
  final val DAY = 4
  final val HOUR = 5
  final val MINUTE = 6
  final val SECOND = 7
  final val MILLISECOND = 8

  def unitId(unit: String): Int = unit.toUpperCase(java.util.Locale.ROOT) match {
    case "YEAR" => YEAR
    case "QUARTER" => QUARTER
    case "MONTH" => MONTH
    case "WEEK" => WEEK
    case "DAY" => DAY
    case "HOUR" => HOUR
    case "MINUTE" => MINUTE
    case "SECOND" => SECOND
    case "MILLISECOND" => MILLISECOND
    case other => throw new IllegalArgumentException(
      s"timestampAdd/timestampDiff: unsupported unit '$other' (YEAR, QUARTER, " +
        "MONTH, WEEK, DAY, HOUR, MINUTE, SECOND, MILLISECOND)")
  }

  private def addZ(u: Int, amount: Long, z: ZonedDateTime): ZonedDateTime = u match {
    case YEAR => z.plusYears(amount)
    case QUARTER => z.plusMonths(Math.multiplyExact(amount, 3L))
    case MONTH => z.plusMonths(amount)
    case WEEK => z.plusWeeks(amount)
    case DAY => z.plusDays(amount)
    case HOUR => z.plusHours(amount)
    case MINUTE => z.plusMinutes(amount)
    case SECOND => z.plusSeconds(amount)
    case MILLISECOND => z.plus(amount, ChronoUnit.MILLIS)
  }

  /** Variable-length-unit difference with the JODA (= Pinot) add-based
    * rule: the largest |n| with a.plus(n units) between a and b — the
    * CLAMPED add decides, so Jan 31 → Feb 29 is one full month (java.time's
    * ChronoUnit.MONTHS.between says 0 there: it compares day-of-month and
    * never re-applies the clamped add; Joda's field.getDifference does).
    * The correction loop moves at most one step per clamp. */
  private def addBasedDiff(a: ZonedDateTime, b: ZonedDateTime,
      plus: (ZonedDateTime, Long) => ZonedDateTime, seed: Long): Long = {
    var n = seed
    if (!b.isBefore(a)) {
      while (!plus(a, n + 1).isAfter(b)) n += 1
      while (plus(a, n).isAfter(b)) n -= 1
    } else {
      while (!plus(a, n - 1).isBefore(b)) n -= 1
      while (plus(a, n).isBefore(b)) n += 1
    }
    n
  }

  private def diffZ(u: Int, a: ZonedDateTime, b: ZonedDateTime): Long = u match {
    case YEAR =>
      addBasedDiff(a, b, (z, n) => z.plusYears(n), ChronoUnit.YEARS.between(a, b))
    case QUARTER =>
      addBasedDiff(a, b, (z, n) => z.plusMonths(n), ChronoUnit.MONTHS.between(a, b)) / 3L
    case MONTH =>
      addBasedDiff(a, b, (z, n) => z.plusMonths(n), ChronoUnit.MONTHS.between(a, b))
    case WEEK => ChronoUnit.WEEKS.between(a, b)
    case DAY => ChronoUnit.DAYS.between(a, b)
    case HOUR => ChronoUnit.HOURS.between(a, b)
    case MINUTE => ChronoUnit.MINUTES.between(a, b)
    case SECOND => ChronoUnit.SECONDS.between(a, b)
    case MILLISECOND => ChronoUnit.MILLIS.between(a, b)
  }

  private def zOfMillis(ms: Long): ZonedDateTime =
    Instant.ofEpochMilli(ms).atZone(ZoneOffset.UTC)

  private def zOfMicros(us: Long): ZonedDateTime =
    Instant.EPOCH.plus(us, ChronoUnit.MICROS).atZone(ZoneOffset.UTC)

  private def toMicros(z: ZonedDateTime): Long = {
    val i = z.toInstant
    Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
  }

  def addMillis(u: Int, amount: Long, ms: Long): Long =
    addZ(u, amount, zOfMillis(ms)).toInstant.toEpochMilli

  def addMicros(u: Int, amount: Long, us: Long): Long =
    toMicros(addZ(u, amount, zOfMicros(us)))

  def diffMillis(u: Int, a: Long, b: Long): Long = diffZ(u, zOfMillis(a), zOfMillis(b))

  def diffMicros(u: Int, a: Long, b: Long): Long = diffZ(u, zOfMicros(a), zOfMicros(b))
}

/** `timestampAdd('UNIT', amount, ts)` — see [[TimestampArithKernels]]. */
case class PinotTimestampAdd(unit: String, amount: Expression, ts: Expression)
  extends BinaryExpression {

  override def left: Expression = amount
  override def right: Expression = ts
  override def prettyName: String = "timestampadd"

  @transient private lazy val uid = TimestampArithKernels.unitId(unit)

  private def millisMode: Boolean = ts.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  override def dataType: DataType = if (millisMode) LongType else ts.dataType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val okAmount = amount.dataType match {
      case LongType | IntegerType => true
      case _ => false
    }
    val okTs = ts.dataType match {
      case LongType | IntegerType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    TimestampArithKernels.unitId(unit) // loud unit validation at analysis
    if (okAmount && okTs) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"timestampAdd expects (unit literal, integral amount, epoch-millis " +
          s"LONG or TIMESTAMP), got (${amount.dataType}, ${ts.dataType})")
    }
  }

  override protected def nullSafeEval(a: Any, t: Any): Any = {
    val amt = a match { case i: Int => i.toLong; case l: Long => l }
    val tv = t match { case i: Int => i.toLong; case l: Long => l }
    if (millisMode) TimestampArithKernels.addMillis(uid, amt, tv)
    else TimestampArithKernels.addMicros(uid, amt, tv)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.expressions.TimestampArithKernels"
    val fn = if (millisMode) "addMillis" else "addMicros"
    defineCodeGen(ctx, ev, (a, t) => s"$k.$fn($uid, (long)$a, (long)$t)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PinotTimestampAdd =
    copy(amount = newLeft, ts = newRight)
}

/** `timestampDiff('UNIT', ts1, ts2)` = full units from ts1 to ts2. */
case class PinotTimestampDiff(unit: String, ts1: Expression, ts2: Expression)
  extends BinaryExpression {

  override def left: Expression = ts1
  override def right: Expression = ts2
  override def prettyName: String = "timestampdiff"

  @transient private lazy val uid = TimestampArithKernels.unitId(unit)

  private def millisOf(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case LongType | IntegerType | TimestampType | TimestampNTZType => true
      case _ => false
    }
    TimestampArithKernels.unitId(unit)
    if (ok(ts1) && ok(ts2)) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"timestampDiff expects epoch-millis LONGs or TIMESTAMPs, got " +
          s"(${ts1.dataType}, ${ts2.dataType})")
    }
  }

  // Mixed LONG/TIMESTAMP operands are normalized to micros (millis × 1000)
  private def toUs(e: Expression, v: Any): Long = {
    val l = v match { case i: Int => i.toLong; case x: Long => x }
    if (millisOf(e)) Math.multiplyExact(l, 1000L) else l
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TimestampArithKernels.diffMicros(uid, toUs(ts1, a), toUs(ts2, b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.expressions.TimestampArithKernels"
    def us(e: Expression, v: String) =
      if (millisOf(e)) s"java.lang.Math.multiplyExact((long)$v, 1000L)" else s"(long)$v"
    defineCodeGen(ctx, ev, (a, b) => s"$k.diffMicros($uid, ${us(ts1, a)}, ${us(ts2, b)})")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PinotTimestampDiff =
    copy(ts1 = newLeft, ts2 = newRight)
}
