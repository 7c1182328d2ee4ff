package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pinot DateTimeFunctions field extractors — they take EPOCH MILLIS (not
  * timestamps) and default to UTC with an optional zone-id argument
  * (`year(millis)`, `year(millis, 'America/New_York')`, `dayOfWeek(millis)`
  * …). Spark's `year()` et al. read typed TIMESTAMP columns in the SESSION
  * zone, so a ported Pinot console query would silently shift at any
  * non-UTC session. These evaluate via `java.time` with an explicit
  * `ZoneId` — zero session-zone dependence, matching Pinot's Joda
  * semantics field for field (ISO dayOfWeek Monday=1, ISO weekOfYear and
  * week-based yearOfWeek, millisecond = millisOfSecond).
  *
  * Compat-session scalars off the hot path → eval-mode (CodegenFallback),
  * same cost argument as [[SplitWholeLimit]]. Zone ids resolve once per
  * distinct value through a small memo (the expression is typically built
  * with a literal zone).
  */
case class EpochField(field: String, millis: Expression, zone: Expression)
  extends BinaryExpression with CodegenFallback {

  override def left: Expression = millis
  override def right: Expression = zone

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = field

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    millis.dataType match {
      case LongType | IntegerType | TimestampType | TimestampNTZType | DateType
          if zone.dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects epoch millis (LONG, the Pinot form) or a " +
            s"DATE/TIMESTAMP (the Spark form), got $other")
    }

  @transient private lazy val zoneMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.time.ZoneId]()

  override protected def nullSafeEval(m: Any, z: Any): Any = {
    val zs = z.asInstanceOf[UTF8String].toString
    // bounded memo: the zone is normally a literal; a data-column zone
    // with unbounded cardinality must not grow per-task state
    val zid =
      if (zoneMemo.size < 1024) zoneMemo.computeIfAbsent(zs, s => java.time.ZoneId.of(s))
      else java.time.ZoneId.of(zs)
    // Polymorphic on the RESOLVED child type: integral = Pinot epoch
    // millis; TIMESTAMP = micros instant; NTZ micros = wall time (zone
    // ignored); DATE = days (zone-free) — so native Spark spellings keep
    // working on a Pinot-mode session where these names are registered.
    val ldt = millis.dataType match {
      case LongType | IntegerType =>
        val ms = m match { case i: Int => i.toLong; case l: Long => l }
        java.time.LocalDateTime.ofInstant(java.time.Instant.ofEpochMilli(ms), zid)
      case TimestampType =>
        java.time.LocalDateTime.ofInstant(
          java.time.Instant.EPOCH.plus(m.asInstanceOf[Long], java.time.temporal.ChronoUnit.MICROS), zid)
      case TimestampNTZType =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(m.asInstanceOf[Long], 1000000L),
          (Math.floorMod(m.asInstanceOf[Long], 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType =>
        java.time.LocalDate.ofEpochDay(m.asInstanceOf[Int].toLong).atStartOfDay()
      case other => throw new IllegalArgumentException(s"unsupported input type $other")
    }
    field match {
      case "year" => ldt.getYear
      case "yearofweek" => ldt.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR)
      case "quarter" => ldt.get(java.time.temporal.IsoFields.QUARTER_OF_YEAR)
      case "month" => ldt.getMonthValue
      case "week" => ldt.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR)
      case "dayofyear" => ldt.getDayOfYear
      case "day" => ldt.getDayOfMonth
      case "dayofweek" => ldt.getDayOfWeek.getValue // ISO: Monday = 1
      case "hour" => ldt.getHour
      case "minute" => ldt.getMinute
      case "second" => ldt.getSecond
      case "millisecond" => ldt.getNano / 1000000
      case other => throw new IllegalArgumentException(s"unknown epoch field $other")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EpochField =
    copy(millis = newLeft, zone = newRight)
}

/** Pinot `timezoneHour(tzId[, millis])` / `timezoneMinute(tzId[, millis])`:
  * the zone's UTC offset at `millis` (epoch 0 by default), hours part /
  * minutes-remainder part — Pinot's TimeUnit.toHours/toMinutes%60 over
  * DateTimeZone.getOffset, replicated with java.util.TimeZone. */
case class TimezoneOffsetPart(minutePart: Boolean, tz: Expression, millis: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def left: Expression = tz
  override def right: Expression = millis

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = if (minutePart) "timezoneminute" else "timezonehour"
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  override protected def nullSafeEval(z: Any, m: Any): Any = {
    val off = java.util.TimeZone.getTimeZone(z.asInstanceOf[UTF8String].toString)
      .getOffset(m.asInstanceOf[Long]).toLong
    if (minutePart) (java.util.concurrent.TimeUnit.MILLISECONDS.toMinutes(off) % 60).toInt
    else java.util.concurrent.TimeUnit.MILLISECONDS.toHours(off).toInt
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TimezoneOffsetPart =
    copy(tz = newLeft, millis = newRight)
}
