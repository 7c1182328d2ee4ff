package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Codegen vs interpreted parity for the round-5 `defineCodeGen` kernels:
  * a bug in the generated-code string (wrong cast, operand order, missing
  * null guard) only manifests under whole-stage codegen, so every kernel
  * is evaluated both ways over the same inputs and must agree exactly. */
class CodegenParitySpec extends GraftSuite {

  import spark.implicits._

  private lazy val inputs = Seq(
    "", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "key agg row scan",
    "x" * 300, "10.20.30.40", "255.255.255.255"
  ).toDF("s")

  private def bothWays(build: org.apache.spark.sql.DataFrame => Array[org.apache.spark.sql.Row]): Unit =
    bothWaysOn(inputs)(build)

  private def bothWaysOn(df: org.apache.spark.sql.DataFrame)(
      build: org.apache.spark.sql.DataFrame => Array[org.apache.spark.sql.Row]) = {
    val conf = spark.conf
    val r1 = build(df)
    val (ws0, fm0) = (conf.get("spark.sql.codegen.wholeStage"),
      conf.get("spark.sql.codegen.factoryMode"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val r2 = build(df)
      assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws0)
      conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }

  test("hash kernels agree between codegen and interpreted eval") {
    bothWays(df => df.select(
      adler32($"s"), crc32c($"s"), murmur2($"s"), murmur3_32($"s", 42)).collect())
  }

  test("epoch-field kernels agree between codegen and interpreted eval") {
    import org.apache.spark.sql.graft.GraftBridge
    import org.apache.spark.sql.Column
    def ef(f: String, m: Column, z: String): Column = GraftBridge.column(
      graft.expressions.EpochField(f, GraftBridge.expression(m),
        GraftBridge.expression(lit(z))))
    def tzp(minute: Boolean, tz: String, m: Column): Column = GraftBridge.column(
      graft.expressions.TimezoneOffsetPart(minute,
        GraftBridge.expression(lit(tz)), GraftBridge.expression(m)))
    val millis = Seq(0L, 1234L, 61000L, 1700000000123L, 4102444799999L).toDF("m")
    bothWaysOn(millis) { df =>
      df.select(
        ef("year", $"m", "UTC"), ef("dayofweek", $"m", "America/New_York"),
        ef("week", $"m", "UTC"), ef("millisecond", $"m", "Asia/Kathmandu"),
        ef("hour", $"m", "Asia/Kolkata"),
        // Spark-form inputs through the same kernels
        ef("month", to_timestamp(lit("2024-06-15 23:30:00")), "Asia/Kolkata"),
        ef("day", to_date(lit("2024-03-05")), "UTC"),
        // string + NULL acceptance (round-7 advice): implicit-cast parity
        ef("year", lit("2024-03-05"), "UTC"),
        ef("hour", lit("2024-03-05 07:08:09"), "UTC"),
        ef("year", lit(null), "UTC"),
        tzp(minute = false, "Asia/Kathmandu", $"m"),
        tzp(minute = true, "Asia/Kathmandu", $"m")).collect()
    }
  }

  test("is_subnet_of agrees between codegen and interpreted eval") {
    bothWays(df => df.filter($"s".rlike("^[0-9.]+$"))
      .select(is_subnet_of(lit("10.0.0.0/8"), $"s"),
        is_subnet_of(lit("255.255.0.0/16"), $"s")).collect())
  }
}
