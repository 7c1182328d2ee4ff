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

  private def bothWays(build: org.apache.spark.sql.DataFrame => Array[org.apache.spark.sql.Row]) = {
    val conf = spark.conf
    val r1 = build(inputs)
    val (ws0, fm0) = (conf.get("spark.sql.codegen.wholeStage"),
      conf.get("spark.sql.codegen.factoryMode"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val r2 = build(inputs)
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

  test("is_subnet_of agrees between codegen and interpreted eval") {
    bothWays(df => df.filter($"s".rlike("^[0-9.]+$"))
      .select(is_subnet_of(lit("10.0.0.0/8"), $"s"),
        is_subnet_of(lit("255.255.0.0/16"), $"s")).collect())
  }
}
