package graft

import graft.sources.Tables
import org.apache.spark.sql.Row

/** Pinot 1.2 string-generator family: PREFIXES / SUFFIXES / UNIQUENGRAMS /
  * SPLITPART / ISJSON — SQL-vocabulary semantics plus the edge cases the
  * builders guard explicitly (empty input must return empty arrays, never a
  * descending `sequence(1,0)` artifact; SPLITPART drops empty tokens and
  * answers "null" out of bounds; ISJSON accepts scalar JSON literals). */
class StringGeneratorsSpec extends GraftSuite {

  private lazy val pinot: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    Tables.registerViews(s, sfDir)
    s
  }

  private def one(sql: String): Row = pinot.sql(sql).collect().head

  test("PREFIXES/SUFFIXES enumerate shortest-first and clamp to the input length") {
    val r = one(
      """SELECT PREFIXES('spark', 3) AS p, SUFFIXES('spark', 3) AS s,
        |       PREFIXES('ab', 9) AS clamped""".stripMargin)
    assert(r.getSeq[String](0) === Seq("s", "sp", "spa"))
    assert(r.getSeq[String](1) === Seq("k", "rk", "ark"))
    assert(r.getSeq[String](2) === Seq("a", "ab"))
  }

  test("PREFIXES/SUFFIXES/UNIQUENGRAMS on empty input return empty arrays") {
    val r = one(
      """SELECT PREFIXES('', 4) AS p, SUFFIXES('', 4) AS s,
        |       UNIQUENGRAMS('', 2) AS n, UNIQUENGRAMS('a', 2) AS short""".stripMargin)
    assert(r.getSeq[String](0).isEmpty)
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2).isEmpty)
    assert(r.getSeq[String](3).isEmpty) // gram longer than the input
  }

  test("UNIQUENGRAMS dedups in first-occurrence order; 3-arg spans gram sizes") {
    val r = one(
      """SELECT UNIQUENGRAMS('ababa', 2) AS n2,
        |       UNIQUENGRAMS('abc', 1, 3) AS n13""".stripMargin)
    assert(r.getSeq[String](0) === Seq("ab", "ba"))
    assert(r.getSeq[String](1) === Seq("a", "b", "c", "ab", "bc", "abc"))
  }

  test("UNIQUENGRAMS with minGram > maxGram returns empty, not descending grams") {
    // sequence(lo, hi) is DESCENDING when lo > hi — an inverted range must be []
    val r = one("SELECT UNIQUENGRAMS('abcdef', 3, 2) AS inv")
    assert(r.getSeq[String](0).isEmpty)
  }

  test("SPLITPART is 0-based, drops empty tokens, and answers 'null' out of bounds") {
    val r = one(
      """SELECT SPLITPART('a  b c', ' ', 1) AS empties_dropped,
        |       SPLITPART('a,b,c', ',', 0) AS first,
        |       SPLITPART('a,b,c', ',', 9) AS oob""".stripMargin)
    assert(r.getString(0) === "b") // "a  b c" → [a, b, c], not [a, "", b, c]
    assert(r.getString(1) === "a")
    assert(r.getString(2) === "null")
    // negative index answers "null" too (must not hit ANSI element_at(.., 0))
    val neg = one("SELECT SPLITPART('a,b', ',', -1) AS v")
    assert(neg.getString(0) === "null")
  }

  test("ISJSON accepts objects, arrays, and scalar literals; rejects truncation") {
    val r = one(
      """SELECT ISJSON('{"a": 1}') AS obj, ISJSON('[1,2]') AS arr,
        |       ISJSON('3') AS scalar, ISJSON('null') AS jnull,
        |       ISJSON('{"a": 1') AS truncated, ISJSON('not json') AS text""".stripMargin)
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
    assert(!r.getBoolean(4) && !r.getBoolean(5))
  }

  test("Column API agrees with the SQL registry (shared builders)") {
    import graft.functions._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("key agg row", "x").toDF("t")
    val got = df.select(
      str_prefixes(col("t"), 3).as("p"),
      unique_ngrams(col("t"), 2).as("n"),
      split_part_pinot(col("t"), " ", 2).as("sp")).collect()
    assert(got(0).getSeq[String](0) === Seq("k", "ke", "key"))
    assert(got(0).getSeq[String](1).distinct.length === got(0).getSeq[String](1).length)
    assert(got(0).getString(2) === "row")
    assert(got(1).getString(2) === "null")
  }
}
