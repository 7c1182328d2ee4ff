package graft

import graft.functions._
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the Pinot 1.2 string-generator family: the Catalyst
  * compositions (`expressions/StringGenerators`) must agree with
  * straightforward plain-Scala reference implementations on seeded random
  * strings, including whitespace runs, empty strings, and inputs shorter
  * than the generator parameters. */
class StringGenPropertySpec extends GraftSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // alphanumeric + spaces, sometimes leading/trailing/doubled
  private lazy val cases: Seq[String] = {
    val word = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val g = Gen.listOf(Gen.frequency(4 -> word, 1 -> Gen.const(""))).map(_.mkString(" "))
    (samples(g, 80) ++ Seq("", " ", "  ", "a", "ab c", " x  y ")).distinct
  }

  private def refPrefixes(s: String, n: Int): Seq[String] =
    (1 to math.min(s.length, n)).map(s.take)
  private def refSuffixes(s: String, n: Int): Seq[String] =
    (1 to math.min(s.length, n)).map(s.takeRight)
  private def refNgrams(s: String, n: Int): Seq[String] =
    if (s.length < n) Seq.empty else s.sliding(n).toSeq.distinct
  private def refNgrams(s: String, lo: Int, hi: Int): Seq[String] =
    (lo to hi).filter(_ <= s.length).flatMap(g => s.sliding(g).toSeq).distinct
  private def refSplitPart(s: String, sep: String, i: Int): String = {
    // commons splitByWholeSeparator semantics: empty tokens dropped
    val toks = s.split(java.util.regex.Pattern.quote(sep), -1).filter(_.nonEmpty)
    if (i < toks.length) toks(i) else "null"
  }

  test("prefixes/suffixes/uniqueNgrams/splitPart match the Scala references") {
    val df = cases.toDF("s").select(
      $"s",
      str_prefixes($"s", 4).as("p"),
      str_suffixes($"s", 3).as("x"),
      unique_ngrams($"s", 2).as("n2"),
      unique_ngrams($"s", 2, 4).as("n24"),
      split_part_pinot($"s", " ", 1).as("sp"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getSeq[String](1) === refPrefixes(s, 4), s"prefixes('$s')")
      assert(r.getSeq[String](2) === refSuffixes(s, 3), s"suffixes('$s')")
      assert(r.getSeq[String](3) === refNgrams(s, 2), s"ngrams('$s', 2)")
      assert(r.getSeq[String](4) === refNgrams(s, 2, 4), s"ngrams('$s', 2, 4)")
      assert(r.getString(5) === refSplitPart(s, " ", 1), s"splitPart('$s')")
    }
  }

  test("generators agree between codegen and interpreted eval") {
    val build = () => cases.toDF("s").select(
      str_prefixes($"s", 4), unique_ngrams($"s", 2, 3), split_part_pinot($"s", " ", 2))
      .collect().map(_.toString).toSeq
    val r1 = build()
    val conf = spark.conf
    val (ws0, fm0) = (conf.get("spark.sql.codegen.wholeStage"),
      conf.get("spark.sql.codegen.factoryMode"))
    try {
      conf.set("spark.sql.codegen.wholeStage", "false")
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(build() === r1)
    } finally {
      conf.set("spark.sql.codegen.wholeStage", ws0)
      conf.set("spark.sql.codegen.factoryMode", fm0)
    }
  }
}
