package graft

import graft.ops.FuzzyJoin
import org.apache.spark.sql.functions._

/** PassJoin-style fuzzy self-join: candidate completeness (the pigeonhole
  * segment theorem) means the confirmed output must EQUAL brute force —
  * asserted on planted pairs and seeded random corpora, across thresholds
  * and degenerate lengths. */
class FuzzyJoinSpec extends GraftSuite {

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  private def brute(names: Seq[String], d: Int): Set[(String, String, Long)] = {
    val u = names.distinct
    (for {
      a <- u; b <- u if a < b
      dist = lev(a, b) if dist <= d
    } yield (a, b, dist.toLong)).toSet
  }

  private def viaJoin(names: Seq[String], d: Int): Set[(String, String, Long)] = {
    import spark.implicits._
    FuzzyJoin.selfJoin(names.toDF("s"), "s", d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("planted pairs at d=2: typos, transpositions-as-2-edits, misses") {
    val names = Seq("kitten", "sitten", "sittin", "sitting", "mitten",
      "flaw", "lawn", "table", "cable", "maple")
    assert(viaJoin(names, 2) === brute(names, 2))
    // spot truths: kitten~sitten=1, kitten~sittin=2, kitten~sitting=3 (out)
    val got = viaJoin(names, 2)
    assert(got.contains(("kitten", "sitten", 1L)))
    assert(got.contains(("kitten", "sittin", 2L)))
    assert(!got.exists(p => p._1 == "kitten" && p._2 == "sitting"))
  }

  test("seeded random corpora equal brute force across d = 1, 2, 3") {
    val r = new scala.util.Random(42)
    val names = (0 until 80).map(_ =>
      (0 until (3 + r.nextInt(8))).map(_ => ('a' + r.nextInt(3)).toChar).mkString)
    for (d <- 1 to 3)
      assert(viaJoin(names, d) === brute(names, d), s"d=$d")
  }

  test("degenerate lengths: strings shorter than d+1 segments, empty-adjacent") {
    val names = Seq("a", "b", "ab", "ba", "abc", "x", "xyz", "ax")
    for (d <- 1 to 3)
      assert(viaJoin(names, d) === brute(names, d), s"d=$d")
  }

  test("two-table join equals brute force (record-linkage shape), dist 0 admitted") {
    import spark.implicits._
    val ref = Seq("kitten", "table", "flaw", "maple")
    val noisy = Seq("kitten", "sitten", "cable", "fla", "stone")
    val got = graft.ops.FuzzyJoin
      .join(noisy.toDF("s"), "s", ref.toDF("t"), "t", d = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val want = (for {
      a <- noisy.distinct; b <- ref.distinct
      dist = lev(a, b) if dist <= 2
    } yield (a, b, dist.toLong)).toSet
    assert(got === want)
    assert(got.contains(("kitten", "kitten", 0L)))
  }

  test("fixture part names at d=3 match DuckDB-shape brute force") {
    val names = graft.sources.Tables.t(spark, sfDir, "part")
      .select("p_name").distinct().collect().map(_.getString(0)).toSeq
    val got = viaJoin(names, 3)
    assert(got === brute(names, 3))
    assert(got.nonEmpty, "fixture should contain close name pairs")
  }
}
