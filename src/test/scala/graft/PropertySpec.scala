package graft

import graft.expressions.TextOps
import graft.functions._
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties (SURVEY.md §5.3) for the scalar
  * function families and the fingerprint/hash kernels. Generators are
  * sampled with a fixed seed so runs are deterministic. */
class PropertySpec extends GraftSuite {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("C1 string functions match JVM reference semantics on random strings") {
    val strGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)
    val cases = samples(strGen, 60).filter(_.nonEmpty)
    val df = cases.toDF("s").select(
      $"s",
      upper($"s").as("u"), lower($"s").as("l"), length($"s").as("len"),
      reverse($"s").as("rev"), substring($"s", 2, 3).as("sub"))
    df.collect().foreach { r =>
      val s = r.getString(0)
      assert(r.getString(1) === s.toUpperCase)
      assert(r.getString(2) === s.toLowerCase)
      assert(r.getInt(3) === s.length)
      assert(r.getString(4) === s.reverse)
      assert(r.getString(5) === s.drop(1).take(3))
    }
  }

  test("hash64 collision-free on distinct short strings; stable across calls") {
    val strGen = Gen.listOfN(8, Gen.alphaChar).map(_.mkString)
    val cases = samples(strGen, 300).distinct
    val hashes = cases.map(s => TextOps.hash64(UTF8String.fromString(s), 0L))
    assert(hashes.distinct.length === cases.length, "collision in 300 short strings")
    cases.zip(hashes).foreach { case (s, h) =>
      assert(TextOps.hash64(UTF8String.fromString(s), 0L) === h)
    }
  }

  test("simhash hamming distance bounded by token edits (property)") {
    val vocabGen = Gen.choose(0, 5000).map(i => s"w$i")
    (0 until 10).foreach { trial =>
      val doc = samples(vocabGen, 120).distinct
      val edits = 3
      val edited = doc.zipWithIndex.map { case (t, i) => if (i < edits) s"EDIT$i" else t }
      val h1 = simhashOf(doc)
      val h2 = simhashOf(edited)
      val ham = java.lang.Long.bitCount(h1 ^ h2)
      // few-token edits over ~100 tokens must stay well under half the bits
      assert(ham <= 24, s"trial $trial: hamming $ham after $edits edits on ${doc.size} tokens")
    }
  }

  private def simhashOf(tokens: Seq[String]): Long =
    TextOps.simhash64(org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      tokens.map(UTF8String.fromString).toArray))

  test("minhash signature match-rate tracks Jaccard across random set pairs") {
    val rnd = new scala.util.Random(3)
    (0 until 5).foreach { _ =>
      val universe = (0 until 400).map(i => s"u$i")
      val a = universe.filter(_ => rnd.nextDouble() < 0.5)
      val b = universe.filter(_ => rnd.nextDouble() < 0.5)
      val trueJ = a.intersect(b).size.toDouble / a.union(b).distinct.size.toDouble
      val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
        .select($"id", minhashSignature($"toks", 128).as("sig"))
      val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 128
      assert(math.abs(est - trueJ) < 0.18, s"estimate $est vs true $trueJ")
    }
  }

  test("sorted_intersect_count equals set intersection on random long sets") {
    val rnd = new scala.util.Random(9)
    (0 until 10).foreach { _ =>
      val a = Seq.fill(rnd.nextInt(200) + 1)(rnd.nextInt(300).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(200) + 1)(rnd.nextInt(300).toLong).distinct.sorted
      val got = Seq((a, b)).toDF("a", "b")
        .select(sorted_intersect_count($"a", $"b")).collect().head.getInt(0)
      assert(got === a.toSet.intersect(b.toSet).size)
    }
  }
}
