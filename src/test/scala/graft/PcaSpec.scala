package graft

import graft.ops.Pca
import org.apache.spark.sql.functions._

/** Distributed exact-integer PCA: the Gram matrix matches a local loop
  * exactly, the power iteration recovers a planted dominant axis, and the
  * whole trajectory is invariant under row order and partitioning (the
  * PageRank bit-determinism doctrine applied to spectra). */
class PcaSpec extends GraftSuite {

  import spark.implicits._

  private val QS = 10000
  private val XS = 1000000L

  private def quantLocal(v: Seq[Float]): Seq[Long] =
    v.map(x => math.floor(x.toDouble * QS + 0.5).toLong)

  test("gram matrix equals the local exact-integer accumulation") {
    val rnd = new scala.util.Random(0xAC20)
    val rows = (0L until 50L).map(id =>
      (id, Seq.fill(6)((rnd.nextDouble() * 2 - 1).toFloat)))
    val df = rows.toDF("id", "v")
    val got = Pca.gram(df, "v", 6, QS).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> BigInt(r.getDecimal(2).toBigInteger))
      .toMap
    val qs = rows.map { case (_, v) => quantLocal(v) }
    for (i <- 0 until 6; j <- i until 6) {
      val want = qs.foldLeft(BigInt(0))((acc, q) => acc + BigInt(q(i)) * BigInt(q(j)))
      assert(got((i, j)) === want, s"G($i,$j)")
    }
  }

  test("recovers a planted dominant axis with canonical positive sign") {
    // variance concentrated on axis 3 (values ±0.5), noise-free elsewhere:
    // the dominant eigendirection is ±e3, canonicalized to +e3
    val rows = (0L until 40L).map { id =>
      val v = Array.fill(8)(0.0f)
      v(3) = if (id % 2 == 0) 0.5f else -0.5f
      v(1) = 0.01f // tiny constant component so firstNz logic is exercised
      (id, v.toSeq)
    }
    val x = Pca.dominantDirection(rows.toDF("id", "v"), "v", 8, QS, 8, XS)
    assert(x(3).abs === BigInt(XS), "dominant component saturates the scale")
    // sign canonicalization: first nonzero component positive
    val firstNz = x.indexWhere(_.signum != 0)
    assert(x(firstNz).signum === 1)
    // all other axes negligible relative to the dominant one
    for (i <- 0 until 8 if i != 3)
      assert(x(i).abs < BigInt(XS) / 10, s"axis $i = ${x(i)}")
  }

  test("trajectory is bit-identical under row order and partitioning") {
    val rnd = new scala.util.Random(0xAC21)
    val rows = (0L until 120L).map(id =>
      (id, Seq.fill(10)((rnd.nextGaussian() * 0.3).toFloat)))
    val base = Pca.dominantDirection(rows.toDF("id", "v"), "v", 10, QS, 8, XS)
    val mangled = scala.util.Random.shuffle(rows).toDF("id", "v").repartition(13)
    val got = Pca.dominantDirection(mangled, "v", 10, QS, 8, XS)
    assert(got.toSeq === base.toSeq)
    // projections are exact integers — identical under partitioning too
    val pBase = Pca.project(rows.toDF("id", "v"), "id", "v", QS, base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pGot = Pca.project(mangled, "id", "v", QS, base)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pGot === pBase)
    // and each projection equals the local exact fold
    rows.foreach { case (id, v) =>
      val q = quantLocal(v)
      val want = q.indices.foldLeft(BigInt(0))((acc, i) =>
        acc + BigInt(q(i)) * base(i))
      assert(BigInt(pBase(id)) === want, s"proj($id)")
    }
  }

  test("deflation recovers a planted SECOND axis, orthogonal to the first") {
    // axis 2 carries the most variance (±0.6), axis 5 the second-most
    // (±0.3), everything else zero — x1 → ±e2, x2 → ±e5 (canonical +)
    val rows = (0L until 60L).map { id =>
      val v = Array.fill(8)(0.0f)
      v(2) = if (id % 2 == 0) 0.6f else -0.6f
      v(5) = if ((id / 2) % 2 == 0) 0.3f else -0.3f
      (id, v.toSeq)
    }
    val g = Pca.collectGram(rows.toDF("id", "v"), "v", 8, QS)
    val x1 = Pca.powerIterate(g, 8, XS)
    assert(x1(2).abs === BigInt(XS))
    val x2 = Pca.powerIterate(Pca.deflated(g, x1, 100L), 8, XS)
    assert(x2(5).abs === BigInt(XS), s"second axis: ${x2.toSeq}")
    for (i <- 0 until 8 if i != 5)
      assert(x2(i).abs < BigInt(XS) / 10, s"axis $i = ${x2(i)}")
    // exact-integer orthogonality diagnostic
    val dot = x1.zip(x2).map { case (a, b) => a * b }.sum
    assert(dot.abs < BigInt(XS) * BigInt(XS) / 100, s"dot12 = $dot")
    // deflation is even in the first direction's sign
    val x2n = Pca.powerIterate(Pca.deflated(g, x1.map(-_), 100L), 8, XS)
    assert(x2n.toSeq === x2.toSeq)
  }

  test("deflation of rank-one data annihilates the iterate loudly") {
    // all rows on one axis: G2 has nothing left to find
    val rows = (0L until 20L).map { id =>
      val v = Array.fill(4)(0.0f)
      v(1) = if (id % 2 == 0) 0.5f else -0.5f
      (id, v.toSeq)
    }
    val g = Pca.collectGram(rows.toDF("id", "v"), "v", 4, QS)
    val x1 = Pca.powerIterate(g, 8, XS)
    intercept[IllegalArgumentException] {
      Pca.powerIterate(Pca.deflated(g, x1, 100L), 8, XS)
    }
  }

  test("degenerate inputs fail loudly; wrong-dim rows are excluded") {
    val zeros = (0L until 5L).map(id => (id, Seq.fill(4)(0.0f))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Pca.dominantDirection(zeros, "v", 4, QS, 4, XS)
    }
    val mixed = Seq(
      (1L, Seq(0.5f, 0.0f)),
      (2L, Seq(0.5f, 0.0f, 0.9f))).toDF("id", "v") // second row wrong dim
    val x = Pca.dominantDirection(mixed, "v", 2, QS, 4, XS)
    assert(x(0) === BigInt(XS), "only the dim-2 row contributes")
    assert(Pca.project(mixed, "id", "v", QS, x).count() === 1L)
  }
}
