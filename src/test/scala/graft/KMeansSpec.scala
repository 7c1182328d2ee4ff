package graft

import graft.ops.KMeans
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means: bit-parity with a local reference loop on
  * exactly-representable fixtures, planted-cluster recovery, empty-cell
  * carry, and partition invariance. */
class KMeansSpec extends GraftSuite {

  import spark.implicits._

  /** Local reference: the identical recurrence with plain loops — kernel
    * distance (sequential double fold + sqrt), argmin ties to the lowest
    * cell, update = round-half-up-6 of the mean narrowed to float32, empty
    * cells keep their centroid. On fixtures whose values are exactly
    * representable (small multiples of 0.25) the cross-row sums are exact
    * in float64, so reference and engine agree BIT FOR BIT regardless of
    * partial-aggregation order. */
  private def reference(
      pts: Seq[Array[Float]],
      init: Seq[(Int, Array[Float])],
      iters: Int): Seq[(Int, Array[Float])] = {
    def dist(a: Array[Float], c: Array[Float]): Double = {
      var acc = 0.0
      var i = 0
      while (i < a.length) {
        val d = math.abs(a(i).toDouble - c(i).toDouble)
        acc += d * d
        i += 1
      }
      math.sqrt(acc)
    }
    var cents = init.sortBy(_._1)
    (0 until iters).foreach { _ =>
      val assigned = pts.map(p => p -> cents.minBy { case (cell, c) => (dist(p, c), cell) }._1)
      cents = cents.map { case (cell, old) =>
        val members = assigned.filter(_._2 == cell).map(_._1)
        if (members.isEmpty) cell -> old
        else cell -> Array.tabulate(old.length) { i =>
          val mean = members.map(_(i).toDouble).sum / members.size
          java.math.BigDecimal.valueOf(mean)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue().toFloat
        }
      }
    }
    cents
  }

  private val rnd = new scala.util.Random(42)
  /** Two planted clusters on the 0.25 grid around (0,…) and (10,…). */
  private def planted(n: Int, dim: Int): Seq[Array[Float]] =
    Seq.tabulate(n) { i =>
      val base = if (i % 2 == 0) 0f else 10f
      Array.fill(dim)(base + rnd.nextInt(8) * 0.25f)
    }

  test("bit-parity with the reference loop on an exact-grid fixture") {
    val pts = planted(60, 4)
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toSeq) }
      .toDF("id", "emb").select(col("id"), col("emb").cast("array<float>").as("emb"))
    val init = Seq(0 -> pts(0).clone(), 1 -> pts(1).clone())
    val got = KMeans.train(df, "emb", init, iters = 4)
    val want = reference(pts, init, iters = 4)
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case ((_, g), (_, w)) => assert(g.toSeq === w.toSeq) }
  }

  test("recovers the planted clustering and assign() labels every point") {
    val pts = planted(80, 4)
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toSeq) }
      .toDF("id", "emb").select(col("id"), col("emb").cast("array<float>").as("emb"))
    val init = Seq(0 -> pts(0).clone(), 1 -> pts(1).clone())
    val cents = KMeans.train(df, "emb", init, iters = 3)
    val assigned = KMeans.assign(df, "emb", cents)
      .select(col("id"), col("cell"), col("dist")).collect()
    assert(assigned.length === 80)
    // planted membership: even ids near 0, odd ids near 10 — init 0 is an
    // even point, init 1 odd, so cell 0 = evens, cell 1 = odds
    assigned.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === (id % 2).toInt, s"id $id")
      assert(r.getDouble(2) < 2.0, s"intra-cluster distance for id $id")
    }
  }

  test("an empty cell keeps its previous centroid") {
    val pts = planted(40, 4)
    val df = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toSeq) }
      .toDF("id", "emb").select(col("id"), col("emb").cast("array<float>").as("emb"))
    val far = Array.fill(4)(1000f)
    val init = Seq(0 -> pts(0).clone(), 1 -> pts(1).clone(), 7 -> far.clone())
    val cents = KMeans.train(df, "emb", init, iters = 3)
    assert(cents.find(_._1 == 7).get._2.toSeq === far.toSeq,
      "no member ever reaches the far centroid, so it must not move")
    val want = reference(pts, init, 3)
    assert(cents.map(_._1) === want.map(_._1))
    cents.zip(want).foreach { case ((_, g), (_, w)) => assert(g.toSeq === w.toSeq) }
  }

  test("invariant under partitioning") {
    val pts = planted(64, 4)
    val mk = (parts: Int) => pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toSeq) }
      .toDF("id", "emb").select(col("id"), col("emb").cast("array<float>").as("emb"))
      .repartition(parts)
    val init = Seq(0 -> pts(0).clone(), 1 -> pts(1).clone())
    val a = KMeans.train(mk(1), "emb", init, 3)
    val b = KMeans.train(mk(11), "emb", init, 3)
    a.zip(b).foreach { case ((ca, va), (cb, vb)) =>
      assert(ca === cb); assert(va.toSeq === vb.toSeq)
    }
  }
}
