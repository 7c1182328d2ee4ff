package graft

import graft.ops.LogReg
import org.apache.spark.sql.functions._

/** Distributed logistic regression: separable planted data converges,
  * training is bit-reproducible under repartition/shuffle (the decimal
  * gradient-accumulation claim), loss decreases monotonically at a sane
  * learning rate, and scoring separates the classes. */
class LogRegSpec extends GraftSuite {

  import spark.implicits._

  // planted: class 1 docs contain marker tokens, class 0 docs don't
  private def planted(n: Int): Seq[(String, Int)] =
    (0 until n).map { i =>
      val r = new scala.util.Random(i)
      val base = (0 until 12).map(_ => s"w${r.nextInt(30)}")
      if (i % 2 == 0) ((base :+ "goodtoken" :+ "qualitymark").mkString(" "), 1)
      else (base.mkString(" "), 0)
    }

  private def featDf(rows: Seq[(String, Int)], dim: Int) =
    rows.toDF("text", "label")
      .withColumn("features", LogReg.hashedFeatures(col("text"), dim))

  test("separable planted data: loss decreases and final accuracy >= 0.95") {
    val df = featDf(planted(400), dim = 256)
    val m = LogReg.train(df, dim = 256, iters = 40, lr = 0.5)
    assert(m.losses.size === 40)
    assert(m.losses.last < m.losses.head * 0.5,
      s"loss should halve: ${m.losses.head} -> ${m.losses.last}")
    m.losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"loss must not increase: $a -> $b") }
    val scored = LogReg.score(df, "features", m)
      .select(col("label"), (col("score") > 0.5).cast("int").as("pred"))
    val acc = scored.filter(col("label") === col("pred")).count().toDouble /
      scored.count()
    assert(acc >= 0.95, s"accuracy $acc")
  }

  test("training is bit-reproducible under repartition and row shuffling") {
    val rows = planted(300)
    val a = LogReg.train(featDf(rows, 64), 64, iters = 10, lr = 0.3)
    val b = LogReg.train(
      featDf(scala.util.Random.shuffle(rows), 64).repartition(13),
      64, iters = 10, lr = 0.3)
    assert(a.weights.toSeq === b.weights.toSeq,
      "decimal gradient accumulation must make weights order-independent")
    assert(a.bias === b.bias)
    assert(a.losses === b.losses)
  }

  test("trainAuto local loop equals the distributed path bit for bit; budget overflow falls back") {
    val rows = planted(240)
    val df = featDf(rows, 64)
    val dist = LogReg.train(df, 64, iters = 8, lr = 0.3)
    val local = LogReg.trainAuto(df, 64, iters = 8, lr = 0.3)
    assert(local.weights.toSeq === dist.weights.toSeq)
    assert(local.bias === dist.bias && local.losses === dist.losses)
    // budget 0 forces the distributed path — same answer again
    val forced = LogReg.trainAuto(df, 64, iters = 8, lr = 0.3, budgetRows = 0L)
    assert(forced.weights.toSeq === dist.weights.toSeq)
  }

  test("hashedFeatures: power-of-two guard and in-range sparse ids") {
    intercept[IllegalArgumentException] {
      featDf(planted(4), dim = 100)
    }
    val ids = featDf(planted(20), 64).select(explode(col("features")))
      .collect().map(_.getInt(0))
    assert(ids.forall(i => i >= 0 && i < 64))
    assert(ids.nonEmpty)
  }

  test("Acc128 accumulation is bit-identical to a BigDecimal fold (seeded, carry-heavy)") {
    // magnitudes up to the quantized-err ceiling (1e18) plus adversarial
    // near-limb-boundary values, so low-limb carries fire in both signs
    val r = new scala.util.Random(0xACC128)
    val special = Seq(0L, 1L, -1L, Long.MaxValue / 2, -(Long.MaxValue / 2),
      (1e18).toLong, -(1e18).toLong)
    val vals = special ++ (0 until 20000).map { _ =>
      val m = r.nextLong() % (1e18.toLong + 1)
      m
    }
    val acc = new LogReg.Acc128(3)
    var ref0 = BigDecimal(0).setScale(18)
    var ref2 = BigDecimal(0).setScale(18)
    vals.foreach { v =>
      acc.add(0, v)
      ref0 += BigDecimal(new java.math.BigDecimal(java.math.BigInteger.valueOf(v), 18))
      if (v % 3 == 0) {
        acc.add(2, -v)
        ref2 += BigDecimal(new java.math.BigDecimal(java.math.BigInteger.valueOf(-v), 18))
      }
    }
    assert(acc.toBigDecimal(0) === ref0)
    assert(acc.toBigDecimal(1) === BigDecimal(0).setScale(18))
    assert(acc.toBigDecimal(2) === ref2)
    // the trained model is unchanged by the accumulator swap: exactness of
    // integer sums is representation-free, so the planted trajectory from
    // the (still-BigDecimal-reducing) distributed path equals the local one
    val df = featDf(planted(120), dim = 128)
    val a = LogReg.train(df, dim = 128, iters = 6, lr = 0.5)
    val b = LogReg.trainAuto(df, dim = 128, iters = 6, lr = 0.5)
    assert(a.weights.toSeq === b.weights.toSeq)
    assert(a.bias === b.bias)
    assert(a.losses === b.losses)
  }
}
