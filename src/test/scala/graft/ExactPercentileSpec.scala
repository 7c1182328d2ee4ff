package graft

import graft.ops.ExactPercentile
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Distributed exact percentile vs Spark's `Percentile` aggregate: the two
  * must agree BIT-FOR-BIT — same position arithmetic (q·(n−1)), same
  * interpolation association ((hi−pos)·vLo + (pos−lo)·vHi), same exact-index
  * short-circuit — on every data shape the value-map buffer handles:
  * duplicates, negatives, single-element groups, boundary quantiles 0/1,
  * nulls ignored, skew (all buckets degenerate). */
class ExactPercentileSpec extends GraftSuite {

  private def bitEqual(qs: Seq[Double], rows: Seq[(String, java.lang.Double)],
                       buckets: Int = 8): Unit = {
    import spark.implicits._
    val df = rows.toDF("g", "v")
    val got = ExactPercentile.groupPercentiles(df, Seq("g"), "v", qs, buckets)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = df.filter(col("v").isNotNull)
      .groupBy("g")
      .agg(percentile(col("v"), typedlit(qs)).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got.keySet === want.keySet)
    for ((k, w) <- want) {
      val a = got(k)
      assert(a.length === w.length, s"group $k arity")
      for (i <- a.indices)
        assert(java.lang.Double.doubleToLongBits(a(i)) ===
               java.lang.Double.doubleToLongBits(w(i)),
          s"group $k quantile ${qs(i)}: got ${a(i)}, Percentile says ${w(i)}")
    }
  }

  test("matches Percentile bit-for-bit on seeded random multi-group data") {
    val rnd = new scala.util.Random(0xE60106)
    val rows = (1 to 4000).map { _ =>
      val g = s"g${rnd.nextInt(5)}"
      // mixture: continuous + heavy duplicate mass + negatives
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1000 - 500
        case 1 => rnd.nextInt(10).toDouble
        case _ => rnd.nextGaussian() * 50
      }
      (g, java.lang.Double.valueOf(v))
    }
    bitEqual(Seq(0.0, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0), rows)
  }

  test("single-element groups, duplicates-only groups, and nulls ignored") {
    val rows = Seq[(String, java.lang.Double)](
      ("one", 42.0),
      ("dup", 7.0), ("dup", 7.0), ("dup", 7.0),
      ("mix", 1.0), ("mix", null), ("mix", 3.0), ("mix", null), ("mix", 2.0))
    bitEqual(Seq(0.0, 0.5, 0.9, 1.0), rows)
  }

  test("all-null group produces no row (Percentile semantics via groupBy parity)") {
    import spark.implicits._
    val df = Seq[(String, java.lang.Double)](("a", 1.0), ("z", null))
      .toDF("g", "v")
    val got = ExactPercentile.groupPercentiles(df, Seq("g"), "v", Seq(0.5))
      .collect().map(_.getString(0)).toSet
    assert(got === Set("a"))
  }

  test("degenerate boundaries (constant column) still rank correctly") {
    val rows = (1 to 100).map(i => (s"g${i % 2}", java.lang.Double.valueOf(5.0)))
    bitEqual(Seq(0.25, 0.5, 0.75), rows, buckets = 16)
  }

  test("interpolation boundaries: .5 positions on 2-decimal price-like values") {
    // even n → pos = q·(n−1) lands on .5 fractions, the association-sensitive
    // case that distinguishes vLo+(vHi−vLo)·f from Percentile's form
    val rnd = new scala.util.Random(7)
    val rows = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(3)}",
        java.lang.Double.valueOf(math.round(rnd.nextDouble() * 10000) / 100.0))
    }
    bitEqual(Seq(0.25, 0.5, 0.75, 0.9), rows)
  }

  test("agrees with percentile() on the declared-query shape (lineitem sf0.001)") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val qs = Seq(0.25, 0.5, 0.75)
    val got = ExactPercentile.groupPercentiles(
        li, Seq("l_returnflag"), "l_quantity", qs)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val want = li.groupBy("l_returnflag")
      .agg(percentile(col("l_quantity"), typedlit(qs)).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got === want)
    val gotP = ExactPercentile.groupPercentiles(
        li, Seq("l_returnflag"), "l_extendedprice", Seq(0.9))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val wantP = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), lit(0.9)).as("p"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((k, w) <- wantP)
      assert(java.lang.Double.doubleToLongBits(gotP(k)) ===
             java.lang.Double.doubleToLongBits(w), s"l_extendedprice p90 $k")
  }

  // ---- valueAtRank: the distributed order statistic (q_graph_kcore's k) ----

  private def localRank(vals: Seq[Long], rank: Long): Long =
    vals.sorted.apply(rank.toInt)

  test("valueAtRank matches the local sorted multiset at every boundary rank") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xAC10)
    // heavy ties (degree-sequence shape: small value domain, many repeats)
    val vals = Seq.fill(5000)(rnd.nextInt(60).toLong + 1)
    val df = vals.toDF("d")
    for (rank <- Seq(0L, 1L, 999L, 2499L, 2500L, 4998L, 4999L))
      assert(ExactPercentile.valueAtRank(df, "d", rank) ===
        localRank(vals, rank), s"rank $rank")
  }

  test("valueAtRank is tie-proof: invariant under row order and partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(0xAC11)
    val vals = Seq.fill(3000)(rnd.nextInt(20).toLong)
    val rank = (2L * (vals.length - 1)) / 10L // the q_graph_kcore rank form
    val a = ExactPercentile.valueAtRank(vals.toDF("d"), "d", rank)
    val b = ExactPercentile.valueAtRank(
      scala.util.Random.shuffle(vals).toDF("d").repartition(13), "d", rank)
    assert(a === b)
    assert(a === localRank(vals, rank))
  }

  test("valueAtRank rejects out-of-range ranks loudly") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("d")
    intercept[IllegalArgumentException] {
      ExactPercentile.valueAtRank(df, "d", 3L)
    }
    intercept[IllegalArgumentException] {
      ExactPercentile.valueAtRank(df, "d", -1L)
    }
  }

  test("valueAtRank plans NO TakeOrdered/offset-limit over the value frame") {
    // the q_graph_kcore round-9 weakness: orderBy.offset(rank).limit(1)
    // plans a CollectLimit whose merged buffer grows linearly with rank
    // (data-proportional driver memory). The bucketed rank plan must
    // contain no TakeOrdered and no offset — its only collect is the
    // ≤1-row picked frame.
    import spark.implicits._
    val df = (1 to 4000).map(i => (i % 97).toLong).toDF("d")
    val (picked, cnt) = ExactPercentile.rankPlan(df, "d", 800L, 32)
    try {
      val plan = picked.queryExecution.executedPlan.toString
      assert(!plan.contains("TakeOrdered"), s"TakeOrdered in plan:\n$plan")
      assert(!plan.toLowerCase.contains("offset"), s"offset in plan:\n$plan")
      assert(picked.collect().map(_.getLong(0)).toSeq ===
        Seq(localRank((1 to 4000).map(i => (i % 97).toLong), 800L)))
    } finally cnt.unpersist()
  }
}
