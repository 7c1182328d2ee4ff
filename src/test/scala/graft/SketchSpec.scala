package graft

import org.apache.spark.sql.functions._

/** Accuracy contracts for the sketch aggregations (A5/A7). Since round 4 the
  * declared queries fold the sketch estimates into deterministic
  * within-bound BOOLEANS (so they hard-oracle against DuckDB); this spec
  * asserts (a) every declared bound boolean is true, and (b) the raw sketch
  * estimates — recomputed here — meet the tighter configured error bounds. */
class SketchSpec extends GraftSuite {

  test("q_sketch_hll bound booleans hold and raw HLL++ is within rsd of exact") {
    val rows = SparkEntry.queries("q_sketch_hll")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("parts_within_5pct"), r.toString)
      assert(r.getAs[Boolean]("orders_within_5pct"), r.toString)
    }
    // raw estimate vs exact, tighter than the declared 5% envelope
    val li = sources.Tables.t(spark, sfDir, "lineitem")
    val raw = li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    raw.foreach { r =>
      val approx = r.getAs[Long]("approx").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"HLL estimate $approx vs exact $exact")
    }
  }

  test("approx_top_k finds a planted heavy hitter among high-cardinality noise") {
    import spark.implicits._
    // 10k singleton ids + one item planted 500 times: the frequent-items
    // sketch must surface it at rank 1 with a count inside its error bound
    val df = ((1 to 10000).map(_.toString) ++ Seq.fill(500)("HOT")).toDF("s")
    val top = df.agg(expr("approx_top_k(s, 1)").as("tk"))
      .select(explode($"tk").as("x"))
      .select($"x.item", $"x.count").as[(String, Long)].head()
    assert(top._1 === "HOT")
    assert(top._2 >= 400L && top._2 <= 600L, s"count ${top._2} outside bound")
  }

  test("q_sketch_theta 3-set expression bounds hold and exact side obeys set algebra") {
    val r = SparkEntry.queries("q_sketch_theta")(spark, sfDir).collect().head
    Seq("union3_within_5pct", "intersect_within_20pct",
        "diff3_within_20pct", "mixed3_within_20pct")
      .foreach(b => assert(r.getAs[Boolean](b), s"$b: $r"))
    val (a, b, c) = (r.getAs[Long]("exact_q1"), r.getAs[Long]("exact_q2"), r.getAs[Long]("exact_q3"))
    val ab = r.getAs[Long]("exact_ab")
    // (A∩B)∖C ⊆ A∩B, and its complement inside A∩B — (A∩B)∩C — is
    // contained in (A∪B)∩C
    assert(r.getAs[Long]("exact_ab_not_c") <= ab)
    assert(ab - r.getAs[Long]("exact_ab_not_c") <= r.getAs[Long]("exact_ab_and_c"))
    assert(r.getAs[Long]("exact_any") <= a + b + c, "union bounded by sum")
    assert(r.getAs[Long]("exact_any") >= Seq(a, b, c).max, "union dominates each set")
    assert(ab > 0 && ab < a && ab < b, "fixture overlap is genuinely partial")
  }

  test("q_sketch_percentile bound booleans hold and raw sketch is within 5% of exact median") {
    val rows = SparkEntry.queries("q_sketch_percentile")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_5pct"), r.toString)
      assert(r.getAs[Boolean]("p99_within_5pct"), r.toString)
    }
    val li = sources.Tables.t(spark, sfDir, "lineitem")
    val raw = li.groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx"),
        percentile(col("l_extendedprice"), lit(0.5)).as("exact"))
      .collect()
    raw.foreach { r =>
      val approx = r.getAs[Double]("approx")
      val exact = r.getAs[Double]("exact")
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx p50 $approx vs exact $exact")
    }
  }
}
