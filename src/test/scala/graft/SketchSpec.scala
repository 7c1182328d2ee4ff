package graft

import org.apache.spark.sql.functions._

/** Accuracy contracts for the sketch aggregations (A5/A7) that cannot be
  * oracle-matched (SURVEY.md §7.4.1). */
class SketchSpec extends GraftSuite {

  test("HLL++ distinct within rsd bound of exact") {
    val rows = SparkEntry.queries("q_sketch_hll")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
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

  test("approx percentile within 5% of exact median") {
    val rows = SparkEntry.queries("q_sketch_percentile")(spark, sfDir).collect()
    rows.foreach { r =>
      val approx = r.getAs[Double]("p50_approx")
      val exact = r.getAs[Double]("p50_exact")
      assert(math.abs(approx - exact) / exact < 0.05,
        s"approx p50 $approx vs exact $exact")
    }
  }
}
