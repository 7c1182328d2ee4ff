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
