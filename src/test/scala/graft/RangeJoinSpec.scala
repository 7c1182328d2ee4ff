package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** Binned range join on planted intervals: exact containment semantics
  * (inclusive both ends), multi-bin intervals, and the no-cartesian plan. */
class RangeJoinSpec extends GraftSuite {
  import spark.implicits._

  private val points = Seq(
    (1L, 5.0), (2L, 10.0), (3L, 15.0), (4L, 25.0), (5L, 99.0)
  ).toDF("pid", "v")

  // interval 100 spans bins [0..2] at width 10; 200 is a point-interval
  private val intervals = Seq(
    (100L, 4.0, 26.0), (200L, 10.0, 10.0), (300L, 50.0, 60.0)
  ).toDF("iid", "lo", "hi")

  private lazy val got = RangeJoin
    .binnedRangeJoin(points, intervals, "v", "lo", "hi", binWidth = 10.0)
    .select($"pid", $"iid").as[(Long, Long)].collect().toSet

  test("every containing interval is matched, inclusive at both bounds") {
    assert(got === Set(
      (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L),  // 4..26 contains 5,10,15,25
      (2L, 200L)                                        // hi-inclusive point interval
    ))
  }

  test("binning agrees with the naive BETWEEN join on random data") {
    val rnd = new scala.util.Random(3)
    val ps = (1L to 300L).map(i => (i, rnd.nextDouble() * 100)).toDF("pid", "v")
    val lows = (1L to 40L).map(i => (i, rnd.nextDouble() * 90))
    val ivs = lows.map { case (i, lo) => (i, lo, lo + rnd.nextDouble() * 15) }.toDF("iid", "lo", "hi")
    val binned = RangeJoin.binnedRangeJoin(ps, ivs, "v", "lo", "hi", 7.5)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val naive = ps.join(ivs, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(binned === naive)
  }

  test("the plan is an equi-join on the bin key, not a nested-loop cartesian") {
    val df = RangeJoin.binnedRangeJoin(points, intervals, "v", "lo", "hi", 10.0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must not plan a nested loop:\n$plan")
  }

  test("declared q_join_range aggregates without an Expand over the matches") {
    // count+countDistinct in one agg would plan Expand (×2 row duplication
    // of every matched pair); the two-level agg must keep it out
    val df = SparkEntry.queries("q_join_range")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"expected no Expand in:\n$plan")
    assert(df.count() > 0)
  }
}
