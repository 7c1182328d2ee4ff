package graft

import org.apache.spark.sql.functions._

/** The optimizer rule (plans.RangeJoinBinningRule) on a NAIVE BETWEEN
  * theta-join: with the conf set, users get the binned equi-join plan
  * without rewriting their query; results identical to the nested-loop
  * plan; off by default. */
class RangeJoinRuleSpec extends GraftSuite {

  // frames must be created ON the session under test — a DataFrame runs
  // through the optimizer of the session it was built on
  private def naiveJoin(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val points = (1L to 400L).map(i => (i, rnd.nextDouble() * 100)).toDF("pid", "v")
    val rnd2 = new scala.util.Random(18)
    val intervals = (1L to 60L).map { i =>
      val lo = rnd2.nextDouble() * 90
      (i, lo, lo + rnd2.nextDouble() * 12)
    }.toDF("iid", "lo", "hi")
    points.join(intervals, $"v" >= $"lo" && $"v" <= $"hi")
      .select($"pid", $"iid")
  }

  test("with binWidth set, a naive BETWEEN join plans as an equi-join") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.binWidth", "10.0")
    val df = naiveJoin(s)
    val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule must remove the nested loop:\n$plan")
    assert(plan.contains("__graft_bin"), s"expected the bin key in:\n$plan")

    // identical results to the untouched nested-loop plan
    val plain = naiveJoin(spark).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rewritten === plain)
    assert(rewritten.nonEmpty)
  }

  test("rule fires with the conjuncts in swapped order (p <= hi AND p >= lo)") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    s.conf.set("spark.graft.rangeJoin.binWidth", "10.0")
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val points = (1L to 400L).map(i => (i, rnd.nextDouble() * 100)).toDF("pid", "v")
    val rnd2 = new scala.util.Random(18)
    val intervals = (1L to 60L).map { i =>
      val lo = rnd2.nextDouble() * 90
      (i, lo, lo + rnd2.nextDouble() * 12)
    }.toDF("iid", "lo", "hi")
    // upper bound FIRST — the rule must recognize either conjunct order
    val df = points.join(intervals, $"v" <= $"hi" && $"v" >= $"lo")
      .select($"pid", $"iid")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule must fire on swapped conjuncts:\n$plan")
    assert(plan.contains("__graft_bin"), s"expected the bin key in:\n$plan")
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = naiveJoin(spark).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === plain)
  }

  test("rule is off without the conf: plan unchanged") {
    val s = spark.newSession()
    GraftExtensions.register(s)
    val plan = naiveJoin(s).queryExecution.executedPlan.toString
    assert(!plan.contains("__graft_bin"))
  }
}
