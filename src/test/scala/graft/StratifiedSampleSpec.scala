package graft

import org.apache.spark.sql.functions._

/** q_sample_stratified: exact-N-per-stratum semantics and the scale-shape
  * evidence — Spark's WindowGroupLimit must turn the rank filter into a
  * per-partition top-N so the stratum sort never fully materializes. */
class StratifiedSampleSpec extends GraftSuite {

  test("exactly 5 sampled per stratum, deterministic across runs") {
    val run = () => SparkEntry.queries("q_sample_stratified")(spark, sfDir).collect()
    val a = run(); val b = run()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perLang.values.toSet === Set(5), s"per-stratum counts: $perLang")
    assert(perLang.keySet === Set("de", "en", "es", "fr", "zh"))
  }

  test("rank filter compiles to WindowGroupLimit (partial top-N before the shuffle)") {
    val df = SparkEntry.queries("q_sample_stratified")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan missing WindowGroupLimit:\n$plan")
  }
}
