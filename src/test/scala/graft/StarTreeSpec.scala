package graft

import graft.plans.StarTree
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Star-tree index analog (plans/StarTree): materialized rollup + Catalyst
  * routing rule. Proves (1) value-identical results for every decomposable
  * aggregate shape incl. null dims/metrics and empty inputs, (2) the plan
  * actually scans the rollup (the 100 TB scan-reduction evidence), (3) the
  * rule never fires on non-decomposable queries or unregistered sessions. */
class StarTreeSpec extends GraftSuite {

  private lazy val factPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_st_fact").toString
    val out = s"$dir/fact.parquet"
    import spark.implicits._
    // planted: null dim, null metrics, duplicate dim combos
    Seq(
      ("a", "x", Some(1), 10.0),
      ("a", "x", Some(3), 30.0),
      ("a", "y", None, 20.0),
      ("b", "x", Some(5), 50.0),
      ("b", null, Some(7), 70.0),
      (null, "y", Some(9), 90.0),
      (null, "y", None, 110.0))
      .toDF("d1", "d2", "m1o", "m2")
      .withColumn("m1", col("m1o").cast("int")).drop("m1o")
      .write.mode("overwrite").parquet(out)
    out
  }

  private def routed(): SparkSession = {
    val s = spark.newSession()
    StarTree.register(s, factPath, dims = Seq("d1", "d2"), metrics = Seq("m1", "m2"))
    s
  }

  private def aggShape(s: SparkSession) = {
    val f = s.read.parquet(factPath)
    f.filter(col("d2") =!= "zzz" || col("d2").isNull) // dim-only filter (keeps null-d2 rows out, like raw)
      .groupBy(col("d1"))
      .agg(
        count(lit(1)).as("cnt"),
        count(col("m1")).as("cnt_m1"),
        sum(col("m1")).as("sum_m1"),
        sum(col("m2")).as("sum_m2"),
        min(col("m2")).as("min_m2"),
        max(col("m2")).as("max_m2"),
        avg(col("m1")).as("avg_m1"),
        count(col("d2")).as("cnt_d2"),
        min(col("d2")).as("min_d2"))
      .orderBy(col("d1"))
  }

  test("routed aggregate scans the rollup and matches the raw-scan results exactly") {
    val s = routed()
    val df = aggShape(s)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_startree_"), s"expected rollup scan in:\n$plan")
    assert(!plan.contains("fact.parquet"), s"fact must not be scanned:\n$plan")

    val raw = aggShape(spark) // plain session: no rule, raw scan
    assert(df.collect().toSeq === raw.collect().toSeq)
  }

  test("subset grouping and global (no group-by) aggregates route and match") {
    val s = routed()
    val global = s.read.parquet(factPath)
      .agg(count(lit(1)).as("cnt"), sum("m1").as("s1"), avg("m2").as("a2"))
    assert(global.queryExecution.executedPlan.toString.contains("graft_startree_"))
    val globalRaw = spark.read.parquet(factPath)
      .agg(count(lit(1)).as("cnt"), sum("m1").as("s1"), avg("m2").as("a2"))
    assert(global.collect().toSeq === globalRaw.collect().toSeq)

    // filter that eliminates every row: COUNT must still be 0, sums null
    val empty = s.read.parquet(factPath).filter(col("d1") === "nope")
      .agg(count(lit(1)).as("cnt"), sum("m1").as("s1"))
    assert(empty.queryExecution.executedPlan.toString.contains("graft_startree_"))
    val r = empty.collect()(0)
    assert(r.getLong(0) === 0L && r.isNullAt(1))
  }

  test("non-decomposable shapes fall back to the fact scan") {
    val s = routed()
    // DISTINCT aggregate
    val d = s.read.parquet(factPath).groupBy("d1").agg(countDistinct("m1"))
    assert(!d.queryExecution.executedPlan.toString.contains("graft_startree_"))
    // filter touching a metric column
    val f = s.read.parquet(factPath).filter(col("m2") > 20)
      .groupBy("d1").agg(sum("m1"))
    assert(!f.queryExecution.executedPlan.toString.contains("graft_startree_"))
    // grouping by a metric
    val g = s.read.parquet(factPath).groupBy("m1").agg(count(lit(1)))
    assert(!g.queryExecution.executedPlan.toString.contains("graft_startree_"))
    // FILTER clause on the aggregate
    val fc = s.read.parquet(factPath).groupBy("d1")
      .agg(expr("sum(m1) FILTER (WHERE m2 > 20)"))
    assert(!fc.queryExecution.executedPlan.toString.contains("graft_startree_"))
  }

  test("sessions that did not register stay on the raw scan (conf isolation)") {
    routed() // registry now has factPath globally
    val other = spark.newSession()
    GraftExtensions.register(other) // rules present, conf absent
    val df = other.read.parquet(factPath).groupBy("d1").agg(sum("m1"))
    assert(!df.queryExecution.executedPlan.toString.contains("graft_startree_"))
  }

  test("lineitem rollup: scan-size reduction and value parity on the declared query shape") {
    val s = spark.newSession()
    val li = s"$sfDir/lineitem.parquet"
    val spec = StarTree.register(s, li,
      dims = Seq("l_returnflag", "l_linestatus"), metrics = Seq("l_quantity", "l_extendedprice"))
    val factRows = s.read.parquet(li).count()
    val rollupRows = s.read.parquet(spec.rollupPath).count()
    assert(rollupRows < factRows / 10,
      s"rollup must be much smaller than the fact: $rollupRows vs $factRows")

    def shape(x: SparkSession) = x.read.parquet(li)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sq"),
        avg("l_quantity").as("aq"), max("l_extendedprice").as("mx"))
      .orderBy("l_returnflag", "l_linestatus")
    val routedDf = shape(s)
    assert(routedDf.queryExecution.executedPlan.toString.contains("graft_startree_"))
    val raw = shape(spark).collect().toSeq
    val viaRollup = routedDf.collect().toSeq
    // l_quantity is integral-valued double → sums exact in any association
    // order; counts/min/max exact → rows compare bit-equal
    assert(viaRollup === raw)
  }

  test("declared q_startree_rollup routes through the rollup") {
    val q = Registry.all.find(_.name == "q_startree_rollup").get
    val df = q.run(spark, sfDir)
    assert(df.queryExecution.executedPlan.toString.contains("graft_startree_"),
      "the declared query must be served by the star-tree rollup")
    assert(df.count() > 0)
  }

  test("sketch measures: hll/theta aggs route to union-merges of stored cells, bit-equal to raw") {
    import graft.expressions.ThetaSketch._
    // separate fact (the shared planted fact is registered without sketch
    // cols by other tests; registry is keyed by path)
    val path = java.nio.file.Files.createTempDirectory("graft-st-sk").toString + "/fact"
    // 3 groups x 500 distinct u each (gcd(3,500)=1 => every residue appears)
    spark.range(0, 3000).select(
        (col("id") % 3).cast("string").as("d1"), (col("id") % 500).as("u"))
      .write.mode("overwrite").parquet(path)

    val s = spark.newSession()
    StarTree.register(s, path, dims = Seq("d1"), metrics = Nil, sketchCols = Seq("u"))

    def shape(x: SparkSession) = x.read.parquet(path)
      .groupBy("d1")
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col("u"), lit(12))).as("hll"),
        thetaEstimate(thetaSketchAgg(col("u"))).as("theta"))
      .orderBy("d1")
    val routedDf = shape(s)
    assert(routedDf.queryExecution.executedPlan.toString.contains("graft_startree_"),
      "sketch aggregate must be served by the rollup")
    // HLL register-max and theta k-smallest merges are lossless at equal
    // lgK: merged-cell estimates must equal the single-pass raw estimates
    assert(routedDf.collect().toSeq === shape(spark).collect().toSeq)
    // and below 2^lgK theta is exact outright
    routedDf.collect().foreach(r => assert(r.getAs[Long]("theta") === 500L))

    // global (no group-by): a REAL multi-cell merge across all 3 cells —
    // distincts overlap completely, so a naive sum of cells (1500) would be
    // wrong; the union must answer 500
    val g = s.read.parquet(path)
      .agg(thetaEstimate(thetaSketchAgg(col("u"))).as("theta"),
        hll_sketch_estimate(hll_sketch_agg(col("u"), lit(12))).as("hll"))
    assert(g.queryExecution.executedPlan.toString.contains("graft_startree_"))
    assert(g.collect()(0).getAs[Long]("theta") === 500L)

    // lgK mismatch vetoes the rewrite (a different-k union would resample)
    val mismatch = s.read.parquet(path)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"), lit(13))).as("hll"))
    assert(!mismatch.queryExecution.executedPlan.toString.contains("graft_startree_"))
  }

  test("declared q_startree_sketch routes through the rollup") {
    val q = Registry.all.find(_.name == "q_startree_sketch").get
    val df = q.run(spark, sfDir)
    // the est side routes; the exact side (DISTINCT) stays on the raw scan
    assert(df.queryExecution.executedPlan.toString.contains("graft_startree_"))
    assert(df.collect().forall(r =>
      r.getAs[Boolean]("hll_within_5pct") && r.getAs[Boolean]("theta_within_5pct")))
  }
}
