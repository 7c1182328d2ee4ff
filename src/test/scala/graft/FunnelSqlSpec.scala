package graft

import graft.expressions.FunnelAggs
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** FUNNELMAXSTEP / FUNNELMATCHSTEP / FUNNELCOMPLETECOUNT — the funnel
  * aggregate expressions (expressions/FunnelExpressions): parity with the
  * ops.Funnel stage-frame pipeline on the events fixture, planted edge
  * cases (window cutoff, one event matching two steps, timestamp ties),
  * and the serialize/merge path under forced repartition.
  */
class FunnelSqlSpec extends GraftSuite {

  private lazy val pinot = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    s
  }

  private val steps = Seq("view", "click", "purchase")

  private def eventsDf = Tables.t(spark, sfDir, "events")
    .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))

  test("maxStep distribution matches ops.Funnel on the events fixture") {
    val stepCols = steps.map(s => col("event_type") === s)
    val window = 72L * 3600 * 1000000 // 72h in micros
    val perUser = eventsDf
      .groupBy(col("user_id"))
      .agg(FunnelAggs.maxStep(col("tus"), window, stepCols).as("max_step"))
      .groupBy(col("max_step")).agg(count(lit(1)).as("n_users"))
      .filter(col("max_step") > 0)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

    // ops.Funnel counts are CUMULATIVE step counts; its maxStepDistribution
    // yields the same exclusive histogram the aggregate produces
    val dist = graft.ops.Funnel
      .maxStepDistribution(
        eventsDf, "user_id", col("tus"), stepCols, Some(window))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      .filter(_._2 != 0L)

    assert(perUser === dist)
  }

  test("completeCount matches ops.Funnel.completeCount") {
    val stepCols = steps.map(s => col("event_type") === s)
    val window = 72L * 3600 * 1000000
    val total = eventsDf
      .groupBy(col("user_id"))
      .agg(FunnelAggs.completeCount(col("tus"), window, stepCols).as("c"))
      .agg(sum(col("c"))).collect()(0).getLong(0)
    val expected = graft.ops.Funnel
      .completeCount(eventsDf, "user_id", col("tus"), stepCols, Some(window))
      .collect()(0).getLong(0)
    assert(total === expected)
  }

  test("matchStep is the contiguous prefix of maxStep") {
    val stepCols = steps.map(s => col("event_type") === s)
    val rows = eventsDf
      .groupBy(col("user_id"))
      .agg(
        FunnelAggs.maxStep(col("tus"), 0L, stepCols).as("m"),
        FunnelAggs.matchStep(col("tus"), 0L, stepCols).as("ms"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getInt(1)
      val ms = r.getSeq[Int](2)
      assert(ms.length === 3)
      assert(ms === (0 until 3).map(i => if (i < m) 1 else 0))
    }
  }

  test("planted: window cutoff, shared-event steps, ties, merge path") {
    import spark.implicits._
    val df = Seq(
      // u1: full chain inside window
      ("u1", 100L, "view"), ("u1", 150L, "click"), ("u1", 190L, "purchase"),
      // u2: purchase lands past t1+window=210 → max step 2
      ("u2", 100L, "view"), ("u2", 150L, "click"), ("u2", 400L, "purchase"),
      // u3: click BEFORE first view → never chains past step 1
      ("u3", 50L, "click"), ("u3", 100L, "view"), ("u3", 90L, "purchase"),
      // u4: tie — click at the same ts as the anchoring view (>= admits it)
      ("u4", 100L, "view"), ("u4", 100L, "click"),
      // u5: no step-1 event at all
      ("u5", 10L, "purchase")
    ).toDF("user_id", "tus", "event_type")
      .repartition(8) // force partial buffers through serialize+merge
    val stepCols = steps.map(s => col("event_type") === s)
    val got = df.groupBy(col("user_id"))
      .agg(FunnelAggs.maxStep(col("tus"), 110L, stepCols).as("m"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("u1" -> 3, "u2" -> 2, "u3" -> 1, "u4" -> 2, "u5" -> 0))
  }

  test("one event matching two consecutive steps serves both") {
    import spark.implicits._
    // event B is both click and purchase by predicate (type IN (...)):
    // ts >= t(k-1) admits the SAME timestamp, so the chain completes
    val df = Seq(("u", 1L, "view"), ("u", 2L, "click_and_buy"))
      .toDF("user_id", "tus", "event_type")
    val stepCols = Seq(
      col("event_type") === "view",
      col("event_type").isin("click", "click_and_buy"),
      col("event_type").isin("purchase", "click_and_buy"))
    val m = df.groupBy(col("user_id"))
      .agg(FunnelAggs.maxStep(col("tus"), 0L, stepCols).as("m"))
      .collect()(0).getInt(1)
    assert(m === 3)
  }

  test("stepDurations: planted transition times and -1 sentinels") {
    import spark.implicits._
    val df = Seq(
      ("u1", 100L, "view"), ("u1", 150L, "click"), ("u1", 190L, "purchase"),
      ("u2", 100L, "view"), ("u2", 170L, "click"),
      ("u3", 10L, "purchase")
    ).toDF("user_id", "tus", "event_type")
    val stepCols = steps.map(s => col("event_type") === s)
    val got = df.groupBy(col("user_id"))
      .agg(FunnelAggs.stepDurations(col("tus"), 0L, stepCols).as("d"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("u1") === Seq(50.0, 40.0))
    assert(got("u2") === Seq(70.0, -1.0))
    assert(got("u3") === Seq(-1.0, -1.0))
  }

  test("strict_increase mode: ties and shared events no longer chain") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    Seq(
      ("u1", 100L, "view"), ("u1", 100L, "click"),  // tie: default chains, strict does not
      ("u2", 100L, "view"), ("u2", 150L, "click")
    ).toDF("user_id", "tus", "event_type").createOrReplaceTempView("ev_strict")
    val rows = s.sql(
      """SELECT user_id,
        |  funnelMaxStep(tus, 0, 2, event_type = 'view', event_type = 'click') AS dflt,
        |  funnelMaxStep(tus, 0, 2, event_type = 'view', event_type = 'click',
        |                'strict_increase') AS strict
        |FROM ev_strict GROUP BY user_id""".stripMargin)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(rows === Map("u1" -> ((2, 1)), "u2" -> ((2, 2))))
    // unknown mode strings error loudly
    val e = intercept[Exception](s.sql(
      "SELECT funnelMaxStep(tus, 0, 1, event_type = 'view', 'keep_all') FROM ev_strict")
      .collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unsupported funnel mode")))
  }

  test("per-group buffer cap fails loudly on a hot key; raising the conf admits it") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    // one bot user: 50 step-matching events
    (0 until 50).map(i => (1L, "view", i.toLong)).toDF("user_id", "event_type", "tus")
      .createOrReplaceTempView("hotkey_events")
    val q = """SELECT user_id, funnelMaxStep(tus, 0, 2,
              |  event_type = 'view', event_type = 'click') AS m
              |FROM hotkey_events GROUP BY user_id""".stripMargin
    s.conf.set(graft.expressions.FunnelAgg.MaxEventsConfKey, "10")
    val e = intercept[Exception](s.sql(q).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains(graft.expressions.FunnelAgg.MaxEventsConfKey)),
      msgs(e).mkString("; "))
    // cap is read at analysis time: raising the conf admits the same query
    s.conf.set(graft.expressions.FunnelAgg.MaxEventsConfKey, "1000")
    assert(s.sql(q).collect()(0).getInt(1) === 1)
    s.conf.unset(graft.expressions.FunnelAgg.MaxEventsConfKey)
  }

  test("funnel aggregate runs in a streaming complete-mode aggregation") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, String)]
    val stepCols = steps.map(s => col("event_type") === s)
    val q = ms.toDF().toDF("user_id", "tus", "event_type")
      .groupBy(col("user_id"))
      .agg(FunnelAggs.maxStep(col("tus"), 0L, stepCols).as("m"))
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("complete").start()
    try {
      ms.addData(("u1", 100L, "view"), ("u1", 150L, "click"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap === Map("u1" -> 2))
      // late purchase advances the chain on the next trigger — the state
      // store carries the aggregation buffer across batches
      ms.addData(("u1", 190L, "purchase"), ("u2", 10L, "view"))
      q.processAllAvailable()
      assert(spark.table("funnel_stream").collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap ===
        Map("u1" -> 3, "u2" -> 1))
    } finally q.stop()
  }

  test("SQL spellings resolve on the Pinot session") {
    Tables.t(pinot, sfDir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .createOrReplaceTempView("ev_funnel")
    val rows = pinot.sql(
      """SELECT user_id,
        |  funnelMaxStep(tus, 259200000000, 3,
        |    event_type = 'view', event_type = 'click', event_type = 'purchase') AS m,
        |  funnelCompleteCount(tus, 259200000000, 3,
        |    event_type = 'view', event_type = 'click', event_type = 'purchase') AS c,
        |  funnelMatchStep(tus, 259200000000, 3,
        |    event_type = 'view', event_type = 'click', event_type = 'purchase') AS ms
        |FROM ev_funnel GROUP BY user_id""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val m = r.getInt(1)
      assert(r.getLong(2) === (if (m == 3) 1L else 0L))
      assert(r.getSeq[Int](3) === (0 until 3).map(i => if (i < m) 1 else 0))
    }
  }

  test("FUNNEL_COUNT: order-free prefix set-intersection, planted truth") {
    import pinot.implicits._
    // u1 completes all three steps but OUT OF TIME ORDER — the set funnel
    // counts it (the ordered family would not); u2 matches steps 1+2; u3
    // matches step 2 only (counts nowhere — prefix requires step 1); u4
    // matches step 1 twice (distinct id counted once)
    Seq(
      (1L, 30L, "purchase"), (1L, 20L, "click"), (1L, 10L, "view"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 5L, "click"),
      (4L, 7L, "view"), (4L, 8L, "view")
    ).toDF("uid", "t", "etype").createOrReplaceTempView("fc_events")
    val out = pinot.sql(
      """SELECT FUNNEL_COUNT(
        |         STEPS(etype = 'view', etype = 'click', etype = 'purchase'),
        |         CORRELATE_BY(uid), SETTINGS('set')) AS fc
        |FROM fc_events""".stripMargin)
      .collect()(0).getSeq[Long](0)
    assert(out === Seq(3L, 2L, 1L))
  }

  test("FUNNEL_COUNT: merge path under repartition; both spellings; loud bad setting") {
    import pinot.implicits._
    val df = (0L until 400L).map(i => (i % 40, if (i % 3 == 0) "a" else "b"))
      .toDF("uid", "etype")
    df.repartition(7).createOrReplaceTempView("fc_big")
    val a = pinot.sql(
      """SELECT funnelCount(STEPS(etype = 'a', etype = 'b'), CORRELATE_BY(uid)) AS fc
        |FROM fc_big""".stripMargin).collect()(0).getSeq[Long](0)
    // every uid has both types across its 10 rows (i%3 pattern hits both)
    assert(a === Seq(40L, 40L))
    val b = pinot.sql(
      """SELECT funnel_count(STEPS(etype = 'a', etype = 'b'), CORRELATE_BY(uid)) AS fc
        |FROM fc_big""".stripMargin).collect()(0).getSeq[Long](0)
    assert(b === a)
    val err = intercept[Exception] {
      pinot.sql(
        """SELECT FUNNEL_COUNT(STEPS(etype = 'a'), CORRELATE_BY(uid),
          |SETTINGS('warp_drive')) AS fc FROM fc_big""".stripMargin).collect()
    }
    assert(err.getMessage.contains("warp_drive") ||
      err.getCause != null && err.getCause.getMessage.contains("warp_drive"))
  }

  test("FUNNEL_COUNT honors graft.funnel.maxEventsPerGroup (analysis-time conf read)") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    (0L until 50L).map(i => (i, "a")).toDF("uid", "etype")
      .createOrReplaceTempView("fc_cap")
    val q = """SELECT FUNNEL_COUNT(STEPS(etype = 'a'), CORRELATE_BY(uid)) AS fc
              |FROM fc_cap""".stripMargin
    // capFail tells users to raise this conf — so it must actually govern
    // FUNNEL_COUNT, not just the ordered funnel family (round-8 advice)
    s.conf.set(graft.expressions.FunnelAgg.MaxEventsConfKey, "10")
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val e = intercept[Exception](s.sql(q).collect())
    assert(msgs(e).exists(_.contains(graft.expressions.FunnelAgg.MaxEventsConfKey)),
      msgs(e).mkString("; "))
    s.conf.set(graft.expressions.FunnelAgg.MaxEventsConfKey, "1000")
    assert(s.sql(q).collect()(0).getSeq[Long](0) === Seq(50L))
    s.conf.unset(graft.expressions.FunnelAgg.MaxEventsConfKey)
  }

  test("FUNNEL_COUNT theta_sketch strategy: exact below saturation, bounded state above") {
    import pinot.implicits._
    // 5k distinct ids, well under lgK=12's retained entries -> theta IS exact
    (0L until 20000L).map(i => (i % 5000, if (i % 4 == 0) "a" else "b"))
      .toDF("uid", "etype").repartition(5).createOrReplaceTempView("fc_theta")
    def fc(setting: String): Seq[Long] = pinot.sql(
      s"""SELECT FUNNEL_COUNT(STEPS(etype = 'a', etype = 'b'),
         |CORRELATE_BY(uid), SETTINGS('$setting')) AS fc FROM fc_theta""".stripMargin)
      .collect()(0).getSeq[Long](0)
    assert(fc("theta_sketch") === fc("set"))
    // above saturation: estimates carry theta's error, never a cap failure
    (0L until 400000L).map(i => (i, "a")).toDF("uid", "etype")
      .createOrReplaceTempView("fc_huge")
    val est = pinot.sql(
      """SELECT FUNNEL_COUNT(STEPS(etype = 'a'), CORRELATE_BY(uid),
        |SETTINGS('theta_sketch')) AS fc FROM fc_huge""".stripMargin)
      .collect()(0).getSeq[Long](0)(0)
    assert(math.abs(est - 400000L) < 400000 * 0.05,
      s"theta estimate $est outside 5% of 400k")
    // the serialized per-group state is sketch-bounded, not id-bounded
    val agg = graft.expressions.FunnelCountThetaAgg(
      org.apache.spark.sql.catalyst.expressions.Literal(0L),
      org.apache.spark.sql.catalyst.expressions.Literal(1), 1)
    val buf = agg.createAggregationBuffer()
    (0L until 100000L).foreach(buf(0).update)
    assert(agg.serialize(buf).length < 70000,
      "theta state must stay bounded regardless of distinct-id count")
  }
}
