package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** Pinot MV aggregate family: the per-element TypedImperativeAggregates
  * must agree with the explode-based equivalents (the semantic ground
  * truth), across many partitions so the serialize/merge path actually
  * executes; PERCENTILEMV must agree with the SV percentile on exploded
  * data; and the SQL vocabulary must resolve on a Pinot session. */
class MvAggSpec extends GraftSuite {

  import spark.implicits._

  // 8 partitions of MV rows → partial buffers must serialize and merge
  private lazy val mv = Seq(
    ("a", Seq("x", "y", "x"), Seq(1, 2)),
    ("a", Seq("y", "z"), Seq(2, 4)),
    ("a", Seq.empty[String], Seq.empty[Int]),
    ("b", Seq("p"), Seq(10, 10, 7)),
    ("b", Seq("p", "q", "r", "p"), Seq(3))
  ).toDF("g", "toks", "nums").repartition(8).cache()

  test("DISTINCTCOUNTMV / DISTINCTSUMMV / DISTINCTAVGMV match explode-based ground truth") {
    val got = mv.groupBy($"g").agg(
      distinct_count_mv($"toks").as("dc"),
      distinct_sum_mv($"nums").as("ds"),
      distinct_avg_mv($"nums").as("da")).orderBy($"g").collect()
    // group a: toks {x,y,z}, nums {1,2,4}; group b: toks {p,q,r}, nums {10,7,3}
    assert(got(0).getLong(1) === 3L && got(0).getLong(2) === 7L && got(0).getDouble(3) === 7.0 / 3)
    assert(got(1).getLong(1) === 3L && got(1).getLong(2) === 20L && got(1).getDouble(3) === 20.0 / 3)

    val exploded = mv.select($"g", explode($"toks").as("t"))
      .groupBy($"g").agg(countDistinct($"t").as("dc")).orderBy($"g").collect()
    assert(exploded.map(_.getLong(1)).toSeq === got.map(_.getLong(1)).toSeq)
  }

  test("DISTINCTCOUNTHLLMV estimates exactly at tiny cardinality and merges across partitions") {
    val got = mv.groupBy($"g").agg(distinct_count_hll_mv($"toks").as("h")).orderBy($"g").collect()
    // HLL is exact in sparse mode at cardinality 3
    assert(got.map(_.getLong(1)).toSeq === Seq(3L, 3L))
    // larger sweep: 5000 distinct ints spread over arrays and partitions
    val wide = (0 until 2500).map(i => (i % 4, Seq(2 * i, 2 * i + 1))).toDF("g", "arr")
      .repartition(16)
    val est = wide.groupBy($"g").agg(distinct_count_hll_mv($"arr").as("h"))
      .agg(sum($"h")).collect().head.getLong(0)
    assert(math.abs(est - 5000L) <= 250L, s"HLL estimate $est vs 5000")
  }

  test("PERCENTILEMV equals SV percentile over the exploded elements") {
    val ps = Seq(0.0, 25.0, 50.0, 75.0, 90.0, 100.0)
    for (p <- ps) {
      val m = mv.groupBy($"g").agg(percentile_mv($"nums", p).as("v")).orderBy($"g")
        .collect().map(_.getDouble(1)).toSeq
      val exact = mv.select($"g", explode($"nums").as("v")).groupBy($"g")
        .agg(expr(s"percentile(v, ${p / 100})").as("v")).orderBy($"g")
        .collect().map(_.getDouble(1)).toSeq
      assert(m === exact, s"p=$p")
    }
  }

  test("MINMAXRANGEMV spans the group's element range") {
    val got = mv.groupBy($"g").agg(min_max_range_mv($"nums").as("r")).orderBy($"g")
      .collect().map(_.getInt(1)).toSeq
    assert(got === Seq(3, 7)) // a: 4-1, b: 10-3
  }

  test("PERCENTILEKLLMV tracks the exact MV percentile within the KLL rank-error bound") {
    import org.apache.spark.sql.graft.GraftBridge
    def kllMv(arr: org.apache.spark.sql.Column, p: Double) =
      GraftBridge.column(graft.expressions.MvAggs.percentileKllMv(
        GraftBridge.expression(arr), GraftBridge.expression(lit(p))))
    // 10k elements over 2.5k arrays and 16 partitions: serialize/merge runs
    val wide = (0 until 2500).map(i => (i % 4, Seq(2 * i, 2 * i + 1))).toDF("g", "arr")
      .repartition(16)
    val got = wide.groupBy($"g")
      .agg(kllMv($"arr", 50.0).as("est"), percentile_mv($"arr", 50.0).as("exact"))
      .collect()
    got.foreach { r =>
      // k=200 → ~1.65% rank error; values are ~uniform on [g, 5000), so a
      // 5%-of-range tolerance comfortably covers the rank-error bound
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 250.0,
        s"g=${r.get(0)}: kll ${r.getDouble(1)} vs exact ${r.getDouble(2)}")
    }
  }

  test("SQL vocabulary resolves: DISTINCTCOUNTMV / PERCENTILEMV / MINMAXRANGEMV") {
    val pinot = spark.newSession()
    PinotFunctions.register(pinot)
    // temp views are session-scoped — materialize the fixture on the pinot session
    pinot.createDataFrame(mv.collectAsList(), mv.schema).createOrReplaceTempView("mvx")
    val r = pinot.sql(
      """SELECT g, DISTINCTCOUNTMV(toks) AS dc, DISTINCTSUMMV(nums) AS ds,
        |       PERCENTILEMV(nums, 50) AS p50, MINMAXRANGEMV(nums) AS mmr,
        |       DISTINCTCOUNTHLLMV(toks) AS hll
        |FROM mvx GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r(0).getLong(1) === 3L && r(1).getLong(1) === 3L)
    assert(r(0).getLong(2) === 7L && r(1).getLong(2) === 20L)
    assert(r(0).getInt(4) === 3 && r(1).getInt(4) === 7)
    assert(r(0).getLong(5) === 3L && r(1).getLong(5) === 3L)
  }
}
