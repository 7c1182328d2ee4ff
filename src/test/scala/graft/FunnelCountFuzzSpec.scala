package graft

/** Seeded fuzz: FUNNEL_COUNT (exact set strategy) against a direct Scala
  * reference — per correlated id, OR the matched-step set over its rows,
  * count prefix-complete ids per step — across random event sets, group
  * keys, and partitionings. The theta strategy must agree exactly at
  * these cardinalities (far below sketch saturation). */
class FunnelCountFuzzSpec extends GraftSuite {

  private lazy val pinot = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    s
  }

  test("10 seeded rounds: SQL matches the reference; theta agrees below saturation") {
    import pinot.implicits._
    val types = Seq("s1", "s2", "s3", "zz")
    for (round <- 0 until 10) {
      val r = new scala.util.Random(7000 + round)
      val events = (0 until 300).map { _ =>
        (r.nextInt(40).toLong, types(r.nextInt(types.length)), r.nextInt(3).toLong)
      }
      events.toDF("uid", "etype", "grp").repartition(1 + round % 4)
        .createOrReplaceTempView("fz_events")

      // reference: per (grp, uid) matched-step set -> prefix counts
      val expected = events.groupBy(e => (e._3, e._1)).toSeq.map { case ((g, _), es) =>
        val m = Seq("s1", "s2", "s3").map(s => es.exists(_._2 == s))
        (g, m)
      }.groupBy(_._1).map { case (g, ms) =>
        val counts = (0 until 3).map { k =>
          ms.count { case (_, m) => (0 to k).forall(m(_)) }.toLong
        }
        g -> counts
      }

      for (setting <- Seq("set", "theta_sketch")) {
        val got = pinot.sql(
          s"""SELECT grp, FUNNEL_COUNT(
             |  STEPS(etype = 's1', etype = 's2', etype = 's3'),
             |  CORRELATE_BY(uid), SETTINGS('$setting')) AS fc
             |FROM fz_events GROUP BY grp""".stripMargin)
          .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
        expected.foreach { case (g, cs) =>
          assert(got(g) === cs, s"round $round setting $setting group $g")
        }
      }
    }
  }
}
