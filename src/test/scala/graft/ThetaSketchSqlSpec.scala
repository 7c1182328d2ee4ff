package graft

import org.apache.spark.sql.functions._

/** Pinot's full distinctCountThetaSketch broker argument form
  * (expressions/ThetaSketchSql): predicate strings become FILTERed theta
  * aggregates, the SET_OP postfix combines them by $i reference. Below
  * theta saturation the estimates are EXACT, so planted truths hash. */
class ThetaSketchSqlSpec extends GraftSuite {

  private lazy val pinot = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    // 300 users: %3==0 view (100), %5==0 click (60), %15==0 both (20),
    // user 7 errors only
    (0L until 300L).flatMap { u =>
      (if (u % 3 == 0) Seq((u, "view")) else Nil) ++
        (if (u % 5 == 0) Seq((u, "click")) else Nil) ++
        (if (u == 7) Seq((u, "error")) else Nil)
    }.toDF("uid", "etype").repartition(5).createOrReplaceTempView("theta_ev")
    s
  }

  test("SET_INTERSECT of two predicate sketches = exact overlap below saturation") {
    val n = pinot.sql(
      """SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '',
        |  'etype = ''view''', 'etype = ''click''',
        |  'SET_INTERSECT($1, $2)') AS n FROM theta_ev""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 20L) // multiples of 15 in [0,300)
  }

  test("SET_DIFF and nested expressions") {
    val viewNotClick = pinot.sql(
      """SELECT DISTINCT_COUNT_THETA_SKETCH(uid, 'nominalEntries=4096',
        |  'etype = ''view''', 'etype = ''click''',
        |  'SET_DIFF($1, $2)') AS n FROM theta_ev""".stripMargin)
      .collect()(0).getLong(0)
    assert(viewNotClick === 80L) // 100 views - 20 both
    val nested = pinot.sql(
      """SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '',
        |  'etype = ''view''', 'etype = ''click''', 'etype = ''error''',
        |  'SET_UNION(SET_INTERSECT($1, $2), $3)') AS n FROM theta_ev""".stripMargin)
      .collect()(0).getLong(0)
    assert(nested === 21L) // 20 both + user 7
  }

  test("predicates without a set expression union; params-only form works") {
    val u = pinot.sql(
      """SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '',
        |  'etype = ''view''', 'etype = ''click''') AS n FROM theta_ev""".stripMargin)
      .collect()(0).getLong(0)
    assert(u === 140L) // 100 + 60 - 20
    val plain = pinot.sql(
      "SELECT DISTINCT_COUNT_THETA_SKETCH(uid, 'nominalEntries=1024') AS n FROM theta_ev")
      .collect()(0).getLong(0)
    assert(plain === 141L) // all distinct uids incl. user 7
  }

  test("RAW form returns a sketch the scalar family can keep composing") {
    val est = pinot.sql(
      """SELECT thetaSketchEstimate(
        |  DISTINCT_COUNT_RAW_THETA_SKETCH(uid, '',
        |    'etype = ''view''', 'etype = ''click''',
        |    'SET_INTERSECT($1, $2)')) AS n FROM theta_ev""".stripMargin)
      .collect()(0).getLong(0)
    assert(est === 20L)
  }

  test("loud failures: bad $ref, unknown op, unknown parameter, trailing junk") {
    def fails(sql: String, needle: String): Unit = {
      val e = intercept[Exception](pinot.sql(sql).collect())
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains(needle)), msgs(e).mkString("; "))
    }
    fails("""SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '', 'etype = ''view''',
            |'SET_UNION($1, $2)') FROM theta_ev""".stripMargin, "out of range")
    fails("""SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '', 'etype = ''view''',
            |'SET_XOR($1)') FROM theta_ev""".stripMargin, "unknown set operation")
    fails("SELECT DISTINCT_COUNT_THETA_SKETCH(uid, 'logK=9') FROM theta_ev",
      "unsupported parameter")
    fails("""SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '', 'etype = ''view''',
            |'SET_UNION($1) garbage') FROM theta_ev""".stripMargin, "trailing input")
  }

  test("merge path: predicate sketches survive repartition and partial aggregation") {
    // same answers with forced multi-partition partial/final split
    val n = pinot.sql(
      """SELECT DISTINCT_COUNT_THETA_SKETCH(uid, '',
        |  'etype = ''view''', 'etype = ''click''',
        |  'SET_INTERSECT($1, $2)') AS n
        |FROM (SELECT /*+ REPARTITION(7) */ * FROM theta_ev)""".stripMargin)
      .collect()(0).getLong(0)
    assert(n === 20L)
  }
}
