package graft

import org.apache.spark.sql.Row

/** Round-5 registry additions: HISTOGRAM (both Pinot forms), ARG_MIN /
  * ARG_MAX, typed array set-op aliases, PERCENTILERAWTDIGEST round-trip. */
class RegistryExtrasSpec extends GraftSuite {

  private lazy val pinot: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    Seq((1, 2.0, "a"), (2, 7.0, "b"), (3, 5.0, "c"), (4, 10.0, "d"), (5, 10.0, "e"))
      .toDF("k", "m", "tag").createOrReplaceTempView("hx")
    s
  }

  private def one(sql: String): Row = pinot.sql(sql).collect().head

  test("HISTOGRAM(col, lower, upper, bins): equal width, last bin upper-inclusive") {
    val r = one("SELECT HISTOGRAM(m, 0, 10, 2) AS h FROM hx")
    // bins [0,5) and [5,10]: 2.0 left; 7,5,10,10 right
    assert(r.getSeq[Double](0) === Seq(1.0, 4.0))
  }

  test("HISTOGRAM(col, ARRAY[...]): explicit edges, out-of-range dropped") {
    val r = one("SELECT HISTOGRAM(m, ARRAY(2, 6, 8)) AS h FROM hx")
    // [2,6): 2,5 → 2; [6,8]: 7 → 1; the two 10s fall outside and are dropped
    assert(r.getSeq[Double](0) === Seq(2.0, 1.0))
  }

  test("ARG_MIN / ARG_MAX return the projection at the measuring extremum") {
    val r = one(
      "SELECT ARG_MIN(m, tag) AS lo, ARG_MAX(m, k) AS hi FROM hx")
    assert(r.getString(0) === "a") // tag at min(m)=2.0
    // max(m)=10.0 is tied between k=4 and k=5 — either is a valid witness
    assert(Set(4, 5).contains(r.getInt(1)))
  }

  test("typed array set-op aliases resolve") {
    val r = one(
      """SELECT ARRAYUNIONINT(ARRAY(1, 2), ARRAY(2, 3)) AS u,
        |       ARRAYREMOVESTRING(ARRAY('a', 'b', 'a'), 'a') AS rm""".stripMargin)
    assert(r.getSeq[Int](0).sorted === Seq(1, 2, 3))
    assert(r.getSeq[String](1) === Seq("b"))
  }

  test("typed-suffix array aliases (round 9): concat/reverse/sort/distinct/slice/sum/elementAt") {
    val r = one(
      """SELECT arrayConcatInt(ARRAY(1, 2), ARRAY(3)) AS c,
        |       arrayConcatString(ARRAY('a'), ARRAY('b')) AS cs,
        |       arrayReverseInt(ARRAY(1, 2, 3)) AS rv,
        |       arraySortString(ARRAY('b', 'a')) AS st,
        |       arrayDistinctInt(ARRAY(1, 1, 2)) AS di,
        |       arraySliceInt(ARRAY(10, 20, 30, 40), 1, 3) AS sl,
        |       arraySumInt(ARRAY(1, 2, 3)) AS su,
        |       arrayElementAtLong(ARRAY(CAST(7 AS LONG), CAST(8 AS LONG)), 2) AS el""".stripMargin)
    assert(r.getSeq[Int](0) === Seq(1, 2, 3))
    assert(r.getSeq[String](1) === Seq("a", "b"))
    assert(r.getSeq[Int](2) === Seq(3, 2, 1))
    assert(r.getSeq[String](3) === Seq("a", "b"))
    assert(r.getSeq[Int](4) === Seq(1, 2))
    // Pinot arraySlice is 0-based [from, to) — delegates to Java subList
    assert(r.getSeq[Int](5) === Seq(20, 30))
    assert(r.getDouble(6) === 6.0)
    assert(r.getLong(7) === 8L) // 1-based, the arrayElementAt* convention
  }

  test("round-9 timestampAdd/timestampDiff: UTC calendar arithmetic, clamping, native spellings intact") {
    def ms(s: String) = java.time.Instant.parse(s).toEpochMilli
    // the broker spelling goes through rewriteBroker (Spark's parser owns
    // these names and rejects quoted units — endpoint applies the same)
    def one(sql: String): Row =
      pinot.sql(PinotFunctions.rewriteBroker(sql)).collect().head
    val r = one(
      s"""SELECT
         |  timestampAdd('MONTH', 1, CAST(${ms("2024-01-31T10:00:00Z")} AS LONG)) AS clamp,
         |  dateAdd('HOUR', 3, CAST(${ms("2024-06-01T22:30:00Z")} AS LONG)) AS addh,
         |  timestampDiff('MONTH', CAST(${ms("2024-01-31T00:00:00Z")} AS LONG),
         |                         CAST(${ms("2024-02-29T00:00:00Z")} AS LONG)) AS m1,
         |  timestampDiff('MONTH', CAST(${ms("2024-01-31T00:00:00Z")} AS LONG),
         |                         CAST(${ms("2024-02-28T00:00:00Z")} AS LONG)) AS m0,
         |  dateDiff('SECOND', CAST(${ms("2024-01-01T00:00:00Z")} AS LONG),
         |                     CAST(${ms("2024-01-01T00:00:01.500Z")} AS LONG)) AS s1,
         |  timestampDiff('QUARTER', CAST(${ms("2024-12-01T00:00:00Z")} AS LONG),
         |                           CAST(${ms("2024-01-01T00:00:00Z")} AS LONG)) AS qneg,
         |  timestampAdd('DAY', 5, TIMESTAMP '2024-01-01 00:00:00') AS tsadd,
         |  timestampadd(DAY, 2, TIMESTAMP '2024-01-01 00:00:00') AS nativeadd,
         |  datediff(DATE '2024-01-10', DATE '2024-01-01') AS native2""".stripMargin)
    assert(r.getLong(0) === ms("2024-02-29T10:00:00Z"), "end-of-month clamp on leap Feb")
    assert(r.getLong(1) === ms("2024-06-02T01:30:00Z"))
    assert(r.getLong(2) === 1L, "Jan 31 -> Feb 29 is one FULL month (clamped add lands exactly)")
    assert(r.getLong(3) === 0L, "Jan 31 -> Feb 28 is zero full months, not a boundary count")
    assert(r.getLong(4) === 1L, "fractional seconds truncate")
    assert(r.getLong(5) === -3L, "negative diffs truncate toward zero")
    assert(r.getTimestamp(6).toInstant === java.time.Instant.parse("2024-01-06T00:00:00Z"))
    assert(r.getTimestamp(7).toInstant === java.time.Instant.parse("2024-01-03T00:00:00Z"),
      "Spark's identifier-unit timestampadd must still parse (special grammar, not the registry)")
    assert(r.getInt(8) === 9, "Spark's 2-arg datediff must survive the 3-arg registration")
    // string-DATE args are NOT units: the rewriter must leave this native
    // Spark spelling alone (implicit string->date cast, answer in days)
    val sd = one("SELECT datediff('2024-01-10', '2024-01-01') AS d")
    assert(sd.getInt(0) === 9)
    intercept[Exception](one("SELECT timestampAdd('FORTNIGHT', 1, CAST(0 AS LONG)) AS bad"))
  }

  test("EXPRMIN/EXPRMAX legacy spellings and REGEXPREPLACE resolve") {
    val r = one(
      """SELECT EXPRMIN(m, tag) AS lo, EXPRMAX(m, k) AS hi,
        |       min(REGEXPREPLACE('a1b2c3', '[0-9]', '_')) AS rr
        |FROM hx""".stripMargin)
    assert(r.getString(0) === "a")
    assert(Set(4, 5).contains(r.getInt(1)))
    assert(r.getString(2) === "a_b_c_")
    intercept[Exception](one("SELECT REGEXPREPLACE('x', 'x', 'y', 1, 2) AS bad"))
  }

  test("the Pinot registry has no duplicate names (createOrReplace is last-wins and silent)") {
    val names = PinotFunctions.registry.map(_._1)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate registry entries: ${dups.mkString(",")}")
    assert(names.size >= 139) // the round-5 vocabulary floor
  }

  test("underscore spellings resolve (Pinot canonicalizes names underscore-insensitively)") {
    val s = spark.newSession()
    PinotFunctions.register(s)
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (2L, "a")).toDF("v", "tag")
      .createOrReplaceTempView("ux")
    val r = s.sql(
      """SELECT DISTINCT_COUNT(v) AS dc,
        |       DISTINCT_COUNT_HLL(v) AS hll,
        |       DISTINCT_COUNT_THETA_SKETCH(v) AS theta,
        |       PERCENTILE_EST(v, 50) AS p50,
        |       MIN_MAX_RANGE(v) AS mmr,
        |       FIRST_WITH_TIME(tag, v, 'STRING') AS fwt,
        |       SUM_PRECISION(v) AS sp,
        |       FUNNEL_MAX_STEP(v, 0, 1, tag = 'a') AS fms
        |FROM ux""".stripMargin).collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getString(5) === "a")
  }

  test("jsonPath* scalar family: typed extraction with Pinot sentinel defaults") {
    val r = one(
      """SELECT JSONPATHSTRING('{"a": {"b": "x"}}', '$.a.b') AS s,
        |       JSONPATHLONG('{"n": 7}', '$.n') AS n,
        |       JSONPATHLONG('{"n": 7}', '$.missing') AS n_missing,
        |       JSONPATHLONG('{"n": 7}', '$.missing', 42) AS n_dflt,
        |       JSONPATHDOUBLE('{"d": 2.5}', '$.d') AS d,
        |       JSONPATHDOUBLE('{"d": 2.5}', '$.missing') AS d_missing""".stripMargin)
    assert(r.getString(0) === "x")
    assert(r.getLong(1) === 7L)
    assert(r.getLong(2) === Long.MinValue) // Pinot sentinel when absent
    assert(r.getLong(3) === 42L)
    assert(r.getDouble(4) === 2.5)
    assert(r.getDouble(5).isNegInfinity)
  }

  test("jsonPath* numeric forms fall to the default on non-numeric nodes (TRY cast under ANSI)") {
    // Pinot's jsonPathLong answers the default when the node exists but is
    // not numeric; a plain ANSI Cast would THROW and Coalesce can't catch it
    val r = one(
      """SELECT JSONPATHLONG('{"n": "abc"}', '$.n', 42) AS bad_str,
        |       JSONPATHLONG('{"n": {"x": 1}}', '$.n') AS bad_obj,
        |       JSONPATHDOUBLE('{"d": "zzz"}', '$.d', 1.5) AS bad_dbl""".stripMargin)
    assert(r.getLong(0) === 42L)
    assert(r.getLong(1) === Long.MinValue)
    assert(r.getDouble(2) === 1.5)
  }

  test("FREQUENTLONGSSKETCH rides the frequent-items kernel over decimal strings") {
    val raw = one("SELECT FREQUENTLONGSSKETCH(k) AS s FROM hx").getAs[Array[Byte]](0)
    val sk = graft.expressions.FreqOps.wrap(raw)
    assert(sk.getEstimate("3") === 1L) // k = 1..5, each once
    assert(sk.getEstimate("99") === 0L)
  }

  test("PERCENTILERAWTDIGEST bytes feed back through PERCENTILEKLL's scalar path") {
    // raw form returns our mergeable quantile-sketch binary; estimating a
    // quantile from it must agree with the direct PERCENTILEKLL call
    val direct = one("SELECT PERCENTILEKLL(m, 50) AS p FROM hx").getDouble(0)
    val raw = one("SELECT PERCENTILERAWTDIGEST(m) AS s FROM hx").getAs[Array[Byte]](0)
    assert(raw.nonEmpty)
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val est = KllDoublesSketch.heapify(Memory.wrap(raw))
      .getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE)
    assert(est === direct)
  }

  test("round-8 aliases: PERCENTILERAWEST, SEGMENT_PARTITIONED_DISTINCT_COUNT, DISTINCTCOUNTBITMAPMV") {
    // RAWEST emits the same KLL interchange binary as the other raw forms
    val rawEst = one("SELECT PERCENTILERAWEST(m) AS s FROM hx").getAs[Array[Byte]](0)
    val rawKll = one("SELECT PERCENTILERAWKLL(m) AS s FROM hx").getAs[Array[Byte]](0)
    assert(rawEst.toSeq === rawKll.toSeq)
    // exact distinct under the function's own partitioning precondition
    assert(one("SELECT SEGMENTPARTITIONEDDISTINCTCOUNT(m) AS c FROM hx").getLong(0) === 4L)
    // exact MV distinct: bitmap = exact set in Pinot
    import pinot.implicits._
    Seq((1, Seq("x", "y")), (2, Seq("y", "z"))).toDF("k", "mv")
      .createOrReplaceTempView("mvx")
    assert(one("SELECT DISTINCTCOUNTBITMAPMV(mv) AS c FROM mvx").getLong(0) === 3L)
  }

  test("round-9 arithmetic verbs: ADD/SUB/MULT/DIV/MOD are DOUBLE ops; ROUNDDECIMAL; IFNOTFINITE") {
    val r = one(
      """SELECT ADD(1, 2) AS a, SUB(1, 2) AS s, MULT(3, 4) AS m,
        |       DIV(7, 2) AS d, MOD(7.5, 2) AS md,
        |       ROUNDDECIMAL(2.345, 2) AS rd, ROUNDDECIMAL(2.5) AS r0,
        |       IFNOTFINITE(LN(0.0), -1.0) AS inf, IFNOTFINITE(DIV(4, 2), -1.0) AS fin,
        |       LN(0.0) AS ln0, LOG10(-1.0) AS lneg, LN(EXP(1.0)) AS ln1
        |""".stripMargin + "FROM hx LIMIT 1")
    assert(r.getDouble(0) === 3.0 && r.getDouble(1) === -1.0 && r.getDouble(2) === 12.0)
    assert(r.getDouble(3) === 3.5, "Pinot div is FLOAT division")
    assert(r.getDouble(4) === 1.5)
    assert(r.getDouble(5) === 2.35 && r.getDouble(6) === 3.0)
    assert(r.getDouble(7) === -1.0 && r.getDouble(8) === 2.0)
    // Java Math.log edges (Spark natives answer NULL outside the domain)
    assert(r.getDouble(9) === Double.NegativeInfinity)
    assert(r.getDouble(10).isNaN)
    assert(r.getDouble(11) === 1.0)
  }

  test("round-9 STRRPOS: last indexOf, ordinal-from-end form (commons javadoc truths)") {
    val r = one(
      """SELECT STRRPOS('aabaabaa', 'aa') AS l1,
        |       STRRPOS('aabaabaa', 'aa', 2) AS l2,
        |       STRRPOS('aabaabaa', 'zz') AS miss FROM hx LIMIT 1""".stripMargin)
    assert(r.getInt(0) === 6 && r.getInt(1) === 3 && r.getInt(2) === -1)
  }

  test("round-9 JSONPATH / JSONPATHARRAY family") {
    val r = one(
      """SELECT JSONPATH('{"a":{"b":5}}', '$.a.b') AS p,
        |       JSONPATHARRAY('{"a":[1,2,3]}', '$.a') AS arr,
        |       JSONPATHARRAYDEFAULTEMPTY('{"a":1}', '$.missing') AS dflt
        |FROM hx LIMIT 1""".stripMargin)
    assert(r.getString(0) === "5")
    assert(r.getSeq[String](1) === Seq("1", "2", "3"))
    assert(r.getSeq[String](2) === Seq.empty)
  }

  test("round-9 TEXT_CONTAINS: single-term native-index predicate; multi-term fails loudly") {
    import pinot.implicits._
    Seq((1, "the quick brown fox"), (2, "lazy dog"), (3, "quicksilver"))
      .toDF("id", "txt").createOrReplaceTempView("tc")
    val hits = pinot.sql(
      "SELECT id FROM tc WHERE TEXT_CONTAINS(txt, 'quick')").collect().map(_.getInt(0))
    assert(hits.toSeq === Seq(1), "term match is word-boundary: quicksilver excluded")
    val err = intercept[Exception](
      pinot.sql("SELECT TEXT_CONTAINS(txt, 'quick fox') FROM tc").collect())
    assert(err.getMessage.contains("one term"))
  }

  test("round-9 ARRAYAGG typed forms + BOOLAND/BOOLOR camel spellings") {
    val r = one(
      """SELECT ARRAY_SORT(ARRAYAGG(k, 'INT')) AS ks,
        |       ARRAY_SORT(ARRAYAGG(m, 'DOUBLE', true)) AS dm,
        |       BOOLAND(k > 0) AS ba, BOOLOR(k > 5) AS bo FROM hx""".stripMargin)
    assert(r.getSeq[Int](0) === Seq(1, 2, 3, 4, 5))
    assert(r.getSeq[Double](1) === Seq(2.0, 5.0, 7.0, 10.0), "distinct form collapses the tied 10s")
    assert(r.getBoolean(2) === true && r.getBoolean(3) === false)
  }
}
