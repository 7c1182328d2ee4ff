package graft

/** Smoke + shape checks for every declared query at sf0.001. The value-level
  * gate is the driver's DuckDB oracle (tools/check_oracle.py locally); these
  * assert each query runs, returns rows, and exposes stable column names. */
class QueriesSpec extends GraftSuite {

  // queries whose correct result can legitimately be empty at tiny SF
  private val mayBeEmpty = Set("q_join_anti", "q_except", "q_intersect")

  Registry.all.foreach { q =>
    test(s"${q.name} runs and returns rows") {
      val df = q.run(spark, sfDir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned 0 rows")
      assert(df.columns.nonEmpty)
      assert(df.columns.distinct.length === df.columns.length, "duplicate column names")
    }
  }

  test("entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
