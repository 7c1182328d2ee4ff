package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A declared engine query: the Spark-native implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle equivalent used by the
  * driver's correctness gate.
  *
  * Determinism contract (SURVEY.md §5.4): every query output is totally
  * ordered (unique tiebreak key) and floating aggregates are rounded, so the
  * driver's hash compare is stable across engines and thread counts.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Q {
  def sqlOnly(name: String, sql: String, doc: String = ""): Q = Q(
    name,
    (spark, dir) => {
      graft.sources.Tables.registerViews(spark, dir)
      spark.sql(sql)
    },
    Some(sql),
    doc)
}
