package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** J7 co-located join (SURVEY.md §2.3): bucketing both fact tables by the
  * join key lets the sort-merge join read bucket-aligned files with NO
  * shuffle exchange — the pre-partitioned-join optimization the reference
  * gets from Pinot's partitioned replica groups, and the layout SCALE.md
  * prescribes for the orders⋈lineitem join at 100 TB. */
class BucketedJoinSpec extends GraftSuite {

  test("bucketed tables join without a shuffle exchange") {
    // a session with broadcast disabled so the bucketed sort-merge path is
    // what gets planned (runtime confs are session-scoped; parent untouched)
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    // clean any leftover managed-table locations from prior runs
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        loc.listFiles().foreach(_.delete())
        loc.delete()
      }
    }
    val li = Tables.t(s2, sfDir, "lineitem")
    val o = Tables.t(s2, sfDir, "orders")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = s2.table("li_bucketed")
      .join(s2.table("o_bucketed").hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))

    joined.collect()
    // AQE wraps stages in QueryStageExec (opaque to collect), so assert on
    // the final-plan text: a sort-merge join over Bucketed: true scans, and
    // the ONLY exchange is the post-join one feeding the final aggregation
    val planStr = joined.queryExecution.executedPlan.toString
    val finalSection = planStr.split("== Initial Plan ==").head
    assert(finalSection.contains("SortMergeJoin"), s"expected SortMergeJoin in:\n$finalSection")
    assert("Bucketed: true".r.findAllIn(finalSection).size === 2,
      s"both scans must be bucketed:\n$finalSection")
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)".r
      .findAllMatchIn(finalSection).map(_.group(1)).toList
    assert(exchanges === List("o_orderstatus"),
      s"only the post-join agg may shuffle, got exchanges on: $exchanges")

    // and the result matches the plain (shuffling) join
    val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val bucketed = joined.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bucketed === plain)

    s2.sql("DROP TABLE IF EXISTS li_bucketed")
    s2.sql("DROP TABLE IF EXISTS o_bucketed")
  }
}
