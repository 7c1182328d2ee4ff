package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations (SURVEY.md §2.4 A5/A7): Pinot's
  * DISTINCTCOUNTHLL / PERCENTILEEST / PERCENTILETDIGEST surface, mapped to
  * Spark's HyperLogLog++ and approximate-percentile sketches.
  *
  * Declared without SQL oracles (sketch outputs are engine-specific —
  * SURVEY.md §7.4.1); the accuracy contract vs exact values is asserted in
  * SketchSpec instead. Both are mergeable-sketch aggregations: partial
  * sketches merge across partitions, so the shuffle carries one sketch per
  * group, not the data — the 100 TB form of COUNT DISTINCT / percentile.
  */
object SketchQueries {

  /** A5: DISTINCTCOUNTHLL — HLL++ approximate distinct users/parts, with the
    * exact value alongside (small-SF sanity visible in the output). */
  private val sketchHll = Q(
    "q_sketch_hll",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"))
        .orderBy(col("l_returnflag"))
    },
    None,
    doc = "HLL++ approximate distinct (A5); accuracy asserted in SketchSpec")

  /** A7: PERCENTILEEST/TDIGEST — approximate percentiles with bounded error,
    * exact interpolated values alongside. */
  private val sketchPercentile = Q(
    "q_sketch_percentile",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
          round(percentile(col("l_extendedprice"), lit(0.5)), 2).as("p50_exact"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("p99_approx"))
        .orderBy(col("l_returnflag"))
    },
    None,
    doc = "approximate percentile sketch (A7); accuracy asserted in SketchSpec")

  /** Heavy hitters (Pinot FREQUENTSTRINGSSKETCH analog): DataSketches
    * frequent-items via Spark's `approx_top_k`. Mergeable sketch — the
    * shuffle carries one bounded sketch per partition at any scale. Unlike
    * HLL/percentile this IS oracle-checkable here: with far fewer distinct
    * items than the sketch's tracked capacity the counts are exact, so the
    * DuckDB exact top-k matches value-for-value (the accuracy property that
    * makes frequent-items sketches safe for low-cardinality columns). */
  private val sketchTopK = Q(
    "q_sketch_topk",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "events")
      // ask the sketch for MORE than the emitted k (10 ≥ the column's
      // cardinality): approx_top_k's pick among equal counts at the k-th
      // boundary is unspecified, so the deterministic (cnt desc, item)
      // cut happens here, not inside the sketch
      e.agg(expr("approx_top_k(event_type, 10)").as("tk"))
        .select(explode(col("tk")).as("x"))
        .select(col("x.item").as("item"), col("x.count").as("cnt"))
        .orderBy(col("cnt").desc, col("item").asc)
        .limit(3)
    },
    Some("""SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
            |FROM events GROUP BY event_type
            |ORDER BY cnt DESC, item ASC LIMIT 3""".stripMargin))

  val all: Seq[Q] = Seq(sketchHll, sketchPercentile, sketchTopK)
}
