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

  /** A5: DISTINCTCOUNTHLL — HLL++ approximate distinct parts/orders.
    *
    * Hard-oracle form (round-3 verdict item #2): the hashed output carries
    * the EXACT counts plus deterministic error-bound booleans; the raw HLL
    * estimates stay out of the output because they are engine-specific.
    * DuckDB computes the exact side and the literal TRUE bound, so the hash
    * matches while the Spark side still runs (and checks) the real sketch —
    * an estimate drifting past 5% (rsd is 2%) flips a boolean and fails the
    * gate. Tighter per-run accuracy is asserted in SketchSpec. */
  private val sketchHll = Q(
    "q_sketch_hll",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      val relErr = (approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =>
        abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")
      li.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"),
          approx_count_distinct(col("l_partkey"), rsd = 0.02).as("ap"),
          approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("ao"))
        .select(
          col("l_returnflag"),
          col("exact_parts"),
          col("exact_orders"),
          (relErr(col("ap"), col("exact_parts")) <= 0.05).as("parts_within_5pct"),
          (relErr(col("ao"), col("exact_orders")) <= 0.05).as("orders_within_5pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
            |       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
            |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
            |       TRUE AS parts_within_5pct,
            |       TRUE AS orders_within_5pct
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A7: PERCENTILEEST/TDIGEST — approximate percentiles with bounded error.
    *
    * Same hard-oracle shape as q_sketch_hll: exact interpolated percentiles
    * (Spark `percentile` ≡ DuckDB `quantile_cont`, both linear interpolation)
    * in the hashed output, sketch estimates folded into deterministic
    * within-bound booleans. accuracy=1000 gives ~0.1% rank error; 5% value
    * slack keeps the boolean stable under any partition merge order. */
  private val sketchPercentile = Q(
    "q_sketch_percentile",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      val relErr = (approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =>
        abs(approx.cast("double") - exact.cast("double")) / exact.cast("double")
      li.groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_extendedprice"), lit(0.5)).as("e50"),
          percentile(col("l_extendedprice"), lit(0.99)).as("e99"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("a50"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("a99"))
        .select(
          col("l_returnflag"),
          round(col("e50"), 2).as("p50_exact"),
          round(col("e99"), 2).as("p99_exact"),
          (relErr(col("a50"), col("e50")) <= 0.05).as("p50_within_5pct"),
          (relErr(col("a99"), col("e99")) <= 0.05).as("p99_within_5pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
            |       round(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 2) AS p50_exact,
            |       round(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 2) AS p99_exact,
            |       TRUE AS p50_within_5pct,
            |       TRUE AS p99_within_5pct
            |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

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
