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

  /** A5+: Pinot DISTINCT_COUNT_THETA_SKETCH set-operation surface
    * (SET_UNION / SET_INTERSECT / SET_DIFF over filtered sub-populations —
    * e.g. "distinct parts that ship in qty-1 orders AND in qty-2 orders").
    *
    * Spark-first mapping: per-predicate HyperLogLog++ sketches built in ONE
    * scan over the raw rows (mergeable partials — no per-key state, the
    * 100 TB sketch posture), union answered by a third conditioned sketch,
    * intersection by inclusion-exclusion |A∩B| = |A|+|B|−|A∪B| (the standard
    * HLL set-algebra; theta sketches do this natively, HLL compounds the
    * rsd, hence the wider bound below). Same hard-oracle shape as
    * q_sketch_hll: the hashed output carries the EXACT set-op counts (from a
    * per-key flag aggregation) plus deterministic within-bound booleans —
    * HLL register-merge is max(), commutative/associative, so the estimates
    * and booleans are stable under any partition merge order.
    *
    * Bound math at sf0.1: σ ≈ rsd·√(|A|²+|B|²+|U|²) ≈ 0.01·19k ≈ 190 ≈ 4.7%
    * of the exact 4019 intersection — 20% is a >4σ envelope; 5% on the
    * directly-sketched union is 5σ. */
  private val sketchTheta = Q(
    "q_sketch_theta",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      val inA = col("l_quantity") === 1
      val inB = col("l_quantity") === 2
      // exact side: one per-key shuffle carrying two int flags
      val exact = li.groupBy(col("l_partkey"))
        .agg(
          max(when(inA, 1).otherwise(0)).as("a"),
          max(when(inB, 1).otherwise(0)).as("b"))
        .agg(
          sum(col("a")).cast("long").as("exact_q1"),
          sum(col("b")).cast("long").as("exact_q2"),
          sum(col("a") * col("b")).cast("long").as("exact_both"),
          sum(when(col("a") === 1 || col("b") === 1, 1).otherwise(0)).cast("long").as("exact_either"),
          sum(when(col("a") === 1 && col("b") === 0, 1).otherwise(0)).cast("long").as("exact_q1_only"))
      // sketch side: map-side mergeable HLLs over raw rows, no keyed state
      val approx = li.agg(
        approx_count_distinct(when(inA, col("l_partkey")), rsd = 0.01).as("ha"),
        approx_count_distinct(when(inB, col("l_partkey")), rsd = 0.01).as("hb"),
        approx_count_distinct(when(inA || inB, col("l_partkey")), rsd = 0.01).as("hu"))
      val estBoth = col("ha").cast("double") + col("hb").cast("double") - col("hu").cast("double")
      exact.crossJoin(approx).select(
        col("exact_q1"), col("exact_q2"), col("exact_both"),
        col("exact_either"), col("exact_q1_only"),
        (abs(col("hu").cast("double") - col("exact_either").cast("double")) /
          col("exact_either").cast("double") <= 0.05).as("union_within_5pct"),
        (abs(estBoth - col("exact_both").cast("double")) /
          col("exact_both").cast("double") <= 0.20).as("intersect_within_20pct"))
    },
    Some("""WITH f AS (SELECT l_partkey,
            |  max(CASE WHEN l_quantity = 1 THEN 1 ELSE 0 END) AS a,
            |  max(CASE WHEN l_quantity = 2 THEN 1 ELSE 0 END) AS b
            |  FROM lineitem GROUP BY l_partkey)
            |SELECT CAST(sum(a) AS BIGINT) AS exact_q1,
            |       CAST(sum(b) AS BIGINT) AS exact_q2,
            |       CAST(sum(a*b) AS BIGINT) AS exact_both,
            |       CAST(sum(CASE WHEN a=1 OR b=1 THEN 1 ELSE 0 END) AS BIGINT) AS exact_either,
            |       CAST(sum(CASE WHEN a=1 AND b=0 THEN 1 ELSE 0 END) AS BIGINT) AS exact_q1_only,
            |       TRUE AS union_within_5pct,
            |       TRUE AS intersect_within_20pct
            |FROM f""".stripMargin))

  /** Raw-sketch-column rollup (Pinot DISTINCTCOUNTRAWHLL + the star-tree
    * HLL-measure pattern): store ONE serialized DataSketches HLL per
    * (day, event_type) cell — the per-segment sketch column Pinot keeps —
    * then answer coarser windows by MERGING stored sketches
    * (`hll_union_agg`) instead of re-scanning raw rows. This is the 100 TB
    * rollup workflow: the daily table is ~|days|×|types| rows of ≤4 KB
    * sketches regardless of event volume, weekly/monthly/all-time distincts
    * come from sketch unions, and the merge is associative so partial
    * aggregation applies at every level.
    *
    * Hard-oracle shape as the rest of the family: exact weekly distincts
    * (from raw rows, for the gate) + a within-5% boolean on the
    * sketch-merged estimate (lgConfigK=12 → ~1.6% rse; merge order cannot
    * change the union, so the boolean is deterministic). */
  private val sketchRollup = Q(
    "q_sketch_rollup",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "events")
      // segment-level rollup: one mergeable sketch per (day, type) cell
      val daily = e.groupBy(
          date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      // query-time merge to weekly granularity — touches only rollup rows
      val weeklyEst = daily.groupBy(
          date_trunc("week", col("day")).as("week"), col("event_type"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val weeklyExact = e.groupBy(
          date_trunc("week", col("ts")).as("week"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
      weeklyExact.join(weeklyEst, Seq("week", "event_type"))
        .select(
          col("week"), col("event_type"), col("exact_users"),
          (abs(col("est").cast("double") - col("exact_users").cast("double")) /
            col("exact_users").cast("double") <= 0.05).as("within_5pct"))
        .orderBy(col("week"), col("event_type"))
    },
    Some("""SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week, event_type,
            |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
            |       TRUE AS within_5pct
            |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** A5+: DISTINCT_COUNT_SMART_HLL — Pinot's adaptive distinct: serve the
    * EXACT count while a group's cardinality is below the threshold, switch
    * to the HLL sketch above it (bounded memory for heavy groups, exactness
    * for the long tail). Same hard-oracle shape as q_sketch_hll: the exact
    * count and the deterministic switch decision are hashed; the sketch
    * estimate participates only through a within-bound boolean, so a
    * drifting estimate on a sketch-served group fails the gate. */
  private val sketchSmart = Q(
    "q_sketch_smart",
    (spark, dir) => {
      val ev = Tables.t(spark, dir, "events")
      val threshold = 50L
      ev.groupBy(col("event_type"))
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("ap"))
        .select(
          col("event_type"),
          col("exact_users"),
          (col("exact_users") > threshold).as("served_by_sketch"),
          (col("exact_users") <= threshold ||
            abs(col("ap").cast("double") - col("exact_users").cast("double")) /
              col("exact_users").cast("double") <= 0.05).as("within_5pct"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
            |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
            |       count(DISTINCT user_id) > 50 AS served_by_sketch,
            |       TRUE AS within_5pct
            |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  val all: Seq[Q] = Seq(sketchHll, sketchPercentile, sketchTopK, sketchTheta, sketchRollup,
    sketchSmart)
}
