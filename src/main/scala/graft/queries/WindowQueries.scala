package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.5 W1–W5) — Pinot 1.2.0 multistage
  * window support, re-expressed as Spark `Window` specs.
  *
  * Scale posture: every window partitions by a key (never an empty
  * partitionBy over the whole table, which would single-task; the one global
  * ntile demo is capped by a pre-limit). One shuffle per distinct
  * partitioning; consecutive windows share the same spec to reuse it.
  */
object WindowQueries {

  /** W1: ROW_NUMBER top-N per group (top 3 orders per segment by price). */
  private val winTopN = Q(
    "q_win_topn",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      val joined = orders.join(cust, orders("o_custkey") === cust("c_custkey"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      joined
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_mktsegment"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_mktsegment"), col("rn"))
    },
    Some("""SELECT c_mktsegment, rn, o_orderkey, o_totalprice FROM (
              SELECT c_mktsegment, o_orderkey, o_totalprice,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
              FROM orders JOIN customer ON o_custkey = c_custkey
            ) WHERE rn <= 3 ORDER BY c_mktsegment, rn"""))

  /** W1: RANK / DENSE_RANK (ties on the bucketed price make them diverge). */
  private val winRank = Q(
    "q_win_rank",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(floor(col("o_totalprice") / 10000.0).asc, col("o_orderkey").asc)
      orders
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("rnk") <= 5)
        .select(col("o_orderpriority"), col("o_orderkey"), col("rnk"), col("drnk"))
        .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
    },
    Some("""SELECT o_orderpriority, o_orderkey, rnk, drnk FROM (
              SELECT o_orderpriority, o_orderkey,
                     rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY floor(o_totalprice / 10000.0) ASC, o_orderkey ASC) AS rnk,
                     dense_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY floor(o_totalprice / 10000.0) ASC, o_orderkey ASC) AS drnk
              FROM orders
            ) WHERE rnk <= 5 ORDER BY o_orderpriority, rnk, o_orderkey"""))

  /** W2+W5: running aggregates over ROWS UNBOUNDED PRECEDING..CURRENT ROW. */
  private val winRunning = Q(
    "q_win_running",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders
        .filter(col("o_custkey") <= 50)
        .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 2))
        .withColumn("running_n", count(lit(1)).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("running_spend"), col("running_n"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
                   count(*) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
            FROM orders WHERE o_custkey <= 50
            ORDER BY o_custkey, o_orderkey"""))

  /** W3: LEAD / LAG. */
  private val winLeadLag = Q(
    "q_win_leadlag",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders
        .filter(col("o_custkey") <= 50)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("delta", round(col("o_totalprice") - col("prev_price"), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("prev_price"), col("next_price"), col("delta"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
                   lag(o_totalprice, 1) OVER w AS prev_price,
                   lead(o_totalprice, 1) OVER w AS next_price,
                   round(o_totalprice - lag(o_totalprice, 1) OVER w, 2) AS delta
            FROM orders WHERE o_custkey <= 50
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
            ORDER BY o_custkey, o_orderkey"""))

  /** W3 superset (round 6): LAG / LAST_VALUE with IGNORE NULLS — the
    * carry-forward-over-gaps form (sparse sensor/metric streams). Nulls are
    * planted deterministically (every 7th order by key); both engines use
    * the explicit running frame so last_value sees only preceding rows. */
  private val winIgnoreNulls = Q(
    "q_win_ignore_nulls",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders
        .filter(col("o_custkey") <= 50)
        .withColumn("v",
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
            .otherwise(col("o_totalprice")))
        .withColumn("prev_v", lag(col("v"), 1, null, ignoreNulls = true).over(w))
        .withColumn("carry", last(col("v"), ignoreNulls = true).over(wRun))
        .select(col("o_custkey"), col("o_orderkey"), col("v"),
          col("prev_v"), col("carry"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, v,
                   lag(v, 1 IGNORE NULLS) OVER w AS prev_v,
                   last_value(v IGNORE NULLS) OVER
                     (PARTITION BY o_custkey ORDER BY o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carry
            FROM (SELECT o_custkey, o_orderkey,
                    CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END AS v
                  FROM orders WHERE o_custkey <= 50)
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
            ORDER BY o_custkey, o_orderkey"""))

  /** W4+W5: FIRST_VALUE / LAST_VALUE with an explicit full-partition frame
    * (the default frame would make LAST_VALUE = current row). */
  private val winFirstLast = Q(
    "q_win_firstlast",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders
        .filter(col("o_custkey") <= 50)
        .withColumn("first_key", first(col("o_orderkey")).over(w))
        .withColumn("last_key", last(col("o_orderkey")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("first_key"), col("last_key"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
                   first_value(o_orderkey) OVER w AS first_key,
                   last_value(o_orderkey) OVER w AS last_key
            FROM orders WHERE o_custkey <= 50
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            ORDER BY o_custkey, o_orderkey"""))

  /** W5: RANGE frame over a numeric ordering (value-distance window). */
  private val winRange = Q(
    "q_win_range",
    (spark, dir) => {
      val orders = Tables.t(spark, dir, "orders")
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-10000L, 0L)
      orders
        .filter(col("o_orderkey") <= 500)
        .withColumn("n_within_10k_below", count(lit(1)).over(w))
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("n_within_10k_below"))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    },
    Some("""SELECT o_orderpriority, o_orderkey, o_totalprice,
                   count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                                  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_within_10k_below
            FROM orders WHERE o_orderkey <= 500
            ORDER BY o_orderpriority, o_orderkey"""))

  /** Spark-superset: NTILE quartiles (deterministic: total order has a unique
    * tiebreak). */
  private val winNtile = Q(
    "q_win_ntile",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      cust
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("n"), round(avg(col("c_acctbal")), 2).as("avg_bal"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    },
    Some("""SELECT c_mktsegment, quartile, count(*) AS n, round(avg(c_acctbal), 2) AS avg_bal
            FROM (
              SELECT c_mktsegment, c_acctbal,
                     ntile(4) OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
              FROM customer
            ) GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile"""))

  /** W1 distribution ranks: percent_rank + cume_dist side by side (both
    * deterministic given the total order; doubles rounded to a fixed grid
    * since k/n ratios are exact in both engines). */
  private val winDist = Q(
    "q_win_dist",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      cust
        .withColumn("pr", round(percent_rank().over(w), 6))
        .withColumn("cd", round(cume_dist().over(w), 6))
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"), col("c_mktsegment"), col("pr"), col("cd"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment, pr, cd FROM (
            |  SELECT c_custkey, c_mktsegment,
            |         round(percent_rank() OVER (PARTITION BY c_mktsegment
            |               ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS pr,
            |         round(cume_dist() OVER (PARTITION BY c_mktsegment
            |               ORDER BY c_acctbal DESC, c_custkey ASC), 6) AS cd
            |  FROM customer
            |) WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin))

  /** NTH_VALUE over an explicit full-partition frame (both engines default
    * NTH_VALUE to the running frame, which is order-prefix-dependent; the
    * full frame is the deterministic, Pinot-multistage-compatible form). */
  private val winNth = Q(
    "q_win_nth",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      cust
        .withColumn("second_bal", round(nth_value(col("c_acctbal"), 2).over(w), 2))
        .withColumn("third_key", nth_value(col("c_custkey"), 3).over(w))
        .filter(col("c_custkey") <= 100)
        .select(col("c_custkey"), col("c_mktsegment"), col("second_bal"), col("third_key"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_mktsegment, second_bal, third_key FROM (
            |  SELECT c_custkey, c_mktsegment,
            |         round(nth_value(c_acctbal, 2) OVER (PARTITION BY c_mktsegment
            |               ORDER BY c_acctbal DESC, c_custkey ASC
            |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS second_bal,
            |         nth_value(c_custkey, 3) OVER (PARTITION BY c_mktsegment
            |               ORDER BY c_acctbal DESC, c_custkey ASC
            |               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS third_key
            |  FROM customer
            |) WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin))

  val all: Seq[Q] = Seq(
    winTopN, winRank, winRunning, winLeadLag, winIgnoreNulls, winFirstLast,
    winRange, winNtile, winDist, winNth)
}
