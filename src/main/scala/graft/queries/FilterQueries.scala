package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Predicate / projection surface (SURVEY.md §2.2 F1–F7).
  *
  * Every predicate here is a plain Catalyst filter, so it pushes down to the
  * parquet scan (PushedFilters) — the Spark analogue of Pinot's
  * filter-on-columnar-segment execution. Null-handling note (F6): Pinot's
  * default substitutes type defaults for missing values; we use ANSI SQL
  * nulls (documented divergence, SURVEY.md §2.2).
  */
object FilterQueries {

  /** F1+F2+F3+F5: comparisons, BETWEEN, IN, boolean logic — all pushed to the
    * scan. */
  private val filterPredicates = Q(
    "q_filter_predicates",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      li.filter(
          col("l_quantity").between(10, 30) &&
          col("l_returnflag").isin("A", "R") &&
          (col("l_discount") > 0.02 || col("l_tax") <= 0.04) &&
          !(col("l_linestatus") === "X"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("sum_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem
            WHERE l_quantity BETWEEN 10 AND 30
              AND l_returnflag IN ('A', 'R')
              AND (l_discount > 0.02 OR l_tax <= 0.04)
              AND NOT (l_linestatus = 'X')
            GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** F4: LIKE wildcards and REGEXP_LIKE. */
  private val filterLike = Q(
    "q_filter_like",
    (spark, dir) => {
      val part = Tables.t(spark, dir, "part")
      part
        .withColumn("has_vowel_start", col("p_name").rlike("^[aeiou]"))
        .groupBy(col("p_brand"))
        .agg(
          count(when(col("p_name").like("%a%"), lit(1))).as("n_with_a"),
          count(when(col("p_type").like("S%"), lit(1))).as("n_type_s"),
          count(when(col("has_vowel_start"), lit(1))).as("n_vowel_start"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
            count(*) FILTER (WHERE p_name LIKE '%a%') AS n_with_a,
            count(*) FILTER (WHERE p_type LIKE 'S%') AS n_type_s,
            count(*) FILTER (WHERE regexp_matches(p_name, '^[aeiou]')) AS n_vowel_start
            FROM part GROUP BY p_brand ORDER BY p_brand"""))

  /** F6+F7: IS NULL / COALESCE / NULLIF over synthesized nulls (fixtures have
    * none), ANSI semantics. */
  private val filterNulls = Q(
    "q_filter_nulls",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      o.withColumn("status_or_null", nullif(col("o_orderstatus"), lit("O")))
        .withColumn("coalesced", coalesce(col("status_or_null"), lit("OPEN")))
        .groupBy(col("coalesced"))
        .agg(
          count(lit(1)).as("n"),
          count(col("status_or_null")).as("n_not_null"),
          count(when(col("status_or_null").isNull, lit(1))).as("n_null"))
        .orderBy(col("coalesced"))
    },
    Some("""SELECT coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS coalesced,
            count(*) AS n,
            count(nullif(o_orderstatus, 'O')) AS n_not_null,
            count(*) FILTER (WHERE nullif(o_orderstatus, 'O') IS NULL) AS n_null
            FROM orders GROUP BY coalesced ORDER BY coalesced"""))

  /** F7: CASE WHEN ladders + CAST. */
  private val filterCase = Q(
    "q_filter_case",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      o.withColumn(
          "price_band",
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 150000, "mid")
            .otherwise("high"))
        .groupBy(col("price_band"))
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("double")), 2).as("sum_price"),
          min(col("o_orderkey").cast("string")).as("min_key_str"))
        .orderBy(col("price_band"))
    },
    Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                        WHEN o_totalprice < 150000 THEN 'mid'
                        ELSE 'high' END AS price_band,
            count(*) AS n,
            round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS sum_price,
            min(CAST(o_orderkey AS VARCHAR)) AS min_key_str
            FROM orders GROUP BY price_band ORDER BY price_band"""))

  val all: Seq[Q] = Seq(filterPredicates, filterLike, filterNulls, filterCase)
}
