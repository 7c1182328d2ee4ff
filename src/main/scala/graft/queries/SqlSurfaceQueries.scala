package graft.queries

import graft.Q

/** SQL-endpoint surface depth (SURVEY.md §2.1 S11): queries issued as SQL
  * text through `spark.sql` — the engine's analogue of the reference's
  * `/query/sql` broker endpoint — exercising constructs users type directly:
  * CTEs, IN/EXISTS subqueries, scalar subqueries. The same text runs on the
  * DuckDB oracle (shared ANSI dialect).
  */
object SqlSurfaceQueries {

  /** CTE + join + aggregate (WITH clause through the SQL endpoint). */
  private val sqlCte = Q.sqlOnly(
    "q_sql_cte",
    """WITH cust_orders AS (
      |  SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT c_mktsegment,
      |       count(*) AS n_customers,
      |       CAST(sum(n_orders) AS BIGINT) AS total_orders,
      |       round(sum(spend), 2) AS total_spend
      |FROM customer JOIN cust_orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  /** Uncorrelated IN subquery (J3 via the SQL surface). */
  private val sqlInSubquery = Q.sqlOnly(
    "q_sql_in_subquery",
    """SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)

  /** Correlated EXISTS subquery. */
  private val sqlExistsSubquery = Q.sqlOnly(
    "q_sql_exists_subquery",
    """SELECT c_mktsegment, count(*) AS n_with_big_order
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)

  /** Scalar subquery in the projection (rewritten by Catalyst into a
    * broadcast of the single aggregated row). */
  private val sqlScalarSubquery = Q.sqlOnly(
    "q_sql_scalar_subquery",
    """SELECT o_orderkey,
      |       round(o_totalprice / (SELECT avg(o_totalprice) FROM orders), 6) AS price_ratio
      |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin)

  /** SQL PIVOT (round 8) — Spark's native PIVOT clause (count per pivoted
    * l_linestatus value, plus a 'X' column for a value ABSENT from the
    * data: Spark pivot yields NULL for empty cells, made deterministic
    * with coalesce both engines). The oracle is the CASE-aggregation
    * desugaring — the two spellings must be the same query. */
  private val sqlPivot = Q(
    "q_sql_pivot",
    (spark, dir) => {
      graft.sources.Tables.registerViews(spark, dir)
      spark.sql(
        """SELECT l_returnflag,
          |       coalesce(F, 0) AS n_f, coalesce(O, 0) AS n_o,
          |       coalesce(X, 0) AS n_x
          |FROM (
          |  SELECT * FROM (SELECT l_returnflag, l_linestatus FROM lineitem)
          |  PIVOT (count(*) FOR l_linestatus IN ('F' AS F, 'O' AS O, 'X' AS X))
          |)
          |ORDER BY l_returnflag""".stripMargin)
    },
    Some("""SELECT l_returnflag,
           |       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
           |       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o,
           |       CAST(count(CASE WHEN l_linestatus = 'X' THEN 1 END) AS BIGINT) AS n_x
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin))

  /** SQL UNPIVOT (round 9) — Spark's native UNPIVOT clause melting a wide
    * per-segment stats row into (metric, value) pairs; the oracle is the
    * stack/UNION-ALL desugaring (the two spellings must be the same
    * query). Values pre-cast to one type (UNPIVOT requires a common
    * value-column type). */
  private val sqlUnpivot = Q(
    "q_sql_unpivot",
    (spark, dir) => {
      graft.sources.Tables.registerViews(spark, dir)
      spark.sql(
        """SELECT c_mktsegment, metric, round(v, 2) AS v
          |FROM (
          |  SELECT c_mktsegment,
          |         CAST(count(*) AS DOUBLE) AS n_customers,
          |         CAST(round(avg(c_acctbal), 4) AS DOUBLE) AS avg_bal,
          |         CAST(max(c_acctbal) AS DOUBLE) AS max_bal
          |  FROM customer GROUP BY c_mktsegment
          |) UNPIVOT (v FOR metric IN (n_customers, avg_bal, max_bal))
          |ORDER BY c_mktsegment, metric""".stripMargin)
    },
    Some("""WITH wide AS (
           |  SELECT c_mktsegment,
           |         CAST(count(*) AS DOUBLE) AS n_customers,
           |         CAST(round(avg(c_acctbal), 4) AS DOUBLE) AS avg_bal,
           |         CAST(max(c_acctbal) AS DOUBLE) AS max_bal
           |  FROM customer GROUP BY c_mktsegment
           |), melted AS (
           |  SELECT c_mktsegment, 'n_customers' AS metric, n_customers AS v FROM wide
           |  UNION ALL
           |  SELECT c_mktsegment, 'avg_bal', avg_bal FROM wide
           |  UNION ALL
           |  SELECT c_mktsegment, 'max_bal', max_bal FROM wide
           |)
           |SELECT c_mktsegment, metric, round(v, 2) AS v
           |FROM melted ORDER BY c_mktsegment, metric""".stripMargin))

  /** SQL LATERAL subquery (round 9) — a correlated derived table per outer
    * row (the top-order-per-customer shape users write against the broker);
    * Catalyst decorrelates it into a join, which is the oracle's explicit
    * spelling. */
  private val sqlLateral = Q(
    "q_sql_lateral",
    (spark, dir) => {
      graft.sources.Tables.registerViews(spark, dir)
      spark.sql(
        """SELECT c.c_custkey, c.c_mktsegment, t.n_orders, t.best
          |FROM customer c,
          |LATERAL (
          |  SELECT count(*) AS n_orders,
          |         round(max(o_totalprice), 2) AS best
          |  FROM orders o WHERE o.o_custkey = c.c_custkey
          |) t
          |WHERE c.c_custkey <= 200 AND t.n_orders > 0
          |ORDER BY c.c_custkey""".stripMargin)
    },
    Some("""WITH agg AS (
           |  SELECT o_custkey, count(*) AS n_orders,
           |         round(max(o_totalprice), 2) AS best
           |  FROM orders GROUP BY o_custkey
           |)
           |SELECT c_custkey, c_mktsegment, n_orders, best
           |FROM customer JOIN agg ON o_custkey = c_custkey
           |WHERE c_custkey <= 200 AND n_orders > 0
           |ORDER BY c_custkey""".stripMargin))

  val all: Seq[Q] = Seq(sqlUnpivot, sqlLateral, sqlCte, sqlInSubquery, sqlExistsSubquery, sqlScalarSubquery,
    sqlPivot)
}
