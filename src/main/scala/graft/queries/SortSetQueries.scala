package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Sort / limit / top-k (SURVEY.md §2.6 O1–O4) and set operations (§2.7
  * U1–U3).
  *
  * Scale posture: `ORDER BY ... LIMIT k` plans as TakeOrderedAndProject —
  * per-partition top-k then a driver merge of k-sized lists, which is the
  * reference broker's "merge per-server top lists" (`README.md:22`). A global
  * ORDER BY without LIMIT (range-partitioned sort) appears only inside
  * declared outputs, which are small aggregates.
  */
object SortSetQueries {

  /** O1+O4: top-k by aggregate with unique tiebreak (server-side top-k shape). */
  private val topkRevenue = Q(
    "q_topk_revenue",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      li.groupBy(col("l_partkey"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_partkey").asc)
        .limit(10)
    },
    Some("""SELECT l_partkey, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
            FROM lineitem GROUP BY l_partkey
            ORDER BY revenue DESC, l_partkey ASC LIMIT 10"""))

  /** O1: multi-column mixed-direction sort. */
  private val sortMulti = Q(
    "q_sort_multi",
    (spark, dir) => {
      val s = Tables.t(spark, dir, "supplier")
      s.select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .orderBy(col("s_nationkey").asc, col("s_acctbal").desc, col("s_suppkey").asc)
    },
    Some("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
            ORDER BY s_nationkey ASC, s_acctbal DESC, s_suppkey ASC"""))

  /** O1: explicit NULLS FIRST/LAST ordering over synthesized nulls. */
  private val sortNulls = Q(
    "q_sort_nulls",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      o.withColumn("maybe_status", nullif(col("o_orderstatus"), lit("F")))
        .select(col("o_orderkey"), col("maybe_status"))
        .orderBy(col("maybe_status").desc_nulls_last, col("o_orderkey").asc)
        .limit(100)
    },
    Some("""SELECT o_orderkey, nullif(o_orderstatus, 'F') AS maybe_status
            FROM orders
            ORDER BY maybe_status DESC NULLS LAST, o_orderkey ASC LIMIT 100"""))

  /** O3: LIMIT + OFFSET pagination. */
  private val limitOffset = Q(
    "q_limit_offset",
    (spark, dir) => {
      val c = Tables.t(spark, dir, "customer")
      c.select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .offset(20)
        .limit(10)
    },
    Some("""SELECT c_custkey, c_name FROM customer
            ORDER BY c_custkey LIMIT 10 OFFSET 20"""))

  /** U1: UNION ALL then re-aggregate. */
  private val unionAll = Q(
    "q_union_all",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 150000)
        .select(col("o_custkey"), lit("high").as("bucket"))
      val lo = o.filter(col("o_totalprice") < 20000)
        .select(col("o_custkey"), lit("low").as("bucket"))
      hi.unionAll(lo)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), countDistinct(col("o_custkey")).as("n_cust"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT bucket, count(*) AS n, count(DISTINCT o_custkey) AS n_cust FROM (
              SELECT o_custkey, 'high' AS bucket FROM orders WHERE o_totalprice > 150000
              UNION ALL
              SELECT o_custkey, 'low' AS bucket FROM orders WHERE o_totalprice < 20000
            ) GROUP BY bucket ORDER BY bucket"""))

  /** U1: UNION (distinct). */
  private val unionDistinct = Q(
    "q_union_distinct",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_totalprice") > 100000).select(col("o_custkey"))
      a.union(b).distinct().orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            UNION
            SELECT o_custkey FROM orders WHERE o_totalprice > 100000
            ORDER BY o_custkey"""))

  /** U2: INTERSECT. */
  private val intersectQ = Q(
    "q_intersect",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      a.intersect(b).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            ORDER BY o_custkey"""))

  /** U3: EXCEPT. */
  private val exceptQ = Q(
    "q_except",
    (spark, dir) => {
      val c = Tables.t(spark, dir, "customer")
      val o = Tables.t(spark, dir, "orders")
      c.select(col("c_custkey")).except(o.select(col("o_custkey")))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey FROM customer
            EXCEPT
            SELECT o_custkey FROM orders
            ORDER BY c_custkey"""))

  /** U2b/U3b (round 9): the bag-semantics set operations — INTERSECT ALL
    * keeps min(m, n) copies per value, EXCEPT ALL keeps m − n. The probe
    * column (orderpriority) repeats across orders, so multiplicities are
    * non-trivial; aggregated per value to keep the output canonical and
    * the multiplicity arithmetic visible. */
  private val setAll = Q(
    "q_set_all",
    (spark, dir) => {
      val o = Tables.t(spark, dir, "orders")
      val a = o.filter(col("o_orderstatus") === "O").select(col("o_orderpriority"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority"))
      val ia = a.intersectAll(b).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_intersect_all"))
      val ea = a.exceptAll(b).groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_except_all"))
      ia.join(ea, Seq("o_orderpriority"), "full")
        .select(col("o_orderpriority"),
          coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
          coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""WITH a AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'),
           |b AS (SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'),
           |ia AS (
           |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_intersect_all
           |  FROM (SELECT o_orderpriority FROM a INTERSECT ALL SELECT o_orderpriority FROM b)
           |  GROUP BY o_orderpriority),
           |ea AS (
           |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_except_all
           |  FROM (SELECT o_orderpriority FROM a EXCEPT ALL SELECT o_orderpriority FROM b)
           |  GROUP BY o_orderpriority)
           |SELECT coalesce(ia.o_orderpriority, ea.o_orderpriority) AS o_orderpriority,
           |       coalesce(ia.n_intersect_all, 0) AS n_intersect_all,
           |       coalesce(ea.n_except_all, 0) AS n_except_all
           |FROM ia FULL JOIN ea ON ia.o_orderpriority = ea.o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  val all: Seq[Q] = Seq(
    topkRevenue, sortMulti, sortNulls, limitOffset,
    unionAll, unionDistinct, intersectQ, exceptQ, setAll)
}
