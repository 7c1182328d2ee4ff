package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Join surface (SURVEY.md §2.3 J1–J7) — the multistage-engine joins the
  * deployed Pinot 1.2.0 broker answers (version pin
  * `/root/reference/resources/bastion/bastionUserData.sh:7`).
  *
  * Scale posture: dimension tables (region/nation/supplier/part) are
  * broadcast — no shuffle of the fact side; fact-fact joins (orders⋈lineitem)
  * shuffle on the join key where AQE handles skew. At 100 TB the same plans
  * hold: broadcast thresholds cover dims, and the single fact shuffle is the
  * unavoidable minimum.
  */
object JoinQueries {

  /** J1: inner equi-join chain over broadcast dims (customers per region). */
  private val joinInner = Q(
    "q_join_inner",
    (spark, dir) => {
      val region = broadcast(Tables.t(spark, dir, "region"))
      val nation = broadcast(Tables.t(spark, dir, "nation"))
      val cust = Tables.t(spark, dir, "customer")
      cust
        .join(nation, cust("c_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_customers"), round(sum(col("c_acctbal")), 2).as("total_acctbal"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_acctbal
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** J2: LEFT OUTER — customers keep a row even with zero orders. */
  private val joinLeft = Q(
    "q_join_left",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      cust
        .join(orders, cust("c_custkey") === orders("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_customers"),
          count(col("o_orderkey")).as("n_orders"),
          countDistinct(when(col("o_orderkey").isNull, col("c_custkey"))).as("n_orderless"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment,
            count(DISTINCT c_custkey) AS n_customers,
            count(o_orderkey) AS n_orders,
            count(DISTINCT CASE WHEN o_orderkey IS NULL THEN c_custkey END) AS n_orderless
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J2: RIGHT OUTER (orders right-joined to customer ≡ every customer kept). */
  private val joinRight = Q(
    "q_join_right",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      orders
        .join(cust, orders("o_custkey") === cust("c_custkey"), "right")
        .groupBy(col("c_nationkey"))
        .agg(count(col("o_orderkey")).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, count(o_orderkey) AS n_orders, round(sum(o_totalprice), 2) AS total
            FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey"""))

  /** J2: FULL OUTER — nations vs supplier presence (some nations have no
    * supplier at small SF, exercising the null-extension on both sides). */
  private val joinFull = Q(
    "q_join_full",
    (spark, dir) => {
      val nation = Tables.t(spark, dir, "nation")
      val supp = Tables.t(spark, dir, "supplier")
      nation
        .join(supp, nation("n_nationkey") === supp("s_nationkey"), "full")
        .groupBy(col("n_name"))
        .agg(count(col("s_suppkey")).as("n_suppliers"))
        .orderBy(col("n_name").asc_nulls_first)
    },
    Some("""SELECT n_name, count(s_suppkey) AS n_suppliers
            FROM nation FULL JOIN supplier ON n_nationkey = s_nationkey
            GROUP BY n_name ORDER BY n_name ASC NULLS FIRST"""))

  /** J3: LEFT SEMI ≡ EXISTS subquery. */
  private val joinSemi = Q(
    "q_join_semi",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      cust
        .join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_with_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_with_orders
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J3: LEFT ANTI ≡ NOT EXISTS subquery. */
  private val joinAnti = Q(
    "q_join_anti",
    (spark, dir) => {
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      cust
        .join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_without_orders"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_without_orders
            FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J4: CROSS join (tiny dims only — a cartesian of two fact tables would
    * never survive scale-up and is intentionally not in the surface). */
  private val joinCross = Q(
    "q_join_cross",
    (spark, dir) => {
      val region = Tables.t(spark, dir, "region")
      val status = Tables.t(spark, dir, "orders").select(col("o_orderstatus")).distinct()
      region
        .crossJoin(status)
        .select(col("r_name"), col("o_orderstatus"))
        .orderBy(col("r_name"), col("o_orderstatus"))
    },
    Some("""SELECT r_name, o_orderstatus
            FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)
            ORDER BY r_name, o_orderstatus"""))

  /** J5: theta join — equi prefix plus a non-equi residual (Catalyst keeps the
    * hash join on the equi part and filters the residual; a pure-theta join
    * would go BroadcastNestedLoop, acceptable only for dims). */
  private val joinTheta = Q(
    "q_join_theta",
    (spark, dir) => {
      val supp = Tables.t(spark, dir, "supplier")
      val cust = Tables.t(spark, dir, "customer")
      supp
        .join(cust, supp("s_nationkey") === cust("c_nationkey") && supp("s_acctbal") > cust("c_acctbal"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("n_poorer_customers"))
        .orderBy(col("s_name"))
    },
    Some("""SELECT s_name, count(*) AS n_poorer_customers
            FROM supplier JOIN customer
              ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
            GROUP BY s_name ORDER BY s_name"""))

  /** J6: lookup/dimension join (Pinot lookUp()) = explicit broadcast hint —
    * the dim never shuffles, the fact side streams through map-side. */
  private val joinLookup = Q(
    "q_join_lookup",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
      val part = Tables.t(spark, dir, "part")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand, count(*) AS n_items,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand"""))

  /** J1+J7: the 5-table star chain (region→nation→customer→orders→lineitem) —
    * the reference's "Tableau over the broker" analytics shape at join depth.
    * Dims broadcast; the only real shuffle is orders⋈lineitem on orderkey. */
  private val joinMulti = Q(
    "q_join_multi",
    (spark, dir) => {
      val region = broadcast(Tables.t(spark, dir, "region"))
      val nation = broadcast(Tables.t(spark, dir, "nation"))
      val cust = Tables.t(spark, dir, "customer")
      val orders = Tables.t(spark, dir, "orders")
      val li = Tables.t(spark, dir, "lineitem")
      li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .join(nation, cust("c_nationkey") === nation("n_nationkey"))
        .join(region, nation("n_regionkey") === region("r_regionkey"))
        .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("r_name"), col("order_year"))
    },
    Some("""SELECT r_name, CAST(year(o_orderdate) AS INT) AS order_year,
            round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, order_year ORDER BY r_name, order_year"""))

  /** Range join via binning (graft.ops.RangeJoin): line items matched to
    * every part whose ±5 retail-price band contains the line's unit price —
    * a genuinely large×large interval join that would be a nested-loop
    * cartesian as a bare BETWEEN join. All-DOUBLE arithmetic, so both
    * engines compute identical IEEE boundaries. */
  private val joinRange = Q(
    "q_join_range",
    (spark, dir) => {
      val li = Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      val bands = Tables.t(spark, dir, "part")
        .select(col("p_partkey"), col("p_brand"),
          (col("p_retailprice") - 5.0).as("lo"), (col("p_retailprice") + 5.0).as("hi"))
      // two-level agg instead of count+countDistinct: the distinct would
      // plan an Expand (×2 duplication) over every matched pair; grouping
      // by (brand, partkey) first lets map-side partial agg collapse the
      // ~pair-per-point-interval stream to ~|part| rows before the shuffle
      graft.ops.RangeJoin.binnedRangeJoin(li, bands, "unit_price", "lo", "hi", binWidth = 10.0)
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(
          count(lit(1)).as("cnt"),
          min(col("unit_price")).as("mn"),
          max(col("unit_price")).as("mx"))
        .groupBy(col("p_brand"))
        .agg(
          sum(col("cnt")).as("n_matches"),
          count(lit(1)).as("n_parts"),
          round(min(col("mn")), 2).as("min_up"),
          round(max(col("mx")), 2).as("max_up"))
        .orderBy(col("p_brand"))
    },
    Some("""WITH pts AS (
            |  SELECT l_orderkey, l_linenumber, l_extendedprice / l_quantity AS unit_price
            |  FROM lineitem
            |), bands AS (
            |  SELECT p_partkey, p_brand, p_retailprice - 5.0 AS lo, p_retailprice + 5.0 AS hi
            |  FROM part
            |)
            |SELECT p_brand, count(*) AS n_matches,
            |       count(DISTINCT p_partkey) AS n_parts,
            |       round(min(unit_price), 2) AS min_up,
            |       round(max(unit_price), 2) AS max_up
            |FROM pts JOIN bands ON unit_price >= lo AND unit_price <= hi
            |GROUP BY p_brand ORDER BY p_brand""".stripMargin))

  /** Fuzzy (edit-distance) string self-join over part names —
    * [[graft.ops.FuzzyJoin]], SymSpell symmetric-deletion candidates:
    * every string emits its deletion variants up to depth d (delete ≤d
    * characters), pairs whose variants collide are candidates, exact
    * `levenshtein` confirm (see FuzzyJoin.scala for why this replaced the
    * PassJoin segment topology: on low-entropy dictionaries candidate-key
    * SELECTIVITY, not fan-out, decides survival — measured 458.7→48.7 s at
    * 160k names). Deletion-variant generation is provably COMPLETE for
    * Damerau/Levenshtein distance ≤ d, so the oracle is plain brute
    * force — distinct-name cross pairs filtered by DuckDB's own
    * levenshtein. At corpus scale the name dictionary is the distinct
    * frame (never row-level), fan-out per string is C(len, ≤d) map-side
    * rows, and no partition grows with data size — the standard
    * typo-class reconciliation shape. */
  private val joinFuzzy = Q(
    "q_join_fuzzy",
    (spark, dir) => {
      graft.ops.FuzzyJoin
        .selfJoin(Tables.t(spark, dir, "part"), "p_name", d = 3)
        .select(col("a").as("name_a"), col("b").as("name_b"), col("dist"))
        .orderBy(col("name_a"), col("name_b"))
    },
    Some("""WITH n AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
            |SELECT a.p_name AS name_a, b.p_name AS name_b,
            |       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
            |FROM n a JOIN n b ON a.p_name < b.p_name
            |WHERE levenshtein(a.p_name, b.p_name) <= 3
            |ORDER BY name_a, name_b""".stripMargin))

  val all: Seq[Q] = Seq(
    joinInner, joinLeft, joinRight, joinFull, joinSemi, joinAnti,
    joinCross, joinTheta, joinLookup, joinRange, joinMulti, joinFuzzy)
}
