package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the graph-authority score large-scale data
  * pipelines use for source curation (Common-Crawl-style host ranking:
  * harmonic/PageRank centrality decides which domains' documents are worth
  * keeping; the same score family the reference's analytics stack would
  * compute over clickstream transition graphs).
  *
  * EXACT-INTEGER power iteration: ranks are scaled integers (`scale` units =
  * rank 1.0) and every update uses only integer operations —
  * `floor(r / outdeg)` per out-edge, an integer sum per destination, and
  * `floor(d * msum / den)` for damping. Integer addition is exact,
  * associative and commutative, so the whole trajectory is bit-identical
  * under any partitioning, join order or row order (the decimal-gradient
  * doctrine from [[LogReg]] applied to graphs), and a DuckDB oracle can
  * replicate every iteration verbatim in HUGEINT. Floor-division truncation
  * loses < 1 unit per edge per round — at scale=1e12 that is 1e-12 of rank
  * mass, far below any ranking-relevant difference.
  *
  * Semantics: the GraphX-example iteration
  * `r'(v) = base + d·Σ_{u→v} floor(r(u)/outdeg(u))` with
  * `base = scale·(den-num)/den` — dangling nodes (no out-edges) simply
  * contribute nothing (no dangling-mass redistribution), nodes with no
  * in-edges sit at `base`. Edges are a SET (deduplicated on entry);
  * multigraph weighting is the caller's job (pre-aggregate to weights and
  * expand, or use [[runWeighted]]).
  *
  * Scale shape: per iteration one partition-local `div` + one shuffle to sum
  * contributions by dst + one left join back to the node set — the minimal
  * PageRank topology. The edge frame joins on `src` every round, so it is
  * hash-repartitioned ONCE and checkpointed; rank frames are
  * localCheckpoint'd eagerly each round (the Components lineage doctrine —
  * bare persist leaves the plan growing round over round). Driver state is
  * one loop counter; nothing collects.
  */
object PageRank {

  /** @param edges two-column (src, dst) directed edge DataFrame; dedup'd here
    * @param iters fixed iteration count (power iteration; 10 ≈ 2-decimal
    *              convergence at damping 0.85)
    * @param dampNum/dampDen damping factor as an exact rational (85/100)
    * @param scale integer units per 1.0 of rank
    * @param assumeDistinct input is ALREADY an edge SET (e.g. a shared
    *              persisted frame built with `.distinct()`) — skips the
    *              dedup shuffle
    * @return (node: long, r: long) — r in `scale` units */
  def run(edges: DataFrame, iters: Int, dampNum: Int = 85, dampDen: Int = 100,
      scale: Long = 1000000000000L, assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen > dampNum,
      s"pagerank: need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val e0 = edges
      .select(col(edges.columns(0)).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"))
    val e = if (assumeDistinct) e0 else e0.distinct()
    // out-degree rides WITH the edge row (src, dst, outdeg): contributions
    // are then map-side pure — the only per-iteration shuffles are the
    // sum-by-dst and the node left join
    val ewd = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(nPart, col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val base = scale / dampDen * (dampDen - dampNum) // exact: scale % den == 0 for defaults
    var ranks = nodes.withColumn("r", lit(scale)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      // contrib = floor(r/outdeg) (BIGINT div — exact); msum as DECIMAL(38,0)
      // so the per-dst sum can never overflow at any graph size; damping as
      // exact decimal multiply then integral divide back to BIGINT
      val msum = ewd.join(ranks, ewd("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))
      ranks = nodes.join(msum, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"CAST($dampNum AS DECIMAL(38,0)) * coalesce(msum, CAST(0 AS DECIMAL(38,0))) div $dampDen"))
            .as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Weighted variant: (src, dst, w) with positive integer weights — the
    * multigraph form (w = co-occurrence count). Contribution of u→v is
    * `floor(r(u) * w / W(u))` with `W(u) = Σ out-weights` — still all
    * integer, still bit-exact. */
  def runWeighted(edges: DataFrame, iters: Int, dampNum: Int = 85,
      dampDen: Int = 100, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 0 && dampNum > 0 && dampDen > dampNum,
      s"pagerank: need 0 < dampNum < dampDen, got $dampNum/$dampDen")
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val e = edges
      .select(col(edges.columns(0)).cast("long").as("src"),
        col(edges.columns(1)).cast("long").as("dst"),
        col(edges.columns(2)).cast("long").as("w"))
      .groupBy("src", "dst").agg(sum(col("w")).as("w"))
    val ewd = e.join(e.groupBy("src").agg(sum(col("w")).as("wout")), "src")
      .repartition(nPart, col("src"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val base = scale / dampDen * (dampDen - dampNum)
    var ranks = nodes.withColumn("r", lit(scale)).localCheckpoint(true)
    var i = 0
    while (i < iters) {
      val msum = ewd.join(ranks, ewd("src") === ranks("node"))
        .select(col("dst"),
          // r*w in DECIMAL (overflow-free), floor-div by wout back to BIGINT
          expr("CAST(r AS DECIMAL(38,0)) * w div wout").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))
      ranks = nodes.join(msum, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"CAST($dampNum AS DECIMAL(38,0)) * coalesce(msum, CAST(0 AS DECIMAL(38,0))) div $dampDen"))
            .as("r"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }
}
