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
    // out-degree rides WITH the edge row (src, dst, outdeg). The frame is
    // loop-INVARIANT, so it is persisted hash-partitioned AND sorted by src
    // (not localCheckpoint'd: a checkpoint's LogicalRDD reports
    // UnknownPartitioning, so every per-round join re-shuffled the full
    // edge frame; a persisted plan keeps hashpartitioning(src) visible to
    // the planner — round 11, the guide-§2.4 "remove shuffles outright"
    // fix). Per round only the |V|-row rank state crosses an exchange.
    val ewd = e.join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val base = scale / dampDen * (dampDen - dampNum) // exact: scale % den == 0 for defaults
    // ADVICE r11: unpersist in finally so a mid-iteration failure cannot
    // leak the loop-invariant caches for the session lifetime
    try {
    // r(v) is a pure function of msum(v) — r = base + damp·msum div den,
    // msum absent ⇒ r = base — so the loop state is the |V|-row msum frame
    // and the rank projection is FUSED into the next round's contribution
    // expression (round 11: removes the per-round nodes⋈msum join + its
    // exchange + the full-|V| rank checkpoint; full ranks materialize once
    // at the end). Arithmetic is the identical expression composition —
    // BIGINT div per edge, DECIMAL(38,0) sum, decimal damp multiply +
    // integral divide — so the trajectory is bit-identical.
    val rFromMsum =
      s"(CAST($base AS BIGINT) + CAST($dampNum AS DECIMAL(38,0)) " +
        s"* coalesce(msum, CAST(0 AS DECIMAL(38,0))) div $dampDen)"
    if (iters == 0) {
      return nodes.withColumn("r", lit(scale)).localCheckpoint(true)
    }
    // The per-dst contribution sum is DECIMAL(38,0) (it can never overflow
    // at any graph size), and precision-38 decimal updates are BigInteger
    // work per row — CPU-heavy while its shuffle BYTES are tiny, so AQE's
    // byte-based coalescing would collapse the stage to 1-4 partitions and
    // serialize exactly the expensive part (measured 16 s single-task vs
    // ~1 s at 32). The explicit repartition pins the aggregation's
    // parallelism to the session's shuffle.partitions and carries plain
    // (dst, contrib) LONG pairs; the decimal work then happens once per
    // row, in-partition, at full width.
    def sumByDst(contribs: DataFrame): DataFrame = contribs
      .repartition(nPart, col("dst"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))

    // round 1: r_0 = scale for every node — a constant, so no join at all
    var msum = sumByDst(ewd
        .select(col("dst"), expr(s"CAST($scale AS BIGINT) div outdeg").as("contrib")))
      .localCheckpoint(true)
    var i = 1
    while (i < iters) {
      // r is derived from msum PER NODE before the join (the decimal damp
      // multiply + Knuth division are ~µs-scale BigInteger ops — evaluating
      // them per EDGE instead of per node measured 8× the round cost);
      // per-edge work is only the BIGINT div. A src absent from msum has
      // r = base exactly (LONG coalesce after the left join).
      val rstate = msum.select(col("node"), expr(rFromMsum).as("r"))
      msum = sumByDst(ewd.join(rstate, ewd("src") === rstate("node"), "left")
          .select(col("dst"),
            expr(s"coalesce(r, CAST($base AS BIGINT)) div outdeg").as("contrib")))
        .localCheckpoint(true)
      i += 1
    }
    nodes.join(msum, Seq("node"), "left")
      .select(col("node"), expr(rFromMsum).as("r"))
      .localCheckpoint(true)
    } finally {
      ewd.unpersist()
      nodes.unpersist()
    }
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
    // loop-invariant weighted edge frame: persisted partitioned+sorted by
    // src (see run() — checkpoints lose partitioning, persists keep it)
    val ewd = e.join(e.groupBy("src").agg(sum(col("w")).as("wout")), "src")
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .persist()
    val base = scale / dampDen * (dampDen - dampNum)
    try {
    val rFromMsum =
      s"(CAST($base AS BIGINT) + CAST($dampNum AS DECIMAL(38,0)) " +
        s"* coalesce(msum, CAST(0 AS DECIMAL(38,0))) div $dampDen)"
    if (iters == 0) {
      return nodes.withColumn("r", lit(scale)).localCheckpoint(true)
    }
    // see run(): pinned-parallelism decimal aggregation
    def sumByDst(contribs: DataFrame): DataFrame = contribs
      .repartition(nPart, col("dst"))
      .groupBy(col("dst").as("node"))
      .agg(sum(col("contrib").cast("decimal(38,0)")).as("msum"))

    // round 1: r_0 = scale, a constant — no join; r*w in DECIMAL
    // (overflow-free), floor-div by wout back to BIGINT
    var msum = sumByDst(ewd
        .select(col("dst"),
          expr(s"CAST($scale AS DECIMAL(38,0)) * w div wout").as("contrib")))
      .localCheckpoint(true)
    var i = 1
    while (i < iters) {
      // r derived per NODE before the join (see run()); the r*w decimal
      // multiply stays per edge — that is the weighted contribution itself
      val rstate = msum.select(col("node"), expr(rFromMsum).as("r"))
      msum = sumByDst(ewd.join(rstate, ewd("src") === rstate("node"), "left")
          .select(col("dst"),
            expr(s"CAST(coalesce(r, CAST($base AS BIGINT)) AS DECIMAL(38,0))" +
              " * w div wout").as("contrib")))
        .localCheckpoint(true)
      i += 1
    }
    nodes.join(msum, Seq("node"), "left")
      .select(col("node"), expr(rFromMsum).as("r"))
      .localCheckpoint(true)
    } finally {
      ewd.unpersist()
      nodes.unpersist()
    }
  }
}
