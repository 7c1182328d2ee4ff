package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection over co-occurrence / link graphs, the curation-side complement
  * of [[Components]]: components find CONNECTED pieces, LPA finds dense
  * communities WITHIN a connected graph (topic clusters in a link graph,
  * near-clique seller rings in a transaction graph).
  *
  * Determinism: the classic algorithm breaks ties randomly and updates
  * asynchronously — neither survives a distributed setting honestly. This is
  * the SYNCHRONOUS variant with a total tie order: every node
  * simultaneously adopts the label carried by the most of its neighbors,
  * ties to the SMALLEST label; a node keeps its label only if it has no
  * neighbors (impossible after symmetrization). Every update is integer
  * counting + an argmin over (−count, label) — exact, order-free, so runs
  * are bit-identical under any partitioning and a DuckDB oracle replays
  * every round verbatim (the [[PageRank]] doctrine). Synchronous LPA can
  * 2-cycle on bipartite-ish structure rather than converge — callers pick a
  * fixed iteration budget and read the census at that horizon (the same
  * fixed-horizon contract as PageRank's power iteration).
  *
  * Scale shape per round: one edge⋈labels join (map-side after the edge
  * frame is hash-partitioned once and checkpointed), one (dst,label) count
  * shuffle whose row count is bounded by the edge count, one per-dst argmin
  * — all linear in edges; labels eagerly localCheckpoint'd (Components
  * lineage doctrine). Driver state: a loop counter.
  */
object LabelProp {

  /** @param edges two-column (src, dst) edge frame, treated as UNDIRECTED
    *              (symmetrized + dedup'd here); self-loops dropped
    * @param iters fixed synchronous rounds
    * @param assumeSymmetric input is ALREADY symmetric, deduplicated and
    *              self-loop-free (e.g. a shared persisted adjacency frame) —
    *              skips the symmetrize+distinct shuffle
    * @return (node: long, label: long) — label = min node id of the
    *         adopted community seed at the chosen horizon */
  def run(edges: DataFrame, iters: Int,
      assumeSymmetric: Boolean = false): DataFrame = {
    require(iters >= 0, s"labelprop: iters >= 0, got $iters")
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val a = col(edges.columns(0)).cast("long")
    val b = col(edges.columns(1)).cast("long")
    val sym =
      if (assumeSymmetric) edges.select(a.as("src"), b.as("dst"))
      else {
        val und = edges.select(a.as("u"), b.as("v")).where(col("u") =!= col("v"))
        und.select(col("u").as("src"), col("v").as("dst"))
          .union(und.select(col("v").as("src"), col("u").as("dst")))
          .distinct()
      }
    // loop-invariant edge frame: persisted hash-partitioned + sorted by src
    // (round 11 — NOT localCheckpoint'd: a checkpoint's LogicalRDD reports
    // UnknownPartitioning, so every round's join re-shuffled the full edge
    // frame; the persisted plan keeps hashpartitioning(src) visible and the
    // cached sort order lets the per-round sort-merge join skip both the
    // edge-side exchange AND its sort — guide §2.4). Per round only the
    // |V|-row label state crosses an exchange into the join.
    val e = sym
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    // ADVICE r11: unpersist in finally so a mid-iteration failure cannot
    // leak the loop-invariant cache for the session lifetime
    try {
    var labels = e.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(true)
    var i = 0
    while (i < iters) {
      // ONE exchange per round (round 11): the join output is repartitioned
      // by dst BEFORE the count — hashpartitioning(dst) satisfies the
      // clustering of BOTH the (dst, label) count and the per-dst argmin,
      // so the former two-exchange agg pair (hash(dst,label) partials, then
      // hash(dst) for the argmin) collapses to a single |E|-row exchange.
      labels = e.join(labels, e("src") === labels("node"))
        .select(col("dst"), col("label"))
        .repartition(nPart, col("dst"))
        .groupBy(col("dst"), col("label"))
        .agg(functions.count(lit(1)).as("cnt"))
        .groupBy(col("dst").as("node"))
        // argmax count, ties to the smallest label: min over (−count, label)
        .agg(min(struct((-col("cnt")).as("neg"), col("label"))).as("best"))
        .select(col("node"), col("best.label").as("label"))
        .localCheckpoint(true)
      i += 1
    }
    labels
    } finally e.unpersist()
  }

  /** Community census at the horizon: (label, size), one row per surviving
    * community. */
  def census(edges: DataFrame, iters: Int,
      assumeSymmetric: Boolean = false): DataFrame =
    run(edges, iters, assumeSymmetric)
      .groupBy(col("label"))
      .agg(functions.count(lit(1)).as("size"))
}
