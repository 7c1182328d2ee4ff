package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS into dedup CLUSTERS (keep one survivor per component), which is how
  * a training-data pipeline actually applies MinHash/SimHash output at scale.
  *
  * Algorithm: iterative min-label propagation (the DataFrame form of
  * HashToMin): every node starts labeled with itself; each round pushes
  * labels across edges and keeps the per-node minimum; fixpoint when no
  * label changes. Converges in O(diameter) rounds — near-dup clusters are
  * dense (small diameter), so a handful of rounds in practice; each round is
  * one join + one aggregation, fully distributed. The driver-side loop only
  * orchestrates plans (one `count` per round for the convergence check) —
  * no data ever collects.
  */
object Components {

  /** @param edges two-column DataFrame (id_a, id_b) of undirected edges
    * @return (node, cluster) where cluster = min node id reachable
    *
    * Each round takes the min over (a) the node's own label, (b) neighbor
    * labels pushed across edges, and (c) the label's label — pointer
    * jumping, which halves chain depth per round, so convergence is
    * O(log diameter) instead of O(diameter) (a 400-doc drift chain converges
    * in ~9 rounds, not ~400). Convergence check: labels only ever decrease,
    * so the label SUM is strictly monotone — one cheap aggregate per round,
    * no join against the previous state. */
  /** Per-round progress to stderr when GRAFT_CC_DEBUG is set — an iterative
    * distributed algorithm with a driver loop should be observable. */
  private def ccLog(msg: => String): Unit =
    if (sys.env.contains("GRAFT_CC_DEBUG")) System.err.println(s"[cc] $msg")

  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val t0 = System.nanoTime()
    def elapsed = f"${(System.nanoTime() - t0) / 1e9}%.2fs"
    // eager localCheckpoint (not bare persist): iterative self-joins grow
    // the logical plan exponentially if lineage chains round-over-round, and
    // Catalyst re-analysis comes to dominate; checkpointing truncates the
    // plan to the materialized blocks each round
    // materialize the (possibly expensive) upstream pair pipeline ONCE —
    // the symmetric union would otherwise evaluate it per branch
    val e = edges.localCheckpoint(true)
    val sym = e.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(e.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint(true)
    // fused round 0: seed each node with min(self, min neighbor) — the same
    // single shuffle a bare distinct would cost, but it propagates one step
    // for free, saving a full loop round (3 joins + checkpoint + aggregate)
    var labels = sym.groupBy(col("src").as("node"))
      .agg(min(col("dst")).as("min_dst"))
      .select(col("node"), least(col("node"), col("min_dst")).as("cluster"))
      .localCheckpoint(true)
    // sum in DECIMAL(38,0): 64-bit hash-derived node ids would overflow a
    // Long sum (ANSI mode throws mid-iteration; non-ANSI wraparound could
    // alias two different label states as "converged")
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO) // empty edge list → null sum
    var prevSum = labelSum(labels)
    var i = 0
    var converged = false
    ccLog(s"init done at $elapsed")
    while (!converged && i < maxIter) {
      val viaEdges = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("cluster"))
      val viaParent = labels.as("l")
        .join(labels.as("p"), col("l.cluster") === col("p.node"))
        .select(col("l.node").as("node"), col("p.cluster").as("cluster"))
      // eager localCheckpoint each round — measured FASTER than lazy
      // persist() at local[32] (raw block reuse beats InMemoryRelation's
      // columnar encode/decode on these small iterative frames), and it
      // keeps lineage truncated so unpersisting the previous round can
      // never trigger recompute chains
      val next = labels.select("node", "cluster")
        .union(viaEdges).union(viaParent)
        .groupBy("node").agg(min("cluster").as("cluster"))
        .localCheckpoint(true)
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      i += 1
      ccLog(s"round $i done at $elapsed (converged=$converged)")
    }
    sym.unpersist()
    labels
  }
}
