package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous k-core peeling — the density filter of the graph family
  * (spam/link-farm detection over host graphs, dense-community extraction
  * over co-occurrence graphs; complements `Triangles`' local density and
  * `LabelProp`'s partitioning). Each round computes every surviving
  * node's degree against the CURRENT subgraph, removes all sub-k nodes
  * together (synchronous — no within-round order dependence), and drops
  * edges touching removed nodes. A fixed round count keeps the trajectory
  * replayable row for row in an unrolled DuckDB oracle; at fixpoint
  * further rounds are no-ops, and short of it the reported state is still
  * exact for both engines.
  *
  * Scale shape: per round one degree aggregation (shuffle on node id) and
  * two semi-joins of the edge frame against the surviving-node set —
  * never a cartesian, never per-node iteration. The edge frame is
  * re-checkpointed each round (the `Components` lineage doctrine: an
  * iterative self-referencing frame must cut lineage eagerly or the plan
  * grows per round). Driver state: one (nodes, edges) pair per round.
  *
  * Input contract: `edges(src, dst)` must be the SYMMETRIC, deduplicated
  * adjacency (both directions present, no self-loops), so `groupBy(src)`
  * is each node's full degree.
  */
object KCore {

  /** Peel `rounds` rounds at threshold `k`; returns the trajectory
    * `(round, nodes_alive, edges_alive)` — round 0 = the input graph,
    * `edges_alive` counts UNDIRECTED edges (directed rows / 2). */
  def peelTrajectory(
      spark: SparkSession,
      edges: DataFrame,
      k: Long,
      rounds: Int): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Round 12 (the r11 PageRank/LabelProp finding applied to the peel
    // loop): the edge frame used to be localCheckpoint'd each round, whose
    // LogicalRDD reports UnknownPartitioning — so EVERY round's degree
    // aggregation re-exchanged the surviving edges. The frame is loop
    // STATE (it shrinks), so the lineage-cut doctrine still applies — but
    // the cut point moves to the per-round DEGREE frame (tiny, |nodes|
    // rows): `kept` references the edge chain once and the CHECKPOINTED
    // deg twice, so the edge plan grows linearly (one cached hop per
    // round) instead of 3^rounds (first attempt persisted everything and
    // wedged 10+ minutes inside generateTreeString — every uncut round
    // tripled the tree). The persisted chain keeps hashpartitioning(src)
    // visible: the per-round degree aggregation needs NO exchange (hash
    // (src) satisfies its clustering) and the broadcast semi-joins
    // preserve the streamed side's partitioning into the next round.
    // Each new frame is eagerly materialized (count()) BEFORE the
    // previous one is released — the multi-consumer persists race
    // doctrine, and the old blocks feed the build.
    var e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    var r = 0
    try {
      while (r <= rounds) {
        // ONE pass over the edge frame per round (round 10): the degree
        // aggregate feeds BOTH the trajectory snapshot (nodes_alive = its
        // row count, edges_alive = Σd / 2 — identical to the former
        // count_distinct(src) / count(*)/2 direct pass) and the alive
        // filter; deg is |nodes| rows, eagerly checkpointed: materialized
        // for its two readers AND the loop's lineage cut (see above).
        val deg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
          .localCheckpoint(true)
        val row = deg.agg(count(lit(1)).as("n"),
          coalesce(sum(col("d")), lit(0L)).as("er")).head()
        traj += ((r, row.getLong(0), row.getLong(1) / 2))
        if (r < rounds) {
          val alive = deg.filter(col("d") >= k).select(col("src").as("node"))
          val kept = e
            .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
            .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
            .select(col("src"), col("dst"))
          val old = e
          e = kept.persist()
          e.count() // materialize from old's blocks before releasing them
          old.unpersist()
        }
        r += 1
      }
    } finally e.unpersist()
    import spark.implicits._
    traj.toSeq.toDF("round", "nodes_alive", "edges_alive")
  }
}
