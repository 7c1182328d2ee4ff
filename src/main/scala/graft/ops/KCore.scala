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
      k: Int,
      rounds: Int): DataFrame = {
    var e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    def snap(r: Int): Unit = {
      val row = e.agg(count(lit(1)).as("er"),
        count_distinct(col("src")).as("n")).head()
      traj += ((r, row.getLong(1), row.getLong(0) / 2))
    }
    snap(0)
    var r = 1
    while (r <= rounds) {
      val alive = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("node"))
      val kept = e
        .join(alive.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(alive.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
      val old = e
      e = kept.localCheckpoint(true)
      old.unpersist()
      snap(r)
      r += 1
    }
    import spark.implicits._
    traj.toSeq.toDF("round", "nodes_alive", "edges_alive")
  }
}
