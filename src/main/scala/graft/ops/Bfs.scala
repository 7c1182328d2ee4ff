package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synchronous frontier BFS — unweighted single-source shortest paths,
  * the reachability member of the graph family (PageRank = authority,
  * Triangles/KCore = density, LabelProp/Components = partitioning). A
  * fixed round count keeps the trajectory replayable in an unrolled
  * DuckDB oracle; rounds past the source's eccentricity are no-ops.
  *
  * Scale shape: per round one frontier⋈edges join (shuffle bounded by the
  * frontier's out-edges), one distinct, and one anti-join against the
  * settled set — the textbook Pregel iteration as three bounded
  * exchanges; no per-node driver work, frames localCheckpoint'd eagerly
  * (the `Components` lineage doctrine).
  *
  * Input contract: `edges(src, dst)` symmetric + deduplicated (as KCore).
  */
object Bfs {

  /** Levels 0..`rounds` from `source`: returns (node, level) for every
    * node reached within `rounds` hops; unreached nodes are absent. */
  def levels(spark: SparkSession, edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // loop-invariant edge frame: persisted hash-partitioned + sorted by src
    // (round 11 — NOT localCheckpoint'd: a checkpoint's LogicalRDD reports
    // UnknownPartitioning, so every round's frontier join re-shuffled the
    // full edge frame; the persisted plan keeps hashpartitioning(src)
    // visible and the cached sort order lets each round's sort-merge join
    // exchange + sort ONLY the frontier — guide §2.4)
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .repartition(nPart, col("src"))
      .sortWithinPartitions("src")
      .persist()
    import spark.implicits._
    // ADVICE r11: unpersist in finally so a mid-iteration failure cannot
    // leak the loop-invariant cache for the session lifetime
    try {
    var dist = Seq((source, 0)).toDF("node", "level").localCheckpoint(true)
    var frontier = dist.select(col("node"))
    var r = 1
    while (r <= rounds) {
      val next = e.join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("level", lit(r))
        .localCheckpoint(true)
      // dist stays a LAZY union of the checkpointed per-round frontiers
      // (round 11): its readers — the per-round anti-join and the final
      // consumer — re-scan checkpoint blocks narrowly, which is cheaper
      // than eagerly re-materializing the whole growing settled set every
      // round (one saved |settled|-row checkpoint pass per round)
      dist = dist.union(next)
      frontier = next.select(col("node"))
      r += 1
    }
    dist
    } finally e.unpersist()
  }
}
