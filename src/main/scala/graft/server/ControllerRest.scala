package graft.server

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** Controller-side REST state for the reference's autoscaling lifecycle
  * (SURVEY.md §2.1 S11/T7): the scale-in Lambda drives, in order,
  * `PUT /instances/{i}/updateTags?tags=`, `GET /tables`,
  * `POST /tables/{t}/rebalance?...`, a `GET /segments/{t}/servers` poll
  * until the draining server vanishes from `serverToSegmentsMap`, then
  * `DELETE /instances/{i}`
  * (`/root/reference/lib/apache-pinot-solution-stack.ts:410-478`).
  *
  * Architecture delta, stated: in this engine segments are parquet files in
  * shared storage and executors are stateless, so "which server owns which
  * segment" is a ROUTING table, not a data-movement plan — rebalance is
  * metadata-only and instant (the storage/compute split the reference's
  * Lambda exists to compensate for). The surface still answers the exact
  * call sequence so the reference's operational tooling runs unmodified:
  *
  *  - segments come from the table's layout manifest (the parquet file
  *    listing — same metadata [[graft.sources.SortedLayout.fileRanges]]
  *    reads footers from), never from data reads;
  *  - assignment is deterministic round-robin over TAGGED instances;
  *    untagging (the Lambda's first call) makes an instance ineligible but
  *    — as in Pinot — moves nothing until a rebalance reassigns;
  *  - DELETE refuses (409 CONFLICT, Pinot's contract) while the instance
  *    still holds segments or its tags, and succeeds after the
  *    untag + rebalance drain.
  */
final class ControllerRest(
    spark: SparkSession,
    tables: Map[String, String], // table name -> data dir
    initialInstances: Seq[String]) {

  /** Instances currently holding server tags (assignment-eligible). */
  private val tagged = TrieMap(initialInstances.map(_ -> true): _*)

  /** table -> (segment -> instance); built lazily from the manifest, then
    * mutated only by [[rebalance]]. */
  private val assignments = TrieMap[String, Map[String, String]]()

  def tableNames: Seq[String] = tables.keys.toSeq.sorted

  def hasTable(t: String): Boolean = tables.contains(t)

  /** Segment names from the layout manifest: the parquet file listing of
    * the table dir (footer-metadata class — no data pages are read). */
  def segments(table: String): Seq[String] = {
    val root = new Path(tables(table))
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
      .sorted
      .toSeq
  }

  private def roundRobin(segs: Seq[String], over: Seq[String]): Map[String, String] =
    segs.zipWithIndex.map { case (s, i) => s -> over(i % over.size) }.toMap

  private def assignmentOf(table: String): Map[String, String] =
    assignments.getOrElseUpdate(table, {
      val eligible = tagged.keys.toSeq.sorted
      if (eligible.isEmpty) Map.empty else roundRobin(segments(table), eligible)
    })

  /** `GET /segments/{t}/servers` body: instance -> its assigned segments. */
  def serverToSegmentsMap(table: String): Map[String, Seq[String]] =
    assignmentOf(table).groupBy(_._2).map { case (srv, m) => srv -> m.keys.toSeq.sorted }

  /** `PUT /instances/{i}/updateTags?tags=...` — empty tags = drain intent. */
  def updateTags(instance: String, tags: Seq[String]): Unit =
    if (tags.isEmpty) tagged.remove(instance) else tagged.put(instance, true)

  def isTagged(instance: String): Boolean = tagged.contains(instance)

  /** `POST /tables/{t}/rebalance` — reassign every manifest segment over the
    * currently tagged instances. Metadata-only, so the job is DONE by the
    * time the response renders (`NO_OP` when nothing moved; `FAILED` when no
    * instance is eligible). dryRun computes without committing. */
  def rebalance(table: String, dryRun: Boolean): (String, Int, Int) = {
    val eligible = tagged.keys.toSeq.sorted
    if (eligible.isEmpty) return ("FAILED", 0, 0)
    val before = assignmentOf(table)
    val after = roundRobin(segments(table), eligible)
    val moved = after.count { case (s, srv) => !before.get(s).contains(srv) }
    if (!dryRun) assignments.put(table, after)
    (if (moved == 0) "NO_OP" else "DONE", after.size, moved)
  }

  /** `DELETE /instances/{i}`: Pinot's contract — refuse while the instance
    * is still tagged or still holds segments (409), succeed once drained. */
  def deleteInstance(instance: String): Either[String, Unit] = {
    if (tagged.contains(instance))
      Left(s"Failed to drop instance $instance - instance still has tags (untag + rebalance first)")
    else {
      val holding = tables.keys.filter(t => assignmentOf(t).values.exists(_ == instance))
      if (holding.nonEmpty)
        Left(s"Failed to drop instance $instance - still serving segments of ${holding.toSeq.sorted.mkString(",")} (rebalance first)")
      else Right(())
    }
  }
}
