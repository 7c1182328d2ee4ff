package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hybrid table — one logical table served from an OFFLINE store plus a
  * REALTIME store, with broker time-boundary routing.
  *
  * This is Pinot's production growth path for the reference's realtime
  * table (the stack deploys `kinesisTable` REALTIME-only,
  * `/root/reference/resources/pinot/resources/kinesisTableConfigFile.json:2-5`;
  * hybrid = the same table name in both OFFLINE and REALTIME flavors, with
  * the minion `RealtimeToOfflineSegmentsTask` draining aged realtime
  * segments into the offline side). The broker computes ONE time boundary
  * from offline segment metadata and splits every query:
  *
  *   offline side serves  ts <  boundary
  *   realtime side serves ts >= boundary
  *
  * so rows present in BOTH stores (moved to offline but not yet purged from
  * realtime retention) are still served exactly once. Pinot sets the
  * boundary one time-bucket BELOW the newest offline data because the
  * newest pushed bucket may be partial — we mirror that: boundary = start
  * of the newest offline day, i.e. the newest offline day itself is served
  * from realtime until the next push proves it complete.
  *
  * Spark-first shape: the boundary is a one-row aggregate over the offline
  * store, broadcast into both filters — never a driver collect, and on a
  * [[graft.sources.SortedLayout]]-style day-partitioned offline store the
  * max reduces to partition-directory metadata. Both side filters are plain
  * Catalyst predicates, so partition pruning / footer pruning still fire
  * under the union.
  */
object HybridTable {

  /** Broker time boundary: start of the newest offline day (one-row frame,
    * column `_boundary`). Empty offline store → null boundary, which the
    * view treats as "everything from realtime". */
  def timeBoundary(offline: DataFrame, tsCol: String = "ts"): DataFrame =
    offline.agg(date_trunc("day", max(col(tsCol))).as("_boundary"))

  /** The broker view: offline strictly below the boundary, realtime at or
    * above it. Columns are aligned by name (the two stores share a schema;
    * offline may carry extra partition columns, which are dropped). */
  def view(offline: DataFrame, realtime: DataFrame, tsCol: String = "ts"): DataFrame = {
    val cols = realtime.columns.toIndexedSeq
    val b = timeBoundary(offline, tsCol)
    val off = offline
      .crossJoin(broadcast(b))
      .filter(col("_boundary").isNotNull && col(tsCol) < col("_boundary"))
      .select(cols.map(col): _*)
    val rt = realtime
      .crossJoin(broadcast(b))
      .filter(col("_boundary").isNull || col(tsCol) >= col("_boundary"))
      .select(cols.map(col): _*)
    off.unionByName(rt)
  }

  /** RealtimeToOfflineSegmentsTask analog: move every COMPLETE day strictly
    * below the realtime store's newest day (minus `lagDays` extra safety
    * days) from a day-partitioned realtime directory into a day-partitioned
    * offline directory. Returns the day values now present offline from
    * this run's eligible window (freshly moved or already moved earlier).
    *
    * Mechanics follow [[SegmentCompaction]]'s minion contract: each moved
    * partition's file set is snapshotted, rewritten into the offline store
    * via a staging dir, and only then (optionally) dropped from realtime —
    * `purgeRealtime = false` leaves the copies in place, which is the
    * steady state between a move and the retention purge and exactly what
    * the boundary split exists to make safe.
    *
    * Exactly-once composition with [[view]]:
    *  - idempotent: a day whose offline partition already holds files is
    *    never re-copied (re-running the task cannot duplicate rows);
    *  - purge-safe: the resulting broker boundary is the START of the
    *    newest offline day, and [[view]] serves that day from REALTIME —
    *    so purge removes only days STRICTLY BELOW the newest offline day.
    *    The boundary day's realtime copy survives until a later run moves
    *    a newer day past it (mirrors Pinot, where realtime retention is
    *    always ≥ one bucket behind the time boundary). Purge of a day
    *    moved by an earlier run drops the whole partition
    *    (retention-style); purge of a day moved this run drops only the
    *    snapshotted files, leaving concurrently-arrived files in place. */
  def realtimeToOffline(
      spark: SparkSession,
      realtimeDir: String,
      offlineDir: String,
      lagDays: Int = 0,
      purgeRealtime: Boolean = true): Seq[String] = {
    val fs = new Path(realtimeDir).getFileSystem(spark.sessionState.newHadoopConf())
    val root = new Path(realtimeDir)
    if (!fs.exists(root)) return Seq.empty
    def dataFiles(p: Path) = fs.listStatus(p).filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    val partDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
      .sortBy(_.getPath.getName)
    if (partDirs.length <= 1 + lagDays) return Seq.empty
    val toMove = partDirs.dropRight(1 + lagDays) // newest day (+ lag) stays realtime-only
    val moved = Seq.newBuilder[String]
    // (realtime partition dir, snapshot of files copied THIS run — empty if
    // the day was already offline and we skipped the copy)
    val movedDirs = Seq.newBuilder[(Path, Array[Path])]
    toMove.foreach { d =>
      val day = d.getPath.getName.substring("dt=".length)
      val target = new Path(new Path(offlineDir), d.getPath.getName)
      val alreadyMoved = fs.exists(target) && dataFiles(target).nonEmpty
      if (alreadyMoved) {
        moved += day
        movedDirs += ((d.getPath, Array.empty[Path]))
      } else {
        val snapshot = dataFiles(d.getPath)
        if (snapshot.nonEmpty) {
          val tmp = new Path(new Path(offlineDir), s".r2o_tmp_${d.getPath.getName}")
          spark.read.parquet(snapshot.map(_.getPath.toString).toIndexedSeq: _*)
            .write.mode("overwrite").parquet(tmp.toString)
          fs.mkdirs(target)
          val staged = dataFiles(tmp)
          val stamp = System.currentTimeMillis()
          staged.zipWithIndex.foreach { case (s, i) =>
            fs.rename(s.getPath, new Path(target, s"r2o-$stamp-$i.parquet"))
          }
          fs.delete(tmp, true)
          moved += day
          movedDirs += ((d.getPath, snapshot.map(_.getPath)))
        }
      }
    }
    if (purgeRealtime) {
      // The broker boundary after this run = start of the newest offline
      // day; view() serves that day from realtime, so it must survive.
      val offRoot = new Path(offlineDir)
      val offlineDays = fs.listStatus(offRoot)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt="))
        .map(_.getPath.getName)
      if (offlineDays.nonEmpty) {
        val boundaryDay = offlineDays.max // ISO day names sort lexicographically
        movedDirs.result().foreach { case (dir, snapshot) =>
          if (dir.getName < boundaryDay) {
            if (snapshot.nonEmpty) snapshot.foreach(p => fs.delete(p, false))
            else dataFiles(dir).foreach(s => fs.delete(s.getPath, false))
            if (fs.listStatus(dir).isEmpty) fs.delete(dir, true)
          }
        }
      }
    }
    moved.result()
  }
}
