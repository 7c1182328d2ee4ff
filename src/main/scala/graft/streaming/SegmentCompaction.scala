package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{Column, SparkSession}

/** Segment compaction — the Pinot minion MergeTask analog (Pinot's
  * `MergeRollupTask`/`SegmentGenerationAndPush` maintenance family rewrites
  * many small realtime-flushed segments into few large ones; the reference's
  * table would accrue one segment per 2-minute flush,
  * `kinesisTableConfigFile.json:23-25`). Our sealed sink
  * ([[EventIngest.sealedSink]]) likewise lands one parquet file per
  * micro-batch per `dt` partition — at 100 TB that is millions of tiny
  * files, and small files are THE classic object-store scan killer (listing
  * cost + per-file open overhead + no intra-file parallelism). This job
  * rewrites each day partition's files into `ceil(bytes/targetBytes)`
  * right-sized files.
  *
  * Concurrency contract (the minion model): each partition's input set is
  * SNAPSHOTTED up front and exactly those files are replaced — files landed
  * by a concurrent writer after the snapshot survive untouched. The rewrite
  * itself goes through a `.compact_tmp` staging dir which holds a full copy
  * of the partition until the swap completes, so a crash mid-swap is
  * recoverable by hand (re-run or restore from staging).
  *
  * Ownership handoff: by default the streaming sink's `_spark_metadata` log
  * is dropped (`dropSinkLog = true`), converting the table from
  * sink-log-tracked to plain listing-tracked reads — the same ownership
  * transfer Pinot's segment-replacement protocol performs when minion output
  * supersedes realtime segments. Run compaction once the writer for this
  * directory is decommissioned (or point readers at
  * `spark.sql.streaming.fileStreamSink.ignoreMetadata=true` and keep the
  * log); a still-running writer would resurrect a log that no longer lists
  * the compacted files.
  *
  * Everything speaks the Hadoop FileSystem API, so file:// in tests and
  * s3a:// in production take the same code path (SURVEY.md §2.1 S8).
  */
object SegmentCompaction {

  final case class PartitionStats(partition: String, files: Int, bytes: Long)

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())

  private def dataFiles(fs: FileSystem, dir: Path): Array[FileStatus] =
    fs.listStatus(dir).filter(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))

  /** Per-partition file count + bytes (observability / task scheduling: a
    * production compactor triggers off these, like Pinot's task generator
    * watching segment counts). */
  def stats(spark: SparkSession, tableDir: String): Seq[PartitionStats] = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map { d =>
        val files = dataFiles(fs, d.getPath)
        PartitionStats(d.getPath.getName, files.length, files.map(_.getLen).sum)
      }
      .sortBy(_.partition).toSeq
  }

  /** Compact every partition holding at least `minFiles` data files into
    * `ceil(bytes / targetBytes)` files. Returns post-compaction stats for
    * the partitions that were rewritten. */
  def compact(
      spark: SparkSession,
      tableDir: String,
      targetBytes: Long = 512L * 1024 * 1024,
      minFiles: Int = 4,
      dropSinkLog: Boolean = true): Seq[PartitionStats] = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val done = Seq.newBuilder[PartitionStats]
    val partDirs =
      if (fs.exists(root))
        fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.contains("="))
      else Array.empty[FileStatus]
    partDirs.foreach { d =>
      val snapshot = dataFiles(fs, d.getPath) // only these are replaced
      if (snapshot.length >= minFiles) {
        val bytes = snapshot.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val tmp = new Path(root, s".compact_tmp_${d.getPath.getName}")
        spark.read.parquet(snapshot.map(_.getPath.toString): _*)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = dataFiles(fs, tmp)
        // swap: drop exactly the snapshotted inputs, then move staged files
        // in under collision-proof names (a concurrent micro-batch landing
        // between snapshot and swap keeps its files)
        snapshot.foreach(s => fs.delete(s.getPath, false))
        val stamp = System.currentTimeMillis()
        staged.zipWithIndex.foreach { case (s, i) =>
          fs.rename(s.getPath, new Path(d.getPath, s"compacted-$stamp-$i.parquet"))
        }
        fs.delete(tmp, true)
        val after = dataFiles(fs, d.getPath)
        done += PartitionStats(d.getPath.getName, after.length, after.map(_.getLen).sum)
      }
    }
    if (dropSinkLog) fs.delete(new Path(root, "_spark_metadata"), true)
    done.result()
  }

  /** Compact + RE-CLUSTER (round 9): rewrite each partition's small
    * streaming files into right-sized Z-ORDERED files
    * ([[graft.sources.ZOrderLayout]]) — the production minion shape where
    * the maintenance task does double duty: the same rewrite that fixes the
    * small-file problem ALSO converts arrival-ordered data (which prunes on
    * nothing but time) into a layout whose parquet footers are selective on
    * BOTH z-columns. After the swap, registering the partition dirs gives
    * 2-D footer pruning inside every day (`dt=` pruning stays free on top).
    * Same snapshot/staging/swap + ownership-handoff mechanics as
    * [[compact]]. */
  def compactZOrder(
      spark: SparkSession,
      tableDir: String,
      colA: String,
      colB: String,
      targetBytes: Long = 512L * 1024 * 1024,
      minFiles: Int = 4,
      dropSinkLog: Boolean = true): Seq[PartitionStats] = {
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val done = Seq.newBuilder[PartitionStats]
    val partDirs =
      if (fs.exists(root))
        fs.listStatus(root).filter(s => s.isDirectory && s.getPath.getName.contains("="))
      else Array.empty[FileStatus]
    partDirs.foreach { d =>
      val snapshot = dataFiles(fs, d.getPath)
      if (snapshot.length >= minFiles) {
        val bytes = snapshot.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val tmp = new Path(root, s".compact_tmp_${d.getPath.getName}")
        graft.sources.ZOrderLayout.write(
          spark.read.parquet(snapshot.map(_.getPath.toString): _*),
          tmp.toString, colA, colB, nFiles = nOut)
        val staged = dataFiles(fs, tmp)
        snapshot.foreach(s => fs.delete(s.getPath, false))
        val stamp = System.currentTimeMillis()
        staged.zipWithIndex.foreach { case (s, i) =>
          fs.rename(s.getPath, new Path(d.getPath, s"zordered-$stamp-$i.parquet"))
        }
        fs.delete(tmp, true)
        val after = dataFiles(fs, d.getPath)
        done += PartitionStats(d.getPath.getName, after.length, after.map(_.getLen).sum)
      }
    }
    if (dropSinkLog) fs.delete(new Path(root, "_spark_metadata"), true)
    done.result()
  }

  /** Merge-ROLLUP — the second half of Pinot's `MergeRollupTask`: partitions
    * older than `olderThan` (exclusive, compared on the `dt=` value — ISO
    * dates compare lexically) are rewritten as `groupBy(groupCols).agg(...)`,
    * collapsing raw rows into one row per dimension combination. Recent
    * partitions keep raw granularity for drill-down; aged partitions keep
    * only the rollup — Pinot's tiered raw→rolled retention story, and the
    * classic way a 100 TB events table stays queryable: the old tail shrinks
    * by the dimension-collapse factor while additive aggregates stay exact.
    *
    * Same snapshot/staging/swap mechanics as [[compact]]: only the
    * snapshotted files are replaced, concurrent arrivals survive, the swap
    * stages a full copy first. Rolled output lands in one file per partition
    * per `targetBytes` of input (rolled data is smaller; right-sizing off
    * input bytes over-parallelizes, never under-sizes files).
    */
  def rollup(
      spark: SparkSession,
      tableDir: String,
      olderThan: String,
      groupCols: Seq[String],
      aggExprs: Seq[Column],
      targetBytes: Long = 512L * 1024 * 1024,
      dropSinkLog: Boolean = true): Seq[PartitionStats] = {
    require(aggExprs.nonEmpty, "rollup needs at least one aggregate")
    import org.apache.spark.sql.functions.col
    val fs = fsOf(spark, tableDir)
    val root = new Path(tableDir)
    val done = Seq.newBuilder[PartitionStats]
    val partDirs =
      if (fs.exists(root))
        fs.listStatus(root).filter { s =>
          val n = s.getPath.getName
          s.isDirectory && n.contains("=") && n.substring(n.indexOf('=') + 1) < olderThan
        }
      else Array.empty[FileStatus]
    partDirs.foreach { d =>
      val snapshot = dataFiles(fs, d.getPath)
      if (snapshot.nonEmpty) {
        val bytes = snapshot.map(_.getLen).sum
        val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
        val tmp = new Path(root, s".rollup_tmp_${d.getPath.getName}")
        spark.read.parquet(snapshot.map(_.getPath.toString): _*)
          .groupBy(groupCols.map(col): _*)
          .agg(aggExprs.head, aggExprs.tail: _*)
          .coalesce(nOut)
          .write.mode("overwrite").parquet(tmp.toString)
        val staged = dataFiles(fs, tmp)
        snapshot.foreach(s => fs.delete(s.getPath, false))
        val stamp = System.currentTimeMillis()
        staged.zipWithIndex.foreach { case (s, i) =>
          fs.rename(s.getPath, new Path(d.getPath, s"rolledup-$stamp-$i.parquet"))
        }
        fs.delete(tmp, true)
        val after = dataFiles(fs, d.getPath)
        done += PartitionStats(d.getPath.getName, after.length, after.map(_.getLen).sum)
      }
    }
    if (dropSinkLog) fs.delete(new Path(root, "_spark_metadata"), true)
    done.result()
  }

  /** Upsert-log purge — the Pinot minion `PurgeTask` analog for upsert
    * tables: physically remove records that can no longer affect any served
    * row. The accumulated update log ([[EventIngest.upsertLatest]] Update
    * output: `(k, event_micros, payload, deleted)`) is rewritten as
    *
    *  - one row per key: the latest by `(event_micros, payload)` — all
    *    superseded versions drop (log compaction);
    *  - keys whose latest record is a TOMBSTONE older than
    *    `tombstoneHorizonMicros` drop entirely (the delete is final — no
    *    comparison-column-younger record can still arrive);
    *  - younger tombstones are KEPT, so a late out-of-order record older
    *    than the tombstone still loses the comparison-column race after the
    *    purge, exactly as before it.
    *
    * Invariant (the spec's core assertion): `upsertSnapshot(purged log)`
    * serves the same rows as `upsertSnapshot(original log)`. Storage
    * shrinks from O(updates) to O(live keys); the groupBy max_by is one
    * shuffle on the key — the same cost class as a snapshot query. Flat-dir
    * snapshot/staging/swap, same concurrency contract as [[compact]]. */
  def purgeUpsertLog(
      spark: SparkSession,
      logDir: String,
      tombstoneHorizonMicros: Long,
      dropSinkLog: Boolean = true): PartitionStats = {
    import org.apache.spark.sql.functions._
    val fs = fsOf(spark, logDir)
    val root = new Path(logDir)
    val snapshot = dataFiles(fs, root)
    require(snapshot.nonEmpty, s"no data files under $logDir")
    val log = spark.read.parquet(snapshot.map(_.getPath.toString): _*)
    val cols = log.columns.map(col)
    val latest = log
      .groupBy(col("k"))
      .agg(max_by(struct(cols.toIndexedSeq: _*),
        struct(col("event_micros"), col("payload"))).as("r"))
      .select(col("r.*"))
    val kept = latest.filter(
      !(col("deleted") && col("event_micros") < tombstoneHorizonMicros))
    val tmp = new Path(root, ".purge_tmp")
    kept.write.mode("overwrite").parquet(tmp.toString)
    val staged = dataFiles(fs, tmp)
    snapshot.foreach(s => fs.delete(s.getPath, false))
    val stamp = System.currentTimeMillis()
    staged.zipWithIndex.foreach { case (s, i) =>
      fs.rename(s.getPath, new Path(root, s"purged-$stamp-$i.parquet"))
    }
    fs.delete(tmp, true)
    if (dropSinkLog) fs.delete(new Path(root, "_spark_metadata"), true)
    val after = dataFiles(fs, root)
    PartitionStats(root.getName, after.length, after.map(_.getLen).sum)
  }
}
