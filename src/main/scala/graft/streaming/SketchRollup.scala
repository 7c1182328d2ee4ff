package graft.streaming

import graft.expressions.ThetaSketch._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Realtime sketch-column maintenance — the streaming half of the
  * q_sketch_rollup / star-tree functionColumnPairs pattern: Pinot's
  * consuming segments build per-segment sketch columns as rows land
  * (the reference deploys stock Pinot 1.2 whose realtime tables do this
  * for configured DISTINCTCOUNTHLL/theta aggregationConfigs;
  * `/root/reference/resources/pinot/resources/kinesisTableConfigFile.json`
  * is the realtime config surface).
  *
  * Spark-first shape: an APPEND-ONLY cell log. Each micro-batch aggregates
  * its own rows to one theta sketch per (day, event_type) cell and appends
  * those cells — no read-modify-write, no state store, no watermark.
  * Correctness falls out of sketch algebra: theta union is associative,
  * commutative, and idempotent on the value SET, so readers merging all
  * cell fragments for a key get exactly the distinct-count of every row
  * ever ingested — late data just appends more fragments for an old day,
  * and re-ingested users can never inflate the count (unlike additive
  * rollups, where late replays double-count).
  *
  * 100 TB posture: the log grows by |touched cells| per trigger, each cell
  * ≤ 2^lgK entries — bytes per trigger are bounded by cell fan-out, not row
  * volume. `compact` folds the fragments back to one row per cell (the
  * minion merge-rollup analog, cf. streaming/SegmentCompaction) so the
  * merge-on-read stays O(cells).
  */
object SketchRollup {

  /** Start appending per-batch sketch cells for `events` (needs ts,
    * event_type, user_id). One parquet fragment set per micro-batch. */
  def cellSink(
      events: DataFrame,
      cellDir: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 minutes"),
      lgK: Int = 12): DataStreamWriter[Row] =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch
          .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
          .agg(thetaSketchAgg(col("user_id"), lgK).as("sk"))
          .write.mode("append").parquet(cellDir)
      }

  /** Merge-on-read view: one row per (day, event_type) with the unioned
    * sketch — the frame q_sketch_rollup-style queries aggregate further. */
  def cells(spark: SparkSession, cellDir: String, lgK: Int = 12): DataFrame =
    spark.read.parquet(cellDir)
      .groupBy(col("day"), col("event_type"))
      .agg(thetaUnionAgg(col("sk"), lgK).as("sk"))

  /** Fold accumulated fragments to one row per cell (run periodically, like
    * the reference's minion merge-rollup task). Staged write + directory
    * swap — a direct self-overwrite would delete the input before the lazy
    * read runs. Run while the cell stream is paused (between triggers):
    * appends landing inside the delete/rename window would be lost, the
    * same exclusivity the reference's RealtimeToOfflineSegmentsTask takes
    * on a time range. */
  def compact(spark: SparkSession, cellDir: String, lgK: Int = 12): Unit = {
    val staged = cellDir.stripSuffix("/") + "__compacting"
    cells(spark, cellDir, lgK).repartition(1).write.mode("overwrite").parquet(staged)
    val src = new org.apache.hadoop.fs.Path(staged)
    val dst = new org.apache.hadoop.fs.Path(cellDir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    fs.rename(src, dst)
  }
}
