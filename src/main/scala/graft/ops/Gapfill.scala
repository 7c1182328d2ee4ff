package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling — the Spark-native answer to Pinot's GAPFILL
  * table function (reference surface: Pinot 1.2.0 per
  * `/root/reference/resources/bastion/bastionUserData.sh:7`), generalized
  * over Pinot's FILL options (round-3 verdict item #4):
  *
  *   - `FillPrevious`        — carry the last observed value forward
  *                             (Pinot FILL(.. 'FILL_PREVIOUS_VALUE')), with
  *                             0.0 before a key's first observation;
  *   - `FillDefault(value)`  — plug every gap with a constant
  *                             (Pinot FILL(.. 'FILL_DEFAULT_VALUE')),
  *                             including gaps BEFORE the first observation.
  *
  * Scale posture (same as q_events_gapfill, now parameterized): the raw
  * relation is scanned exactly ONCE into the per-(key, bucket) aggregate;
  * bounds and the key list both derive from that tiny aggregate (the bounds
  * travel as a broadcast one-row frame, never a collect); the exploded
  * spine is #keys × #buckets — bounded by the requested time range and
  * bucket width, not the data volume. The carry-forward window partitions
  * by key over spine rows only.
  */
object Gapfill {

  sealed trait FillMode
  /** Carry-forward (last observed value); 0.0 before the first observation. */
  case object FillPrevious extends FillMode
  /** Constant fill for every gap, before and after the first observation. */
  final case class FillDefault(value: Double) extends FillMode

  /** Fill an evenly-bucketed per-key series.
    *
    * @param events       raw relation
    * @param keyCol       series identity column name
    * @param tsMicros     event time as integer micros
    * @param value        value column to aggregate per bucket
    * @param bucketMicros explicit bucket width in micros (Pinot GAPFILL's
    *                     bucket-size argument)
    * @param fill         gap fill mode
    * @param boundsBuckets explicit [first, last] bucket indices (Pinot
    *                     GAPFILL's start/end arguments, already divided by
    *                     the bucket width); None derives the observed
    *                     global [min, max] from the data. With explicit
    *                     bounds, observations outside the range are
    *                     excluded before filling — Pinot's inner query is
    *                     range-filtered by its WHERE, this is the
    *                     equivalent safety cut.
    * @return (keyCol, bucket, v_filled, was_gap) — one row per key × bucket
    *         over the bucket range, total order left to the caller
    */
  def gapfill(
      events: DataFrame,
      keyCol: String,
      tsMicros: Column,
      value: Column,
      bucketMicros: Long,
      fill: FillMode,
      boundsBuckets: Option[(Long, Long)] = None): DataFrame = {
    val b = events.select(col(keyCol), (tsMicros.cast("long") / bucketMicros)
      .cast("long").as("bucket"), value.as("__v"))
    val ranged = boundsBuckets match {
      case Some((b0, b1)) => b.filter(col("bucket").between(b0, b1))
      case None => b
    }
    // bounds and the key list both derive from the TINY bucketed aggregate,
    // so the raw relation is scanned exactly once
    val actual = ranged.groupBy(col(keyCol), col("bucket"))
      .agg(round(sum(col("__v")), 2).as("v"))
      .persist()
    val bounds = boundsBuckets match {
      case Some((b0, b1)) =>
        events.sparkSession.range(1).select(lit(b0).as("b0"), lit(b1).as("b1"))
      case None =>
        actual.agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
    }
    val spine = actual.select(col(keyCol)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(keyCol), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val joined = spine.join(actual, Seq(keyCol, "bucket"), "left")
    val filled = fill match {
      case FillPrevious =>
        val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        coalesce(last(col("v"), ignoreNulls = true).over(w), lit(0.0))
      case FillDefault(d) =>
        coalesce(col("v"), lit(d))
    }
    joined
      .withColumn("v_filled", round(filled, 2))
      .withColumn("was_gap", col("v").isNull)
      .select(col(keyCol), col("bucket"), col("v_filled"), col("was_gap"))
  }
}
