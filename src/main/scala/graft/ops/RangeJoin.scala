package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — points matched to every interval containing
  * them. Spark plans a bare `p BETWEEN lo AND hi` join as
  * BroadcastNestedLoop/cartesian, which dies when both sides are large; the
  * scale form is BINNING: explode each interval to the fixed-width bins it
  * overlaps, assign each point to its bin, equi-join on bin, refine with
  * the exact predicate. Candidates per point = intervals overlapping its
  * bin — O(local density), never |points|×|intervals|; the equi-join on
  * `__bin` shuffles/broadcasts like any other key join and AQE picks the
  * strategy. Pick binWidth ≈ typical interval width: much wider → more
  * false candidates per bin; much narrower → interval explode amplifies. */
object RangeJoin {

  /** Derive a good bin width from the interval side with ONE cheap stats
    * pre-pass: the approx-median interval width (bins-per-interval ≈ 1–2, so
    * the explode amplification is bounded while candidates-per-point stay
    * O(local density)). Median beats mean under width skew — a few huge
    * intervals would inflate the mean and put thousands of points per bin.
    * The scan reads only (lo, hi) after column pruning; at 100 TB the
    * interval side is typically the small side of the join, and the pass is
    * a single partial-aggregated sketch (no shuffle of data rows). Falls
    * back to the mean when the median is 0 (>=50% zero-width intervals),
    * then to 1.0 (any width is correct for pure point intervals). */
  def deriveBinWidth(intervals: DataFrame, loCol: String, hiCol: String): Double = {
    val row = intervals.select(
      percentile_approx((col(hiCol) - col(loCol)).cast("double"), lit(0.5), lit(100)).as("med"),
      avg(col(hiCol) - col(loCol)).as("mean")).first()
    val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
    val mean = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
    if (med > 0) med else if (mean > 0) mean else 1.0
  }

  /** No-tuning form: bin width auto-derived via [[deriveBinWidth]]. */
  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String): DataFrame =
    binnedRangeJoin(points, intervals, pointCol, loCol, hiCol,
      deriveBinWidth(intervals, loCol, hiCol))

  def binnedRangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double): DataFrame = {
    // fan the points side out first: when the interval side broadcasts,
    // points never hit a shuffle, so an under-parallelized scan would run
    // the whole bin-assign + join + refine chain on one task (ops/Par)
    val pBinned = Par.fanOut(points).withColumn("__bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iBinned = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pBinned.join(iBinned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
