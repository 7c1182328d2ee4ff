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
