package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) two-column layout — the multi-dimensional
  * generalization of [[SortedLayout]]: interleave the bit patterns of both
  * columns' QUANTILE RANKS and range-partition the write on the interleaved
  * value, so every parquet file covers a small axis-aligned rectangle of
  * the (colA, colB) domain instead of a full-domain stripe.
  *
  * Why this matters at 100 TB: a single-column sorted layout prunes
  * perfectly on its sort column and NOT AT ALL on any other — every file's
  * footer range for the second column spans the whole domain. Z-ordering
  * spends the same write (one range exchange, identical file count/bytes)
  * and buys BOTH columns footer selectivity ~sqrt(|files|): a predicate on
  * either column keeps O(sqrt(F)) of F files, a 2-D box keeps O(1). This
  * is the Delta/Iceberg OPTIMIZE ZORDER mechanism, built here on the
  * engine's own footer-manifest pruning.
  *
  * No new pruning machinery: [[register]] installs one footer-range
  * manifest PER COLUMN on the same directory (the round-7 multi-manifest
  * registry — Pinot's sortedColumn + bloomFilterColumns shape), and
  * [[graft.plans.SegmentPruningRule]] already INTERSECTS per-column
  * decisions, so 2-D boxes prune multiplicatively with no query rewrite.
  *
  * Determinism/correctness posture: the quantile boundaries only shape the
  * LAYOUT; pruning decisions read the files' real footer (min,max) stats,
  * so a skewed or stale boundary estimate can degrade pruning quality but
  * can never produce a wrong answer.
  */
object ZOrderLayout {

  /** Rank of `v` among the sorted boundary literals = how many boundaries
    * are <= v. 255 comparisons per row per column, map-only, one-time
    * layout cost. */
  private def binOf(v: Column, bounds: Seq[Double]): Column =
    size(filter(array(bounds.map(lit): _*), b => b <= v.cast("double")))

  /** Morton interleave of two `bits`-bit bins: colA occupies the odd bit
    * positions (ties broken toward colA locality), colB the even ones. */
  private def morton(binA: Column, binB: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(binA, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(binB, i).bitwiseAND(lit(1)), 2 * i)
    }.reduce(_ + _)

  /** Write `df` z-ordered on (`colA`, `colB`) into `nFiles` files: one
    * approx-quantile pass derives 2^bits-1 boundary literals per column
    * (driver state = 2·255 doubles), then the z-value is a map-only
    * expression and the exchange is a single repartitionByRange — the
    * SortedLayout write cost, two pruned dimensions. */
  def write(df: DataFrame, dir: String, colA: String, colB: String,
      nFiles: Int, bits: Int = 8): Unit = {
    require(bits >= 1 && bits <= 15, s"bits in 1..15, got $bits")
    val nb = (1 << bits) - 1
    val qs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val row = df.agg(
      percentile_approx(col(colA).cast("double"), lit(qs), lit(10000)).as("a"),
      percentile_approx(col(colB).cast("double"), lit(qs), lit(10000)).as("b"))
      .head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"z-order columns must be numeric-castable with non-null values " +
        s"($colA, $colB — a non-numeric string column quantiles to null)")
    val ba = row.getSeq[Double](0)
    val bb = row.getSeq[Double](1)
    df.withColumn("_z", morton(binOf(col(colA), ba), binOf(col(colB), bb), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Enable transparent pruning on BOTH z-ordered columns for this session:
    * two footer-range manifests on one directory; the rule intersects
    * their decisions per query. */
  def register(spark: SparkSession, dir: String, colA: String,
      colB: String): Unit = {
    graft.plans.SegmentPruning.register(spark, dir, colA)
    graft.plans.SegmentPruning.register(spark, dir, colB)
  }
}
