package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-parallelism guard for CPU-heavy per-row pipelines.
  *
  * A small parquet fixture is often ONE file with ONE row group, which
  * Spark reads as a single task — and every narrow (map-side) stage after
  * it (gram hashing, minhash, bin explode) then runs single-threaded until
  * the first shuffle, leaving 31 of 32 local cores idle. Measured on the
  * sf0.1 fixtures: the identical data rewritten as 5 row groups ran
  * q_join_range 3.3 → 1.8 s with zero plan changes.
  *
  * `fanOut` repartitions ONLY when the source is under-parallelized
  * (fewer partitions than half the session's default parallelism). At
  * production scale the input is thousands of files/row groups, the guard
  * is a no-op, and no gratuitous full shuffle is added — which is why this
  * is a conditional and not a blanket `.repartition`.
  */
object Par {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < math.max(2, target / 2)) df.repartition(target)
    else df
  }
}
