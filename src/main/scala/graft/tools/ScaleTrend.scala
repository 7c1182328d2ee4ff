package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-trend harness (round-4 verdict item #6): times the heavy five
  * queries at two data scales and prints per-query seconds — the direct
  * evidence behind the ≲linear-growth claims in SCALE.md/BASELINE.md.
  * Usage: runMain graft.tools.ScaleTrend <dir1> <dir2 ...>
  * Queries run in bench (alphabetical) order so intra-family cache sharing
  * matches the recorded bench numbers; best-of-2 passes per dir. */
object ScaleTrend {
  private val heavy: Seq[String] = sys.env.get("SPARK_GRAFT_TREND_QUERIES")
    .map(_.split(',').toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(Seq(
      "q_dedup_clusters", "q_dedup_minhash", "q_dedup_ngram_jaccard",
      "q_join_range", "q_split_contamination"))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      val best = scala.collection.mutable.Map.empty[String, Double]
      for (_ <- 1 to 2) {
        spark.catalog.clearCache()
        heavy.foreach { name =>
          val t0 = System.nanoTime()
          graft.SparkEntry.queries(name)(spark, dir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          best(name) = math.min(dt, best.getOrElse(name, Double.MaxValue))
        }
      }
      heavy.foreach(n => System.err.println(f"[scale] $dir $n ${best(n)}%.2f s"))
    }
    spark.stop()
  }
}
