package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing harness for the dedup-family pipeline split
  * (GRAFT_CC_DEBUG for CC rounds): per pass, q_dedup_ngram_jaccard first
  * (materializes the shared pair pipeline), then q_dedup_clusters (pays
  * only the CC stage on top of the cache) — isolating where the time goes. */
object CcTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.Tables.t(spark, sfDir, "documents").count()
    for (pass <- 1 to 2) {
      spark.catalog.clearCache()
      for (name <- Seq("q_dedup_ngram_jaccard", "q_dedup_clusters")) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        System.err.println(f"[cc-timer] pass $pass $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
