package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (round 12): the size-adaptive tfidf persist under AQE.
  * An UNMATERIALIZED cached AQE plan reports unknown partitioning at
  * explain time, so a cold explain shows ENSURE_REQUIREMENTS exchanges
  * that the materialized cache does not pay — this probe executes the
  * query once (building the cache) and explains the SECOND construction,
  * which is what the bench's steady state and every post-build consumer
  * actually plan against (the r11 pagerank per-round dump protocol). */
object ProbeTfidf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/fix100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries("q_text_tfidf")
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    println("===== q_text_tfidf, cache materialized =====")
    fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
