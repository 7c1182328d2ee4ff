package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Each table is a plain parquet scan — Catalyst pushes filters and prunes
  * columns into the scan (SURVEY.md §4), which is the Spark equivalent of the
  * reference's segment pruning + columnar reads
  * (`/root/reference/README.md:22`, `kinesisTableConfigFile.json:13`).
  * At 100 TB these would be partitioned parquet/iceberg paths on S3; the API
  * surface is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is TIMESTAMP(NANOS) parquet, which vanilla Spark rejects.
    * Read nanos as long (legacy conf) and convert to a microsecond
    * TimestampType with integer division (a double division would lose
    * precision above 2^53 ns). Declared queries bucket `ts` before comparing
    * with the ns-precision DuckDB oracle (FIXTURES.md caveat). */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register every fixture as a temp view so `spark.sql` queries mirror the
    * reference's SQL-over-HTTP surface (SURVEY.md §2.1 S11). Memoized per
    * (session, dir): repeated SQL queries in one run skip the 10 parquet
    * footer reads. */
  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]())

  def registerViews(spark: SparkSession, sfDir: String): Unit =
    if (registered.add((spark, sfDir))) {
      all.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
    }
}
