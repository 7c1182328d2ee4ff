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

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // opt-in bucketed layout (registerBucketed): sessions that registered a
    // bucketed copy of a fact table read it transparently, so every declared
    // query picks up the shuffle-free co-located join plan unchanged.
    // Routing is bound to the sfDir the copy was built from — a read for a
    // DIFFERENT sfDir falls through to the plain parquet scan instead of
    // silently serving stale bucketed data.
    val bucketedFacts = spark.conf.get("graft.bucketed.facts", "")
    val bucketedDir = spark.conf.get("graft.bucketed.sfdir", "")
    if (bucketedFacts.nonEmpty && bucketedDir == normPath(sfDir) &&
        bucketedFacts.split(",").contains(name))
      spark.table(bucketedTableName(name, spark.conf.get("graft.bucketed.fp")))
    else if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Canonical spelling of an sfDir: routing compares normalized absolute
    * paths, so `/root/testdata/sf0.1/` and a relative spelling of the same
    * directory still hit the bucketed copy the session registered (advisor
    * round-3: raw string equality silently lost the shuffle-free plan). */
  private[graft] def normPath(dir: String): String =
    try java.nio.file.Paths.get(dir).toAbsolutePath.normalize.toString
    catch { case _: Throwable => dir }

  /** Table name carries a fingerprint of (sfDir, buckets) so a re-register
    * with different inputs can never collide with (and silently reuse) a
    * stale managed table from a prior run. */
  private[graft] def bucketedTableName(name: String, fp: String): String =
    s"graft_${name}_bucketed_$fp"

  private[graft] def fingerprint(sfDir: String, buckets: Int): String =
    java.lang.Long.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(s"${normPath(sfDir)}|$buckets") & 0xffffffffL)

  /** Default bucketing spec for the fact tables: both sides of the big
    * orders⋈lineitem edge bucketed on the join key (SCALE.md: the layout
    * that makes the 100 TB fact join shuffle-free, Pinot's partitioned
    * replica groups re-expressed as Spark bucketing). */
  val defaultFactBuckets: Map[String, String] =
    Map("lineitem" -> "l_orderkey", "orders" -> "o_orderkey")

  /** J7 opt-in: materialize bucketed copies of the fact tables as managed
    * tables (one-time layout cost, amortized over every subsequent join)
    * and route this session's `Tables.t` reads through them. */
  def registerBucketed(
      spark: SparkSession,
      sfDir: String,
      buckets: Int = 8,
      facts: Map[String, String] = defaultFactBuckets): Unit = {
    val dir = normPath(sfDir)
    val fp = fingerprint(dir, buckets)
    facts.foreach { case (name, key) =>
      val tbl = bucketedTableName(name, fp)
      if (!spark.catalog.tableExists(tbl)) {
        spark.read.parquet(s"$sfDir/$name.parquet")
          .write.mode("overwrite")
          .bucketBy(buckets, key).sortBy(key)
          .saveAsTable(tbl)
      }
    }
    spark.conf.set("graft.bucketed.facts", facts.keys.mkString(","))
    spark.conf.set("graft.bucketed.sfdir", dir)
    spark.conf.set("graft.bucketed.fp", fp)
  }

  /** `events.ts` has shipped as TIMESTAMP(NANOS) in some fixture generations
    * (vanilla Spark rejects it — read nanos as long and integer-divide; a
    * double division would lose precision above 2^53 ns) and as plain
    * TIMESTAMP(MICROS) in others (arrives as TimestampNTZ — cast to the
    * session-zone TimestampType our queries expect; values are identical
    * because every graft session pins spark.sql.session.timeZone=UTC).
    * Declared queries bucket `ts` before comparing with the DuckDB oracle
    * (FIXTURES.md caveat). */
  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
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
