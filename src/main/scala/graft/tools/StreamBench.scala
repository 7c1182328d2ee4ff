package graft.tools

import graft.streaming.EventIngest
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming ingest throughput benchmark: replay N synthetic KDG events
  * (the reference's only ingest schema) through the full pipeline —
  * JSON-lines source → decode → day-partitioned parquet sink with
  * checkpointing — and report rows/s. Mirrors the reference's 2-shard
  * Kinesis capacity claim (~2000 rec/s, apache-pinot-solution-stack.ts:733)
  * so BASELINE.md can track ingest-freshness regressions. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "200000").toInt
    val nFiles = 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = Files.createTempDirectory("graft-sb-src").toString
    val sink = Files.createTempDirectory("graft-sb-sink").toString
    val ckpt = Files.createTempDirectory("graft-sb-ckpt").toString

    val campaigns = Array("BlackFriday", "10Percent", "NONE")
    val perFile = nRows / nFiles
    (0 until nFiles).foreach { f =>
      val sb = new StringBuilder(perFile * 160)
      var i = 0
      while (i < perFile) {
        val n = f * perFile + i
        val day = 1 + (n % 28)
        val sec = n % 86400
        val ts = f"2024-05-$day%02d ${sec / 3600}%02d:${sec % 3600 / 60}%02d:${sec % 60}%02d"
        sb.append(s"""{"userID":"u${n % 5000}","productName":"p${n % 100}","color":"c${n % 7}",""")
          .append(s""""department":"d${n % 11}","product":"x${n % 31}",""")
          .append(s""""campaign":"${campaigns(n % 3)}","price":${n % 500},"creationTimestamp":"$ts"}""")
          .append('\n')
        i += 1
      }
      Files.write(Paths.get(src, f"batch_$f%03d.json"), sb.toString.getBytes("UTF-8"))
    }

    val t0 = System.nanoTime()
    val q = EventIngest.sealedSink(
      EventIngest.readJsonLines(spark, src, maxFilesPerTrigger = 4),
      sink, ckpt, Trigger.AvailableNow()).start()
    q.awaitTermination()
    val secs = (System.nanoTime() - t0) / 1e9

    val landed = spark.read.parquet(sink).count()
    val rate = landed / secs
    val line = f"""{"metric":"ingest_rows_per_sec","value":$rate%.0f,"unit":"rows/sec","rows":$landed,"seconds":$secs%.2f}"""
    println(line)
    try Files.writeString(Paths.get("/tmp/stream_bench.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
