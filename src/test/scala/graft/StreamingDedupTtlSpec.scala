package graft

import graft.streaming.EventIngest
import org.apache.spark.sql.functions._

/** Pinot dedupConfig metadataTTL analog: dedup state lives for the TTL and
  * is then evicted — duplicates inside the TTL are suppressed even when the
  * redelivered copy carries a skewed timestamp, and a key that returns
  * AFTER its state expired is admitted again. Driven through real
  * micro-batched execution so watermark-driven eviction actually happens. */
class StreamingDedupTtlSpec extends GraftSuite {

  private def ev(user: String, price: Int, ts: String): String =
    s"""{"userID":"$user","productName":"p","color":"c","department":"d",""" +
      s""""product":"x","campaign":"NONE","price":$price,"creationTimestamp":"$ts"}"""

  test("TTL dedup: in-TTL duplicates suppressed (skewed ts too), expired key re-admitted") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
    val q = EventIngest.dedupWithTtl(decoded, Seq("userID"), "10 minutes")
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").start()
    try {
      // b1: u1 delivered twice with DIFFERENT event times (redelivery with
      // timestamp skew — plain dropDuplicates(key, ts) would pass both)
      mem.addData(
        ev("u1", 1, "2024-05-01 10:00:00"), ev("u1", 1, "2024-05-01 10:02:00"),
        ev("u2", 2, "2024-05-01 10:01:00"))
      q.processAllAvailable()
      // b2: u1 again inside the TTL → suppressed; u3 advances the watermark
      // to 10:20, past u1's 10:00 + 10 min state deadline → eviction
      mem.addData(ev("u1", 1, "2024-05-01 10:04:00"), ev("u3", 3, "2024-05-01 10:30:00"))
      q.processAllAvailable()
      // b3: u1 returns after expiry → admitted as a fresh key (Pinot after
      // metadata TTL); u3 still in-TTL → suppressed
      mem.addData(ev("u1", 9, "2024-05-01 10:25:00"), ev("u3", 3, "2024-05-01 10:31:00"))
      q.processAllAvailable()

      val out = spark.table("dedup_ttl_out")
        .select(col("userID"), col("price")).collect()
        .map(r => (r.getString(0), r.getInt(1)))
      val byUser = out.groupBy(_._1).view.mapValues(_.length).toMap
      assert(byUser === Map("u1" -> 2, "u2" -> 1, "u3" -> 1),
        s"got $byUser from ${out.toSeq}")
      // the re-admitted u1 is the post-expiry event, not a duplicate
      assert(out.count(_ == ("u1", 9)) === 1)
      assert(out.count(_ == ("u1", 1)) === 1)
    } finally q.stop()
  }
}
