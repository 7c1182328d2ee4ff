package graft

import graft.streaming.EventIngest
import org.apache.spark.sql.functions._

/** Pinot upsertConfig metadataTTL analog: upsert state is evicted once the
  * watermark passes a key's newest event time + TTL, so the state store
  * tracks keys-per-TTL-window instead of key lifetime — proven from the
  * stream's own stateOperators metrics, with live keys still serving
  * latest-wins exactly like the untimed upsert. */
class StreamingUpsertTtlSpec extends GraftSuite {

  private def ev(user: String, price: Int, ts: String): String =
    s"""{"userID":"$user","productName":"p","color":"c","department":"d",""" +
      s""""product":"x","campaign":"NONE","price":$price,"creationTimestamp":"$ts"}"""

  test("expired keys leave the state store; live keys keep latest-wins semantics") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
    val q = EventIngest.upsertLatestWithTtl(decoded, "userID", "10 minutes")
      .writeStream.format("memory").queryName("upsert_ttl_log")
      .outputMode("update").start()
    try {
      // b1: two keys; u1 also gets an out-of-order OLDER event (ignored)
      mem.addData(
        ev("u1", 42, "2024-05-01 10:00:00"), ev("u1", 7, "2024-05-01 09:59:00"),
        ev("u2", 10, "2024-05-01 10:05:00"))
      q.processAllAvailable()
      // b2: u3 pushes the watermark to 10:50 — u1 (deadline 10:10) and u2
      // (deadline 10:15) both expire; u3's own state stays
      mem.addData(ev("u3", 3, "2024-05-01 11:00:00"))
      q.processAllAvailable()
      // b3: trigger the timeout processing batch and land a fresh u1
      mem.addData(ev("u1", 99, "2024-05-01 11:05:00"))
      q.processAllAvailable()

      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows === 2L,
        s"expected only u3+fresh u1 in state after TTL expiry, got $stateRows")

      // the update log: u1@42 (b1), u2@10 (b1), u3@3 (b2), u1@99 (b3) —
      // and NO phantom rows from the timeout path
      val out = spark.table("upsert_ttl_log")
        .select(col("k"), get_json_object(col("payload"), "$.price").cast("int").as("price"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(out.count(_ == ("u1", 42)) === 1)
      assert(out.count(_ == ("u1", 7)) === 0, "older event must never serve")
      assert(out.count(_ == ("u1", 99)) === 1, "post-expiry record starts fresh")
      assert(out.count(_._1 == "u2") === 1 && out.count(_._1 == "u3") === 1)

      // latest-per-key snapshot over the log still serves the newest rows
      val snap = EventIngest.upsertSnapshot(spark.table("upsert_ttl_log"))
        .select(col("k"), get_json_object(col("payload"), "$.price").cast("int").as("price"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(snap === Map("u1" -> 99, "u2" -> 10, "u3" -> 3))
    } finally q.stop()
  }
}
