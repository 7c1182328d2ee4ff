package graft

import graft.streaming.EventIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pinot upsert realtime-table analog: latest-event-time-wins per key, with
  * the two contracts Pinot's upsert metadata map guarantees — a newer event
  * replaces the served row, and a LATE event with an OLDER timestamp never
  * regresses it. Driven through real micro-batched streaming execution. */
class StreamingUpsertSpec extends GraftSuite {

  private def ev(user: String, price: Int, ts: String): String =
    s"""{"userID":"$user","productName":"p","color":"c","department":"d",""" +
      s""""product":"x","campaign":"NONE","price":$price,"creationTimestamp":"$ts"}"""

  test("upsert serves the latest row per key; late out-of-order events never regress it") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
    val q = EventIngest.upsertLatest(decoded, "userID")
      .writeStream.format("memory").queryName("upsert_log")
      .outputMode("update").start()
    try {
      // batch 1: two keys
      mem.addData(ev("u1", 42, "2024-05-01 10:00:00"), ev("u2", 10, "2024-05-01 10:05:00"))
      q.processAllAvailable()
      // batch 2: u1 gets a NEWER event (replaces), u2 a LATE OLDER one (must not)
      mem.addData(ev("u1", 99, "2024-05-01 11:00:00"), ev("u2", 7, "2024-05-01 09:00:00"))
      q.processAllAvailable()

      val snap = EventIngest.upsertSnapshot(spark.table("upsert_log"))
        .select(col("k"),
          get_json_object(col("payload"), "$.price").cast("int").as("price"),
          get_json_object(col("payload"), "$.creationTimestamp").as("cts"))
        .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getString(2)))).toMap
      assert(snap.keySet === Set("u1", "u2"))
      assert(snap("u1") === ((99, "2024-05-01 11:00:00")), s"newer event must win: $snap")
      assert(snap("u2") === ((10, "2024-05-01 10:05:00")), s"older late event must not regress: $snap")

      // the update log carries one row per touched key per batch — the
      // Update-mode contract (2 keys × 2 batches here)
      assert(spark.table("upsert_log").count() === 4)
    } finally q.stop()
  }

  test("deleteRecordColumn: tombstone hides the key, older late delete is ignored, newer record revives") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    // delete marker rides on an existing field: campaign=DELETE_ME (the
    // Pinot deleteRecordColumn is just a truthy column on the record)
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
      .withColumn("is_delete", col("campaign") === "DELETE_ME")
    val q = EventIngest.upsertLatest(decoded, "userID", deleteCol = Some("is_delete"))
      .writeStream.format("memory").queryName("upsert_del_log")
      .outputMode("update").start()
    def served(): Map[String, Int] =
      EventIngest.upsertSnapshot(spark.table("upsert_del_log"))
        .select(col("k"), get_json_object(col("payload"), "$.price").cast("int").as("price"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    def del(user: String, ts: String): String =
      s"""{"userID":"$user","productName":"p","color":"c","department":"d",""" +
        s""""product":"x","campaign":"DELETE_ME","price":0,"creationTimestamp":"$ts"}"""
    try {
      mem.addData(ev("u1", 42, "2024-05-01 10:00:00"), ev("u2", 10, "2024-05-01 10:05:00"))
      q.processAllAvailable()
      assert(served() === Map("u1" -> 42, "u2" -> 10))
      // u1: NEWER tombstone → key disappears; u2: OLDER late tombstone → ignored
      mem.addData(del("u1", "2024-05-01 11:00:00"), del("u2", "2024-05-01 09:00:00"))
      q.processAllAvailable()
      assert(served() === Map("u2" -> 10), "newer tombstone hides u1; older delete cannot retro-kill u2")
      // a record NEWER than the tombstone revives the key
      mem.addData(ev("u1", 77, "2024-05-01 12:00:00"))
      q.processAllAvailable()
      assert(served() === Map("u1" -> 77, "u2" -> 10), "newer record revives a deleted key")
    } finally q.stop()
  }

  test("partial upsert + delete: post-revival merge starts fresh (no resurrection of pre-delete values)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
      .withColumn("is_delete", col("campaign") === "DELETE_ME")
    val q = EventIngest.upsertPartial(decoded, "userID",
        Map("price" -> EventIngest.Increment), deleteCol = Some("is_delete"))
      .writeStream.format("memory").queryName("upsert_pdel_log")
      .outputMode("update").start()
    try {
      mem.addData(ev("u1", 10, "2024-05-01 10:00:00"), ev("u1", 5, "2024-05-01 10:30:00"))
      q.processAllAvailable() // accumulated price = 15
      mem.addData(
        s"""{"userID":"u1","productName":"p","color":"c","department":"d","product":"x","campaign":"DELETE_ME","price":0,"creationTimestamp":"2024-05-01 11:00:00"}""")
      q.processAllAvailable() // tombstoned
      assert(EventIngest.upsertSnapshot(spark.table("upsert_pdel_log")).count() === 0)
      mem.addData(ev("u1", 3, "2024-05-01 12:00:00"))
      q.processAllAvailable()
      val r = EventIngest.upsertSnapshot(spark.table("upsert_pdel_log"))
        .select(get_json_object(col("payload"), "$.price").cast("long").as("price"))
        .collect()
      assert(r.length === 1)
      assert(r.head.getAs[Long]("price") === 3L,
        "INCREMENT must restart from the post-delete record, not resume 15+3")
    } finally q.stop()
  }

  test("partial upsert merges per column: INCREMENT sums, IGNORE keeps first, default overwrites") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val decoded = EventIngest.decode(
      mem.toDF().select(from_json(col("value"), EventIngest.rawSchema).as("j"))
        .select(col("j.*")))
    val q = EventIngest.upsertPartial(decoded, "userID", Map(
        "price" -> EventIngest.Increment,
        "campaign" -> EventIngest.Ignore))
      .writeStream.format("memory").queryName("upsert_partial_log")
      .outputMode("update").start()
    try {
      mem.addData(
        s"""{"userID":"u1","productName":"p","color":"red","department":"d","product":"x","campaign":"FIRST","price":10,"creationTimestamp":"2024-05-01 10:00:00"}""")
      q.processAllAvailable()
      mem.addData(
        // newer: price increments 10+5, campaign keeps FIRST, color overwrites
        s"""{"userID":"u1","productName":"p","color":"blue","department":"d","product":"x","campaign":"SECOND","price":5,"creationTimestamp":"2024-05-01 11:00:00"}""",
        // older than stored comparison value: dropped entirely
        s"""{"userID":"u1","productName":"p","color":"green","department":"d","product":"x","campaign":"STALE","price":100,"creationTimestamp":"2024-05-01 09:00:00"}""")
      q.processAllAvailable()

      val r = EventIngest.upsertSnapshot(spark.table("upsert_partial_log"))
        .select(
          get_json_object(col("payload"), "$.price").cast("long").as("price"),
          get_json_object(col("payload"), "$.campaign").as("campaign"),
          get_json_object(col("payload"), "$.color").as("color"))
        .collect().head
      assert(r.getAs[Long]("price") === 15L, r.toString)
      assert(r.getAs[String]("campaign") === "FIRST", r.toString)
      assert(r.getAs[String]("color") === "blue", r.toString)
    } finally q.stop()
  }

  test("partial upsert strategies MAX/MIN/APPEND/UNION complete the Pinot set") {
    import EventIngest._
    val merged = mergeJson(
      """{"hi":5,"lo":5,"tags":["a","b"],"all":["a","b"]}""",
      """{"hi":3,"lo":3,"tags":["b","c"],"all":["b","c"]}""",
      Map("hi" -> MaxOf, "lo" -> MinOf, "tags" -> UnionOf, "all" -> Append))
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(merged, classOf[java.util.Map[String, Object]])
    assert(m.get("hi") === 5)   // MAX keeps the larger stored value
    assert(m.get("lo") === 3)   // MIN takes the smaller incoming value
    assert(m.get("tags").toString === "[a, b, c]")     // UNION dedups, stored-first
    assert(m.get("all").toString === "[a, b, b, c]")   // APPEND concatenates
  }
}
