package graft

import graft.streaming.EventIngest
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13 evidence without a broker: the Kafka branch shares `decode` with the
  * file-replay source, so parity is provable on Kafka-SHAPED frames — the
  * exact schema `format("kafka")` emits — in both static and streaming
  * execution. (The connector jar itself isn't in this container; the wiring
  * in `readKafkaJson` compiles against the same decode path.) */
class KafkaDecodeSpec extends GraftSuite {

  private val jsonLines = Seq(
    """{"userID":"u1","productName":"p1","color":"red","department":"d1","product":"pr","campaign":"c1","price":42,"creationTimestamp":"2026-01-02 03:04:05"}""",
    """{"userID":"u2","productName":"p2","color":"blue","department":"d2","product":"pr2","campaign":"c2","price":7,"creationTimestamp":"2026-01-03 10:00:00"}""")

  /** Kafka-shaped static frame carrying the JSON lines as value bytes. */
  private def kafkaFrame = {
    val rows = jsonLines.zipWithIndex.map { case (s, i) =>
      Row(null, s.getBytes("UTF-8"), "events", 0, i.toLong,
        new java.sql.Timestamp(1735776000000L + i), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), EventIngest.kafkaRecordSchema)
  }

  test("decodeKafka produces row-identical output to the file-replay decode") {
    import spark.implicits._
    val viaKafka = EventIngest.decodeKafka(kafkaFrame)
      .orderBy(col("userID")).collect().toSeq
    val viaFile = EventIngest.decode(
        spark.read.schema(EventIngest.rawSchema).json(jsonLines.toDS()))
      .orderBy(col("userID")).collect().toSeq
    assert(viaKafka === viaFile)
    assert(viaKafka.head.getAs[java.sql.Timestamp]("ts") != null)
    assert(viaKafka.head.getAs[java.sql.Date]("dt").toString === "2026-01-02")
  }

  test("decodeKafka output schema matches the ingest pipeline contract") {
    val schema = EventIngest.decodeKafka(kafkaFrame).schema
    assert(schema.fieldNames.toSeq ===
      EventIngest.rawSchema.fieldNames.toSeq ++ Seq("ts", "dt"))
    assert(schema("ts").dataType === TimestampType)
    assert(schema("dt").dataType === DateType)
  }

  test("decodeKafka runs under streaming execution (memory sink round-trip)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    // the memory stream plays the broker: value bytes + literal metadata
    val kafkaShaped = mem.toDF()
      .select(
        lit(null).cast(BinaryType).as("key"),
        col("value"),
        lit("events").as("topic"),
        lit(0).as("partition"),
        lit(0L).as("offset"),
        current_timestamp().as("timestamp"),
        lit(0).as("timestampType"))
    val q = EventIngest.decodeKafka(kafkaShaped)
      .writeStream.format("memory").queryName("kafka_decode_test")
      .outputMode("append").start()
    try {
      mem.addData(jsonLines.map(_.getBytes("UTF-8")): _*)
      q.processAllAvailable()
      val got = spark.table("kafka_decode_test")
      assert(got.count() === 2)
      assert(got.filter(col("price") === 42 && col("userID") === "u1").count() === 1)
    } finally q.stop()
  }
}
