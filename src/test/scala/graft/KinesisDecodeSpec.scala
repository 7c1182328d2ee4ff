package graft

import graft.streaming.EventIngest
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1 evidence without the connector: the reference's ACTUAL stream is
  * Kinesis (`pinot-stream`, 2 shards, LATEST, low-level consumer) decoded
  * with the Kafka JSON decoder — i.e. the payload bytes are identical to the
  * Kafka branch. decodeKinesis shares `decode`, so parity is provable on
  * Kinesis-SHAPED frames (the schema `format("aws-kinesis")` emits) in both
  * static and streaming execution, and the option mapping from the
  * reference's streamConfigs is a pure function asserted here. */
class KinesisDecodeSpec extends GraftSuite {

  private val jsonLines = Seq(
    """{"userID":"u1","productName":"p1","color":"red","department":"d1","product":"pr","campaign":"c1","price":42,"creationTimestamp":"2026-01-02 03:04:05"}""",
    """{"userID":"u2","productName":"p2","color":"blue","department":"d2","product":"pr2","campaign":"c2","price":7,"creationTimestamp":"2026-01-03 10:00:00"}""")

  /** Kinesis-shaped static frame carrying the JSON lines as data bytes. */
  private def kinesisFrame = {
    val rows = jsonLines.zipWithIndex.map { case (s, i) =>
      Row(s.getBytes("UTF-8"), "pinot-stream", s"pk-$i", i.toString,
        new java.sql.Timestamp(1735776000000L + i))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), EventIngest.kinesisRecordSchema)
  }

  test("decodeKinesis produces row-identical output to the file-replay decode") {
    import spark.implicits._
    val viaKinesis = EventIngest.decodeKinesis(kinesisFrame)
      .orderBy(col("userID")).collect().toSeq
    val viaFile = EventIngest.decode(
        spark.read.schema(EventIngest.rawSchema).json(jsonLines.toDS()))
      .orderBy(col("userID")).collect().toSeq
    assert(viaKinesis === viaFile)
    assert(viaKinesis.head.getAs[java.sql.Date]("dt").toString === "2026-01-02")
  }

  test("decodeKinesis and decodeKafka agree byte-for-byte on the same payloads") {
    // the reference decodes Kinesis records with the KAFKA JSON decoder
    // (kinesisTableConfigFile.json:21) — the two branches must be one path
    val viaKafka = {
      val rows = jsonLines.zipWithIndex.map { case (s, i) =>
        Row(null, s.getBytes("UTF-8"), "events", 0, i.toLong,
          new java.sql.Timestamp(1735776000000L + i), 0)
      }
      EventIngest.decodeKafka(spark.createDataFrame(
        spark.sparkContext.parallelize(rows), EventIngest.kafkaRecordSchema))
    }
    assert(
      EventIngest.decodeKinesis(kinesisFrame).orderBy(col("userID")).collect().toSeq ===
        viaKafka.orderBy(col("userID")).collect().toSeq)
  }

  test("kinesisOptions maps the reference streamConfigs onto connector options") {
    val opts = EventIngest.kinesisOptions(region = "eu-west-1")
    // stream.kinesis.topic.name=pinot-stream / {AWSRegion} / LATEST /
    // consumer.type=lowlevel (kinesisTableConfigFile.json:15-20)
    assert(opts("streamName") === "pinot-stream")
    assert(opts("region") === "eu-west-1")
    assert(opts("startingPosition") === "LATEST")
    assert(opts("consumerType") === "GetRecords")
  }

  test("decodeKinesis runs under streaming execution (memory sink round-trip)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Array[Byte]]
    val kinesisShaped = mem.toDF()
      .select(
        col("value").as("data"),
        lit("pinot-stream").as("streamName"),
        lit("pk").as("partitionKey"),
        lit("0").as("sequenceNumber"),
        current_timestamp().as("approximateArrivalTimestamp"))
    val q = EventIngest.decodeKinesis(kinesisShaped)
      .writeStream.format("memory").queryName("kinesis_decode_test")
      .outputMode("append").start()
    try {
      mem.addData(jsonLines.map(_.getBytes("UTF-8")): _*)
      q.processAllAvailable()
      val got = spark.table("kinesis_decode_test")
      assert(got.count() === 2)
      assert(got.filter(col("price") === 42 && col("userID") === "u1").count() === 1)
    } finally q.stop()
  }
}
