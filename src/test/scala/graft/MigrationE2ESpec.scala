package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.catalog.TableSpec
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** The migration narrative end-to-end: a reference user brings (1) their
  * Pinot schema/table-config JSON (the kinesisTable shapes — re-authored
  * content), (2) their KDG-template event stream, and (3) the queries they
  * type into the Pinot console — and everything runs here unmodified:
  * spec-driven DDL → typed decode with the spec's SIMPLE_DATE_FORMAT time
  * column → Pinot-vocabulary SQL over the broker wire protocol
  * (POST /query/sql), answers cross-checked against Spark-native
  * computations on the parent session. */
class MigrationE2ESpec extends GraftSuite {

  private val schemaJson =
    """{
      |  "schemaName": "kinesisMigration",
      |  "dimensionFieldSpecs": [
      |    {"name": "userID", "dataType": "STRING"},
      |    {"name": "productName", "dataType": "STRING"},
      |    {"name": "color", "dataType": "STRING"},
      |    {"name": "department", "dataType": "STRING"},
      |    {"name": "product", "dataType": "STRING"},
      |    {"name": "campaign", "dataType": "STRING"}
      |  ],
      |  "metricFieldSpecs": [{"name": "price", "dataType": "INT"}],
      |  "dateTimeFieldSpecs": [
      |    {"name": "creationTimestamp", "dataType": "STRING",
      |     "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss", "granularity": "1:DAYS"}
      |  ]
      |}""".stripMargin

  private val configJson =
    """{
      |  "tableName": "kinesisMigration",
      |  "tableType": "REALTIME",
      |  "segmentsConfig": {
      |    "timeColumnName": "creationTimestamp",
      |    "retentionTimeUnit": "DAYS", "retentionTimeValue": "7"
      |  }
      |}""".stripMargin

  // KDG template shape (reference README): userID 1-100, campaign enum
  // BlackFriday|10Percent|NONE, price 10-150, SDF timestamps
  private def kdgEvents(n: Int): Seq[String] = {
    val campaigns = Seq("BlackFriday", "10Percent", "NONE")
    (0 until n).map { i =>
      val uid = 1 + (i * 37) % 100
      val price = 10 + (i * 13) % 141
      val campaign = campaigns(i % 3)
      val minute = i % 60
      val hour = 10 + (i / 60) % 3
      s"""{"userID":"$uid","productName":"p${i % 7}","color":"c${i % 5}",""" +
        s""""department":"d${i % 4}","product":"x${i % 6}","campaign":"$campaign",""" +
        s""""price":$price,"creationTimestamp":"2024-05-0${1 + i % 2} $hour:${f2(minute)}:00"}"""
    }
  }
  private def f2(v: Int): String = f"$v%02d"

  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  private lazy val pinot: org.apache.spark.sql.SparkSession = {
    val s = spark.newSession()
    PinotFunctions.register(s)
    s
  }

  private lazy val events: org.apache.spark.sql.DataFrame = {
    val spec = TableSpec.parse(schemaJson, configJson)
    import spark.implicits._
    val raw = spark.read.schema(spec.schema).json(kdgEvents(600).toDS())
    // the spec's dateTime format drives the typed time column
    val fmt = spec.fields.find(_.name == "creationTimestamp").get.format.get
      .split("\\|", 2)(1)
    raw.withColumn("ts", to_timestamp(col("creationTimestamp"), fmt))
  }

  private lazy val httpServer = {
    val local = pinot.createDataFrame(events.collectAsList(), events.schema)
    local.createOrReplaceTempView("kinesisMigration")
    server.HttpSqlEndpoint.start(pinot, port = 0, maxRows = 1000)
  }

  private def post(sql: String): com.fasterxml.jackson.databind.JsonNode = {
    val body = mapper.createObjectNode()
    body.put("sql", sql)
    val req = HttpRequest.newBuilder(
        URI.create(s"http://localhost:${httpServer.getAddress.getPort}/query/sql"))
      .POST(HttpRequest.BodyPublishers.ofString(
        mapper.writeValueAsString(body), StandardCharsets.UTF_8))
      .header("Content-Type", "application/json")
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() === 200, resp.body())
    val r = mapper.readTree(resp.body())
    assert(r.get("exceptions").size() === 0, r.toString.take(400))
    r
  }

  test("spec-driven DDL decodes the KDG event shape with the SDF time column") {
    assert(events.count() === 600)
    assert(events.schema("price").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(events.filter(col("ts").isNull).count() === 0)
  }

  test("console query 1: campaign rollup with Pinot vocabulary over the wire") {
    val rows = post(
      """SELECT campaign, COUNT(*) AS n, SUM(price) AS total,
        |       MINMAXRANGE(price) AS rng
        |FROM kinesisMigration GROUP BY campaign ORDER BY campaign""".stripMargin)
      .get("resultTable").get("rows")
    val expect = events.groupBy(col("campaign"))
      .agg(count(lit(1)), sum(col("price")), max(col("price")) - min(col("price")))
      .orderBy(col("campaign")).collect()
    assert(rows.size() === expect.length)
    expect.zipWithIndex.foreach { case (er, i) =>
      assert(rows.get(i).get(0).asText() === er.getString(0))
      assert(rows.get(i).get(1).asLong() === er.getLong(1))
      assert(rows.get(i).get(2).asLong() === er.getLong(2))
      assert(rows.get(i).get(3).asInt() === er.getInt(3))
    }
  }

  test("console query 2: DISTINCTCOUNTHLL / DISTINCTCOUNT / PERCENTILE") {
    val r = post(
      """SELECT DISTINCTCOUNT(userID) AS dc, DISTINCTCOUNTHLL(userID) AS hll,
        |       PERCENTILE(price, 50) AS p50
        |FROM kinesisMigration""".stripMargin).get("resultTable").get("rows").get(0)
    val exact = events.select(countDistinct(col("userID"))).collect().head.getLong(0)
    assert(r.get(0).asLong() === exact)
    assert(math.abs(r.get(1).asLong() - exact) <= math.max(1L, (exact * 0.05).toLong))
    // compute the expectation on the PARENT session (percentile is
    // redefined 0-100 on the pinot session — CLAUDE.md gotcha)
    val p50 = events.select(expr("percentile(price, 0.5)")).collect().head.getDouble(0)
    assert(math.abs(r.get(2).asDouble() - p50) < 1e-9)
  }

  test("console query 3: DATETIMECONVERT day bucketing with a time filter") {
    val rows = post(
      """SELECT DATETRUNC('day', ts) AS day, COUNT(*) AS n
        |FROM kinesisMigration
        |WHERE campaign <> 'NONE' AND price BETWEEN 20 AND 120
        |GROUP BY DATETRUNC('day', ts) ORDER BY day""".stripMargin)
      .get("resultTable").get("rows")
    val expect = events
      .filter(col("campaign") =!= "NONE" && col("price").between(20, 120))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1))).orderBy(col("day")).collect()
    assert(rows.size() === expect.length)
    expect.zipWithIndex.foreach { case (er, i) =>
      assert(rows.get(i).get(1).asLong() === er.getLong(1))
    }
  }
}
