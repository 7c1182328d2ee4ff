package graft

import graft.catalog.TableSpec
import org.apache.spark.sql.types._

/** Config-driven DDL (S10): our own spec JSON in the reference's *shape*
  * (same keys as kinesisTable.json / kinesisTableConfigFile.json — content
  * re-authored, not copied) parses into the expected Spark schema + props. */
class TableSpecSpec extends GraftSuite {

  private val schemaJson =
    """{
      |  "schemaName": "webEvents",
      |  "dimensionFieldSpecs": [
      |    {"name": "userID", "dataType": "STRING"},
      |    {"name": "campaign", "dataType": "STRING"},
      |    {"name": "tags", "dataType": "STRING", "singleValueField": false}
      |  ],
      |  "metricFieldSpecs": [
      |    {"name": "price", "dataType": "INT"}
      |  ],
      |  "dateTimeFieldSpecs": [
      |    {"name": "creationTimestamp", "dataType": "STRING",
      |     "format": "SIMPLE_DATE_FORMAT|yyyy-MM-dd HH:mm:ss", "granularity": "1:DAYS"}
      |  ]
      |}""".stripMargin

  private val configJson =
    """{
      |  "tableName": "webEvents",
      |  "tableType": "REALTIME",
      |  "segmentsConfig": {
      |    "timeColumnName": "creationTimestamp",
      |    "retentionTimeUnit": "DAYS",
      |    "retentionTimeValue": "7"
      |  },
      |  "tableIndexConfig": {
      |    "loadMode": "MMAP",
      |    "streamConfigs": {
      |      "realtime.segment.flush.threshold.rows": "0",
      |      "realtime.segment.flush.threshold.time": "2m",
      |      "realtime.segment.flush.threshold.segment.size": "150M"
      |    }
      |  }
      |}""".stripMargin

  test("schema spec parses with roles and MV columns") {
    val (name, fields) = TableSpec.parseSchema(schemaJson)
    assert(name === "webEvents")
    val byName = fields.map(f => f.name -> f).toMap
    assert(byName("userID").dataType === StringType)
    assert(byName("userID").role === "dimension")
    assert(byName("tags").dataType === ArrayType(StringType))
    assert(byName("price").dataType === IntegerType)
    assert(byName("price").role === "metric")
    assert(byName("creationTimestamp").role === "dateTime")
    assert(byName("creationTimestamp").format.get.startsWith("SIMPLE_DATE_FORMAT"))
  }

  test("table config parses time/retention/flush settings") {
    val spec = TableSpec.parse(schemaJson, configJson)
    assert(spec.tableType === "REALTIME")
    assert(spec.timeColumn === Some("creationTimestamp"))
    assert(spec.retentionDays === Some(7))
    assert(spec.flushIntervalMinutes === Some(2))
    assert(spec.flushSizeBytes === Some(150L * 1024 * 1024))
  }

  test("type lattice maps per SURVEY §1.2") {
    assert(TableSpec.mapType("LONG") === LongType)
    assert(TableSpec.mapType("BIG_DECIMAL") === DecimalType(38, 18))
    assert(TableSpec.mapType("BYTES") === BinaryType)
    assert(TableSpec.mapType("JSON") === StringType)
    assertThrows[IllegalArgumentException](TableSpec.mapType("GEOMETRY"))
  }

  test("schema carries role metadata for the engine catalog") {
    val spec = TableSpec.parse(schemaJson, configJson)
    val f = spec.schema("price")
    assert(f.metadata.getString("graft.role") === "metric")
  }

  test("registerView serves parquet through the spec-declared schema") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-spec").toString
    Seq(("7", "BlackFriday", Seq("a", "b"), 120, "2024-05-01 10:00:00"))
      .toDF("userID", "campaign", "tags", "price", "creationTimestamp")
      .write.mode("overwrite").parquet(dir)
    val spec = TableSpec.parse(schemaJson, configJson)
    spec.registerView(spark, dir)
    val row = spark.sql(
      "SELECT userID, campaign, size(tags) AS n_tags, price FROM webEvents").collect().head
    assert(row.getString(0) === "7")
    assert(row.getString(1) === "BlackFriday")
    assert(row.getInt(2) === 2)
    assert(row.getInt(3) === 120)
  }
}
