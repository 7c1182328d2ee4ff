package graft.catalog

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Config-driven DDL (SURVEY.md §2.1 S10, §3.3): the engine ingests the same
  * JSON spec *shapes* the reference uses — a schema file splitting columns
  * into dimension/metric/dateTime roles
  * (`/root/reference/resources/pinot/resources/kinesisTable.json`) and a
  * table config carrying type/time-column/retention/flush settings
  * (`kinesisTableConfigFile.json`) — and turns them into a Spark
  * `StructType` (+ metadata) and table properties. The role split is
  * metadata-only in queries (SURVEY.md §1.1); here it drives default
  * partition/sort choices.
  */
final case class FieldSpec(name: String, dataType: DataType, role: String, format: Option[String])

final case class TableSpec(
    name: String,
    fields: Seq[FieldSpec],
    tableType: String,            // OFFLINE | REALTIME
    timeColumn: Option[String],
    retentionDays: Option[Int],
    flushIntervalMinutes: Option[Int],
    flushSizeBytes: Option[Long]) {

  /** Spark schema with role metadata on every field. */
  def schema: StructType = StructType(fields.map { f =>
    val md = new MetadataBuilder().putString("graft.role", f.role)
    f.format.foreach(md.putString("graft.format", _))
    StructField(f.name, f.dataType, nullable = true, md.build())
  })

  def registerView(spark: SparkSession, path: String): DataFrame = {
    val df = spark.read.schema(schema).parquet(path)
    df.createOrReplaceTempView(name)
    df
  }
}

object TableSpec {

  /** Pinot-type-string → Spark type (SURVEY.md §1.2 mapping table). */
  def mapType(t: String): DataType = t.toUpperCase match {
    case "INT" => IntegerType
    case "LONG" => LongType
    case "FLOAT" => FloatType
    case "DOUBLE" => DoubleType
    case "BIG_DECIMAL" => DecimalType(38, 18)
    case "BOOLEAN" => BooleanType
    case "TIMESTAMP" => TimestampType
    case "STRING" | "JSON" => StringType
    case "BYTES" => BinaryType
    case other => throw new IllegalArgumentException(s"unsupported type: $other")
  }

  /** Parse a schema spec of the reference's shape:
    * `{"schemaName": ..., "dimensionFieldSpecs": [{name,dataType}...],
    *   "metricFieldSpecs": [...], "dateTimeFieldSpecs": [{name,dataType,format,granularity}...]}`
    * MV columns (`singleValueField: false`) become ArrayType. */
  def parseSchema(json: String): (String, Seq[FieldSpec]) = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)
    val name = (root \ "schemaName").extractOpt[String].getOrElse("table")
    def fieldsOf(key: String, role: String): Seq[FieldSpec] =
      (root \ key) match {
        case JArray(arr) => arr.map { f =>
          val fname = (f \ "name").extract[String]
          val base = mapType((f \ "dataType").extract[String])
          val single = (f \ "singleValueField").extractOpt[Boolean].getOrElse(true)
          val dt = if (single) base else ArrayType(base)
          FieldSpec(fname, dt, role, (f \ "format").extractOpt[String])
        }
        case _ => Seq.empty
      }
    (name,
      fieldsOf("dimensionFieldSpecs", "dimension") ++
        fieldsOf("metricFieldSpecs", "metric") ++
        fieldsOf("dateTimeFieldSpecs", "dateTime"))
  }

  /** Parse a table config of the reference's shape (tableType, time column,
    * retention, stream flush thresholds). */
  def parse(schemaJson: String, tableConfigJson: String): TableSpec = {
    implicit val fmts: Formats = DefaultFormats
    val (name, fields) = parseSchema(schemaJson)
    val cfg = JsonMethods.parse(tableConfigJson)
    val seg = cfg \ "segmentsConfig"
    val stream = cfg \ "tableIndexConfig" \ "streamConfigs"
    val flushTime = (stream \ "realtime.segment.flush.threshold.time").extractOpt[String]
      .map(s => if (s.endsWith("m")) s.dropRight(1).toInt else s.toInt)
    val flushSize = (stream \ "realtime.segment.flush.threshold.segment.size").extractOpt[String]
      .map(s => if (s.endsWith("M")) s.dropRight(1).toLong * 1024 * 1024 else s.toLong)
    TableSpec(
      name = (cfg \ "tableName").extractOpt[String].getOrElse(name),
      fields = fields,
      tableType = (cfg \ "tableType").extractOpt[String].getOrElse("OFFLINE"),
      timeColumn = (seg \ "timeColumnName").extractOpt[String],
      retentionDays = (seg \ "retentionTimeValue").extractOpt[String].map(_.toInt)
        .filter(_ => (seg \ "retentionTimeUnit").extractOpt[String].contains("DAYS")),
      flushIntervalMinutes = flushTime,
      flushSizeBytes = flushSize)
  }
}
