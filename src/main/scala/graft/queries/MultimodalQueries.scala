package graft.queries

import graft.Q
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column extension (SURVEY.md §2.11 X4): media treated as opaque
  * `binary` columns with typed metadata, flowing through the same relational
  * engine.
  *
  * The container has no image/audio codecs, so DECODE IS A DETERMINISTIC
  * STUB (`MultimodalQueries.stubDecode` — clearly marked); everything
  * Spark-side is real and tested: the binary column plumbing, the metadata
  * schema, batch-wise `mapPartitions` feature extraction with its own
  * Encoder, and the partitioning story (features computed per-partition,
  * no shuffle until the final aggregate).
  */
object MultimodalQueries {

  /** Typed record for the feature-extraction stage. */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Int,
      // stubbed "decoded" features: byte-histogram moments stand in for
      // real image/audio features; same shape a real decoder would emit
      mean_byte: Double,
      var_byte: Double,
      entropy: Double)

  /** STUB decoder: byte-level statistics standing in for a codec. A real
    * deployment would swap this body for an image/audio library call; the
    * signature (bytes → fixed feature record) and everything downstream
    * stay identical. Deterministic by construction. */
  def stubDecode(docId: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    val counts = new Array[Int](256)
    var sum = 0.0
    bytes.foreach { b =>
      val v = b & 0xff
      counts(v) += 1
      sum += v
    }
    val mean = if (n == 0) 0.0 else sum / n
    var varAcc = 0.0
    var entropy = 0.0
    var i = 0
    while (i < 256) {
      if (counts(i) > 0) {
        val p = counts(i).toDouble / n
        entropy -= p * math.log(p) / math.log(2)
        varAcc += counts(i) * (i - mean) * (i - mean)
      }
      i += 1
    }
    MediaFeatures(docId, kind, n, mean, if (n == 0) 0.0 else varAcc / n, entropy)
  }

  /** Synthesize the multimodal table: text payload as the binary column
    * (UTF-8 bytes play the role of an encoded media blob) + metadata. */
  private def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        struct(
          col("source").as("origin"),
          col("n_chars").as("content_length"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("kind")).as("meta"))

  /** X4 metadata/plumbing (oracle-checked): binary payload sizes + hashes —
    * proves the binary column round-trips bit-exact through the engine. */
  private val mmBinary = Q(
    "q_mm_binary",
    (spark, dir) => {
      mediaTable(spark, dir)
        .select(
          col("doc_id"),
          col("meta.kind").as("kind"),
          octet_length(col("payload")).as("n_bytes"),
          md5(col("payload")).as("payload_md5"),
          col("meta.content_length").as("content_length"))
        .orderBy(col("doc_id"))
        .limit(200)
    },
    Some("""SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            octet_length(encode(text)) AS n_bytes,
            md5(text) AS payload_md5,
            n_chars AS content_length
            FROM documents ORDER BY doc_id LIMIT 200"""))

  /** X4 feature extraction: batch decode via typed mapPartitions (the Scala
    * analogue of mapInPandas batches — one stub-decoder instance per
    * partition, rows streamed through it; at 100 TB this is the shape that
    * amortizes model/codec init per partition, not per row). */
  private val mmFeatures = Q(
    "q_mm_features",
    (spark, dir) => {
      import spark.implicits._
      val media = mediaTable(spark, dir)
        .select(col("doc_id"), col("meta.kind").as("kind"), col("payload"))
      val features = media.as[(Long, String, Array[Byte])]
        .mapPartitions { rows =>
          // per-partition init would go here (codec handles, model weights)
          rows.map { case (id, kind, bytes) => stubDecode(id, kind, bytes) }
        }
      features.toDF()
        .groupBy(col("kind"))
        .agg(
          count(lit(1)).as("n"),
          round(avg(col("mean_byte")), 4).as("avg_mean_byte"),
          round(avg(col("entropy")), 4).as("avg_entropy"),
          max(col("n_bytes")).as("max_bytes"))
        .orderBy(col("kind"))
    },
    // the stub decoder is deterministic byte statistics, so DuckDB can
    // replicate it: per-byte histogram → mean from exact integer sums,
    // entropy as a sequential fold in ascending byte order (matching the
    // kernel's 0..255 loop; negation of a float sum is exact)
    Some("""WITH media AS (
            |  SELECT doc_id,
            |         CASE WHEN doc_id % 3 = 0 THEN 'image'
            |              WHEN doc_id % 3 = 1 THEN 'audio'
            |              ELSE 'video' END AS kind,
            |         text, octet_length(encode(text)) AS n_bytes
            |  FROM documents
            |), bytes AS (
            |  SELECT doc_id, kind, n_bytes,
            |         unnest(list_transform(range(1, length(text)+1), ci -> ascii(text[ci]))) AS b
            |  FROM media
            |), hist AS (
            |  SELECT doc_id, kind, n_bytes, b, count(*) AS c
            |  FROM bytes GROUP BY doc_id, kind, n_bytes, b
            |), per_doc AS (
            |  SELECT doc_id, kind, n_bytes,
            |         sum(c * b) * 1.0 / n_bytes AS mean_byte,
            |         -(list_reduce(list_transform(list(c ORDER BY b),
            |             x -> (x * 1.0 / n_bytes) * ln(x * 1.0 / n_bytes) / ln(2.0)),
            |           (ea, eb) -> ea + eb)) AS entropy
            |  FROM hist GROUP BY doc_id, kind, n_bytes
            |)
            |SELECT kind, count(*) AS n,
            |       round(avg(mean_byte), 4) AS avg_mean_byte,
            |       round(avg(entropy), 4) AS avg_entropy,
            |       max(n_bytes) AS max_bytes
            |FROM per_doc GROUP BY kind ORDER BY kind""".stripMargin))

  /** X4 frame sampling: treat the payload as a sequence of fixed-size
    * "frames" (256-byte chunks standing in for video frames), sample every
    * 4th frame, and extract per-frame features. The plumbing — explode to
    * frame rows, per-frame stub decode, re-aggregate — is exactly a video
    * pipeline's shape; only the chunking stands in for a real demuxer.
    * Frame/sample counts are oracle-checked; features are deterministic. */
  private val mmFrames = Q(
    "q_mm_frames",
    (spark, dir) => {
      val frameSize = 256
      val stride = 4
      // generate ONLY the sampled frames (strided sequence) — an
      // explode-then-filter materializes stride× the substring bytes for
      // rows that are immediately dropped; per-frame features use the
      // byte_avg kernel (one pass over the byte array) instead of the
      // per-byte ascii(substring(...)) lambda, which re-scans the string
      // per element. Values are bit-identical: the payload is ASCII, per-
      // frame sums are exact integers in double either way
      val sampled = mediaTable(spark, dir)
        .select(
          col("doc_id"),
          col("meta.kind").as("kind"),
          octet_length(col("payload")).as("n_bytes"),
          explode(expr(
            s"transform(sequence(0, CAST(ceil(octet_length(payload) / $frameSize.0) AS INT) - 1, $stride)," +
              s" i -> struct(i AS frame_idx, substring(payload, i * $frameSize + 1, $frameSize) AS frame))")).as("f"))
        .select(col("doc_id"), col("kind"), col("n_bytes"),
          col("f.frame_idx").as("frame_idx"),
          round(graft.functions.byte_avg(col("f.frame")), 4).as("frame_mean"))
      sampled.groupBy(col("doc_id"), col("kind"), col("n_bytes"))
        .agg(
          (max(col("frame_idx")).cast("long") / stride + 1).cast("long").as("n_sampled"),
          round(avg(col("frame_mean")), 4).as("avg_frame_mean"))
        .orderBy(col("doc_id"))
        .limit(100)
    },
    // the payload is UTF-8 text bytes, so DuckDB can replicate the chunking
    // byte-for-byte with substring + ascii (fixture is pure ASCII —
    // DuckOracleSpec asserts the precondition)
    Some("""WITH media AS (
            |  SELECT doc_id,
            |         CASE WHEN doc_id % 3 = 0 THEN 'image'
            |              WHEN doc_id % 3 = 1 THEN 'audio'
            |              ELSE 'video' END AS kind,
            |         text, octet_length(encode(text)) AS n_bytes
            |  FROM documents
            |), fidx AS (
            |  SELECT doc_id, kind, n_bytes, text,
            |         unnest(range(0, CAST(ceil(n_bytes / 256.0) AS INT))) AS fi
            |  FROM media
            |), sampled AS (
            |  SELECT doc_id, kind, n_bytes, fi,
            |         substring(text, fi * 256 + 1, 256) AS frame
            |  FROM fidx WHERE fi % 4 = 0
            |), fmeans AS (
            |  SELECT doc_id, kind, n_bytes, fi,
            |         round(list_sum(list_transform(range(1, length(frame)+1),
            |                 ci -> ascii(frame[ci]))) * 1.0 / length(frame), 4) AS frame_mean
            |  FROM sampled
            |)
            |SELECT doc_id, kind, n_bytes,
            |       CAST(max(fi) // 4 + 1 AS BIGINT) AS n_sampled,
            |       round(avg(frame_mean), 4) AS avg_frame_mean
            |FROM fmeans GROUP BY doc_id, kind, n_bytes
            |ORDER BY doc_id LIMIT 100""".stripMargin))

  /** X4 frame accounting (oracle-checked): frames per payload and how many a
    * stride-4 sampler visits — pure arithmetic both engines agree on. */
  private val mmFrameCounts = Q(
    "q_mm_frame_counts",
    (spark, dir) => {
      val frameSize = 256
      val stride = 4
      mediaTable(spark, dir)
        .select(
          col("doc_id"),
          col("meta.kind").as("kind"),
          ceil(octet_length(col("payload")).cast("double") / frameSize).cast("long").as("n_frames"))
        .withColumn("n_sampled",
          ceil(col("n_frames").cast("double") / stride).cast("long"))
        .orderBy(col("doc_id"))
        .limit(200)
    },
    Some(s"""SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS kind,
             CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) AS n_frames,
             CAST(ceil(ceil(octet_length(encode(text)) / 256.0) / 4.0) AS BIGINT) AS n_sampled
             FROM documents ORDER BY doc_id LIMIT 200"""))

  /** X4 resize stub: normalize every payload to a fixed byte budget
    * (truncate or zero-pad — a real image resize keeps this exact signature:
    * bytes in, fixed-shape bytes out, metadata updated). */
  private val mmResize = Q(
    "q_mm_resize",
    (spark, dir) => {
      val target = 384
      mediaTable(spark, dir)
        .withColumn("resized", expr(
          s"CASE WHEN octet_length(payload) >= $target THEN substring(payload, 1, $target) " +
            s"ELSE concat(payload, CAST(repeat(CHAR(0), $target - octet_length(payload)) AS BINARY)) END"))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("orig_bytes"),
          octet_length(col("resized")).as("resized_bytes"),
          md5(col("resized")).as("resized_md5"))
        .orderBy(col("doc_id"))
        .limit(100)
    },
    // truncation = md5 of the 384-byte prefix; zero-pad = md5 over the text
    // plus chr(0) repeats (DuckDB VARCHARs are NUL-tolerant and md5 hashes
    // the raw bytes — verified against hashlib)
    Some("""SELECT doc_id,
            octet_length(encode(text)) AS orig_bytes,
            CAST(384 AS INTEGER) AS resized_bytes,
            CASE WHEN octet_length(encode(text)) >= 384
                 THEN md5(substring(text, 1, 384))
                 ELSE md5(text || repeat(chr(0), 384 - octet_length(encode(text)))) END AS resized_md5
            FROM documents ORDER BY doc_id LIMIT 100"""))

  val all: Seq[Q] = Seq(mmBinary, mmFeatures, mmFrames, mmFrameCounts, mmResize)
}
