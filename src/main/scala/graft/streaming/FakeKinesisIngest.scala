package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** End-to-end exactly-once ingest over the [[FakeKinesis]] contract — the
  * piece that turns the protocol fake into the reference's full S1→S7 path
  * (stream → decode → sealed day-partitioned segments) with a STRONGER
  * delivery guarantee than the reference's at-least-once + ZK offsets
  * (`kinesisTableConfigFile.json:19-22`):
  *
  *   - each micro-batch writes to `sinkDir/batch=<n>` with OVERWRITE — the
  *     write is idempotent per batch id;
  *   - the consumer checkpoints and the committed-batch counter live in ONE
  *     state file, replaced atomically (write-temp + ATOMIC_MOVE) only
  *     AFTER the batch's data is fully written;
  *   - a crash anywhere (mid-write, or between write and commit — the
  *     `crashAfterWrite` test hook) restarts from the last committed state:
  *     the consumer re-polls from the committed checkpoints and REWRITES
  *     the uncommitted batch directory, so records land exactly once.
  *
  * This is the same idempotent-write + transactional-log design as Spark's
  * own FileStreamSink (`_spark_metadata`), restated over the fake so the
  * recovery path is provable offline — FakeKinesisIngestSpec crashes it
  * mid-commit, reshards it mid-ingest, and asserts the sealed store
  * converges to exactly-once either way. */
object FakeKinesisIngest {

  final case class State(batches: Int, checkpoints: Map[String, Long])

  private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def loadState(path: String): State = {
    val p = Paths.get(path)
    if (!Files.exists(p)) State(0, Map.empty)
    else {
      val n = mapper.readTree(Files.readString(p))
      val cps = scala.collection.mutable.LinkedHashMap[String, Long]()
      n.get("checkpoints").fields().forEachRemaining { e =>
        cps.put(e.getKey, e.getValue.asLong())
      }
      State(n.get("batches").asInt(), cps.toMap)
    }
  }

  /** Atomic replace: the state either commits fully or not at all. */
  def saveState(path: String, state: State): Unit = {
    val root = mapper.createObjectNode()
    root.put("batches", state.batches)
    val cps = root.putObject("checkpoints")
    state.checkpoints.foreach { case (k, v) => cps.put(k, v) }
    val p = Paths.get(path)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, mapper.writeValueAsString(root))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Build a consumer positioned at the committed state. */
  def consumerFor(stream: FakeKinesis, statePath: String,
      initialPosition: FakeKinesis.IteratorType = FakeKinesis.TrimHorizon): FakeKinesisConsumer = {
    val c = new FakeKinesisConsumer(stream, initialPosition)
    val st = loadState(statePath)
    if (st.checkpoints.nonEmpty) c.restoreCheckpoints(st.checkpoints)
    c
  }

  /** One micro-batch: drain what is consumable, decode through the shared
    * Kinesis path, seal as `sinkDir/batch=<n>` partitioned by `dt` inside,
    * then commit state. Returns the number of ingested records (0 = idle
    * tick, nothing written, state untouched). `crashAfterWrite` simulates
    * dying between the data write and the commit — the recovery window the
    * spec proves safe. After ANY failure the consumer object is stale (its
    * in-memory checkpoints ran ahead of the committed state) — recovery
    * means a fresh [[consumerFor]], exactly like a process restart. */
  def runOnce(
      spark: SparkSession,
      consumer: FakeKinesisConsumer,
      sinkDir: String,
      statePath: String,
      crashAfterWrite: Boolean = false): Int = {
    val recs = consumer.drain()
    if (recs.isEmpty) return 0
    val st = loadState(statePath)
    val df: DataFrame = EventIngest.decodeKinesis(consumer.toFrame(spark, recs))
    df.write.mode("overwrite")
      .partitionBy("dt")
      .parquet(s"$sinkDir/batch=${st.batches}")
    if (crashAfterWrite)
      throw new IllegalStateException("simulated crash between write and commit")
    saveState(statePath, State(st.batches + 1, consumer.exportCheckpoints()))
    recs.size
  }

  /** Read the sealed store (batch dirs become a `batch` partition column —
    * the segment-id analog; `dt` day partitioning inside as the reference's
    * deep-storage layout). */
  def readSealed(spark: SparkSession, sinkDir: String): DataFrame =
    spark.read.parquet(sinkDir)
}
