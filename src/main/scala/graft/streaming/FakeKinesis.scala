package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Protocol-contract fake of the Kinesis Data Streams API surface the
  * reference's low-level consumer depends on (SURVEY.md §2.1 S1; streamConfigs
  * `/root/reference/resources/pinot/resources/kinesisTableConfigFile.json:15-26`:
  * `streamType=kinesis`, `shardIteratorType=LATEST`,
  * `stream.kinesis.consumer.type=lowlevel`, 2 provisioned shards from
  * `apache-pinot-solution-stack.ts:730-734`).
  *
  * This is NOT a network client — it is a faithful in-process model of the
  * slice of stream semantics a correct consumer must handle, so those
  * behaviors are testable in an offline container:
  *
  *   - **partition-key routing**: `putRecord` routes by the unsigned 128-bit
  *     MD5 of the partition key into the open shard whose hash-key range
  *     covers it (the real service's documented routing);
  *   - **shard iterators**: TRIM_HORIZON / LATEST / AT_SEQUENCE_NUMBER /
  *     AFTER_SEQUENCE_NUMBER, with iterator EXPIRY (real: 5 minutes;
  *     configurable here so specs can force it) — `getRecords` on an expired
  *     token throws `ExpiredIteratorException` and the consumer must
  *     re-acquire from its checkpoint;
  *   - **resharding**: `splitShard` / `mergeShards` close parents and open
  *     children with parent links; a closed, fully-read shard returns a null
  *     next-iterator, and correct consumers finish parents before starting
  *     children (per-key ordering across a reshard depends on it);
  *   - **durability**: every record append and metadata change is persisted
  *     under a directory (JSON-lines per shard + a metadata file), so a
  *     process restart (`FakeKinesis.load`) sees the same stream — the spec
  *     uses this for the crash/recover contract.
  *
  * [[FakeKinesisConsumer]] is the matching low-level consumer replay
  * (checkpoint map keyed by shard, parent-before-child scheduling, expiry
  * recovery) whose output feeds [[EventIngest.decodeKinesis]] unchanged.
  */
object FakeKinesis {

  /** Unsigned 128-bit MD5 of the partition key — the service's routing hash. */
  def hashKey(partitionKey: String): BigInt =
    BigInt(1, java.security.MessageDigest.getInstance("MD5")
      .digest(partitionKey.getBytes(StandardCharsets.UTF_8)))

  val HashSpaceMax: BigInt = (BigInt(1) << 128) - 1

  final case class Record(
      shardId: String,
      sequenceNumber: Long,
      partitionKey: String,
      data: Array[Byte],
      approximateArrivalTimestamp: Long)

  final case class Shard(
      shardId: String,
      startingHashKey: BigInt,
      endingHashKey: BigInt,
      parentShardId: Option[String],
      adjacentParentShardId: Option[String],
      var open: Boolean)

  sealed trait IteratorType
  case object TrimHorizon extends IteratorType
  case object Latest extends IteratorType
  final case class AtSequenceNumber(seq: Long) extends IteratorType
  final case class AfterSequenceNumber(seq: Long) extends IteratorType

  final class ExpiredIteratorException(msg: String) extends RuntimeException(msg)
  /** The service's per-shard rate-limit rejection (GetRecords beyond the
    * per-shard read TPS, or PutRecord beyond the per-shard write rate).
    * Retryable: nothing advances — the caller backs off and re-issues. */
  final class ProvisionedThroughputExceededException(msg: String) extends RuntimeException(msg)
  final class ResourceNotFoundException(msg: String) extends RuntimeException(msg)
  final class InvalidArgumentException(msg: String) extends RuntimeException(msg)

  /** Opaque iterator token: shard + next position + issue time (for expiry). */
  final case class ShardIterator private[streaming] (
      shardId: String, nextIndex: Int, issuedAtMs: Long)

  final case class GetRecordsResult(
      records: Seq[Record],
      /** null-analog: None once a CLOSED shard is fully consumed — the
        * signal to move on to its children. Open shards always renew. */
      nextIterator: Option[ShardIterator])

  /** Create a stream with `shardCount` equal hash-range shards (the
    * reference provisions 2 — `apache-pinot-solution-stack.ts:733`). */
  def create(dir: String, streamName: String = "pinot-stream", shardCount: Int = 2,
      iteratorExpiryMs: Long = 300000L): FakeKinesis = {
    require(shardCount >= 1, "shardCount must be >= 1")
    val k = new FakeKinesis(Paths.get(dir), streamName, iteratorExpiryMs)
    val step = (HashSpaceMax + 1) / shardCount
    (0 until shardCount).foreach { i =>
      val start = step * i
      val end = if (i == shardCount - 1) HashSpaceMax else step * (i + 1) - 1
      k.addShard(start, end, None, None)
    }
    k.persistMeta()
    k
  }

  /** Reopen a persisted stream (restart contract). */
  def load(dir: String, iteratorExpiryMs: Long = 300000L): FakeKinesis = {
    val p = Paths.get(dir)
    val metaPath = p.resolve("stream.json")
    require(Files.exists(metaPath), s"no stream at $dir")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = mapper.readTree(Files.readString(metaPath))
    val k = new FakeKinesis(p, meta.get("streamName").asText(), iteratorExpiryMs)
    meta.get("shards").elements().asScala.foreach { s =>
      val shard = Shard(
        s.get("shardId").asText(),
        BigInt(s.get("startingHashKey").asText()),
        BigInt(s.get("endingHashKey").asText()),
        Option(s.get("parentShardId")).filter(!_.isNull).map(_.asText()),
        Option(s.get("adjacentParentShardId")).filter(!_.isNull).map(_.asText()),
        s.get("open").asBoolean())
      k.shards.put(shard.shardId, shard)
      k.records.put(shard.shardId, k.loadShardFile(shard.shardId))
    }
    k.nextShardNum = meta.get("nextShardNum").asInt()
    k.nextSeq = meta.get("nextSeq").asLong()
    k
  }
}

final class FakeKinesis private (
    dir: Path, val streamName: String, iteratorExpiryMs: Long) {
  import FakeKinesis._

  private[streaming] val shards = mutable.LinkedHashMap[String, Shard]()
  private[streaming] val records = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Record]]()
  private var nextShardNum = 0
  private var nextSeq = 0L
  /** Test hook: monotonic fake clock for iterator-expiry specs. */
  var clockMs: () => Long = () => System.currentTimeMillis()

  /** Per-shard rate limits (the real service: 5 GetRecords TPS and 1000
    * put records/s per shard). Default unlimited so existing consumers are
    * unaffected; specs tighten them to exercise backoff handling. Calls
    * over the limit inside a rolling 1-second window throw
    * [[ProvisionedThroughputExceededException]] and advance NOTHING. */
  var maxGetRecordsPerSecondPerShard: Int = Int.MaxValue
  var maxPutRecordsPerSecondPerShard: Int = Int.MaxValue
  private val getCallTimes = mutable.LinkedHashMap[String, mutable.Queue[Long]]()
  private val putCallTimes = mutable.LinkedHashMap[String, mutable.Queue[Long]]()

  private def admit(times: mutable.LinkedHashMap[String, mutable.Queue[Long]],
      shardId: String, limit: Int, op: String): Unit = {
    if (limit != Int.MaxValue) {
      val now = clockMs()
      val q = times.getOrElseUpdate(shardId, mutable.Queue.empty)
      while (q.nonEmpty && now - q.head >= 1000L) q.dequeue()
      if (q.length >= limit)
        throw new ProvisionedThroughputExceededException(
          s"$op rate exceeded for $shardId: ${q.length} calls in the last " +
            s"second (limit $limit) — back off and retry")
      q.enqueue(now)
    }
  }

  Files.createDirectories(dir.resolve("shards"))

  private def addShard(start: BigInt, end: BigInt,
      parent: Option[String], adjacent: Option[String]): Shard = {
    val id = f"shardId-$nextShardNum%012d"
    nextShardNum += 1
    val s = Shard(id, start, end, parent, adjacent, open = true)
    shards.put(id, s)
    records.put(id, mutable.ArrayBuffer.empty)
    s
  }

  def listShards(): Seq[Shard] = synchronized { shards.values.toSeq }

  def openShards(): Seq[Shard] = synchronized { shards.values.filter(_.open).toSeq }

  /** Route by MD5(partitionKey) into the covering OPEN shard; append with the
    * next stream-monotone sequence number; persist the record line. */
  def putRecord(partitionKey: String, data: Array[Byte]): Record = synchronized {
    val h = hashKey(partitionKey)
    val shard = shards.values
      .find(s => s.open && h >= s.startingHashKey && h <= s.endingHashKey)
      .getOrElse(throw new ResourceNotFoundException(
        s"no open shard covers hash $h — stream metadata corrupt"))
    admit(putCallTimes, shard.shardId, maxPutRecordsPerSecondPerShard, "PutRecord")
    val rec = Record(shard.shardId, nextSeq, partitionKey, data, clockMs())
    nextSeq += 1
    records(shard.shardId) += rec
    appendShardFile(rec)
    persistMeta() // nextSeq moved
    rec
  }

  def getShardIterator(shardId: String, tpe: IteratorType): ShardIterator = synchronized {
    require(shards.contains(shardId), s"unknown shard $shardId")
    val recs = records(shardId)
    val idx = tpe match {
      case TrimHorizon => 0
      case Latest => recs.length
      case AtSequenceNumber(seq) =>
        val i = recs.indexWhere(_.sequenceNumber >= seq)
        if (i < 0) recs.length else i
      case AfterSequenceNumber(seq) =>
        val i = recs.indexWhere(_.sequenceNumber > seq)
        if (i < 0) recs.length else i
    }
    ShardIterator(shardId, idx, clockMs())
  }

  /** The real service expires iterators 5 minutes after issue; every
    * `getRecords` returns a FRESH token, so an active consumer never expires
    * — only a stalled one does, and it must recover from its checkpoint. */
  def getRecords(it: ShardIterator, limit: Int = 10000): GetRecordsResult = synchronized {
    if (clockMs() - it.issuedAtMs > iteratorExpiryMs)
      throw new ExpiredIteratorException(
        s"iterator for ${it.shardId} issued ${it.issuedAtMs} expired (ttl ${iteratorExpiryMs}ms)")
    admit(getCallTimes, it.shardId, maxGetRecordsPerSecondPerShard, "GetRecords")
    val shard = shards.getOrElse(it.shardId,
      throw new ResourceNotFoundException(s"unknown shard ${it.shardId}"))
    val recs = records(it.shardId)
    val out = recs.slice(it.nextIndex, it.nextIndex + limit).toSeq
    val newIndex = it.nextIndex + out.length
    val next =
      if (!shard.open && newIndex >= recs.length) None // closed + drained → null
      else Some(ShardIterator(it.shardId, newIndex, clockMs()))
    GetRecordsResult(out, next)
  }

  /** SplitShard: close the parent, open two children halved at
    * `newStartingHashKey`; children carry `parentShardId`. */
  def splitShard(shardId: String, newStartingHashKey: BigInt): (Shard, Shard) = synchronized {
    val parent = shards.getOrElse(shardId,
      throw new ResourceNotFoundException(s"unknown shard $shardId"))
    if (!parent.open) throw new InvalidArgumentException(s"$shardId is already closed")
    if (newStartingHashKey <= parent.startingHashKey || newStartingHashKey > parent.endingHashKey)
      throw new InvalidArgumentException(
        s"newStartingHashKey $newStartingHashKey outside ($shardId range]")
    parent.open = false
    val lo = addShard(parent.startingHashKey, newStartingHashKey - 1, Some(shardId), None)
    val hi = addShard(newStartingHashKey, parent.endingHashKey, Some(shardId), None)
    persistMeta()
    (lo, hi)
  }

  /** MergeShards: close both adjacent parents, open one child covering the
    * union; the child carries BOTH parent links. */
  def mergeShards(shardId: String, adjacentShardId: String): Shard = synchronized {
    val a = shards.getOrElse(shardId,
      throw new ResourceNotFoundException(s"unknown shard $shardId"))
    val b = shards.getOrElse(adjacentShardId,
      throw new ResourceNotFoundException(s"unknown shard $adjacentShardId"))
    if (!a.open || !b.open)
      throw new InvalidArgumentException("both merge parents must be open")
    val (lo, hi) = if (a.startingHashKey < b.startingHashKey) (a, b) else (b, a)
    if (lo.endingHashKey + 1 != hi.startingHashKey)
      throw new InvalidArgumentException(
        s"${a.shardId} and ${b.shardId} are not hash-adjacent")
    a.open = false; b.open = false
    val child = addShard(lo.startingHashKey, hi.endingHashKey,
      Some(a.shardId), Some(b.shardId))
    persistMeta()
    child
  }

  // ---- persistence (file-backed contract) ----

  private def shardFile(shardId: String): Path = dir.resolve("shards").resolve(s"$shardId.jsonl")

  private def appendShardFile(r: Record): Unit = {
    val b64 = java.util.Base64.getEncoder.encodeToString(r.data)
    val line = s"""{"seq":${r.sequenceNumber},"pk":${quote(r.partitionKey)},"data":"$b64","at":${r.approximateArrivalTimestamp}}\n"""
    Files.write(shardFile(r.shardId), line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def loadShardFile(shardId: String): mutable.ArrayBuffer[Record] = {
    val p = shardFile(shardId)
    val buf = mutable.ArrayBuffer.empty[Record]
    if (Files.exists(p)) {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      Files.readAllLines(p).asScala.filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        buf += Record(shardId, n.get("seq").asLong(), n.get("pk").asText(),
          java.util.Base64.getDecoder.decode(n.get("data").asText()), n.get("at").asLong())
      }
    }
    buf
  }

  private def quote(s: String): String =
    new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(s)

  private def persistMeta(): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    root.put("streamName", streamName)
    root.put("nextShardNum", nextShardNum)
    root.put("nextSeq", nextSeq)
    val arr = root.putArray("shards")
    shards.values.foreach { s =>
      val n = arr.addObject()
      n.put("shardId", s.shardId)
      n.put("startingHashKey", s.startingHashKey.toString)
      n.put("endingHashKey", s.endingHashKey.toString)
      s.parentShardId.foreach(n.put("parentShardId", _))
      s.adjacentParentShardId.foreach(n.put("adjacentParentShardId", _))
      n.put("open", s.open)
    }
    Files.writeString(dir.resolve("stream.json"), mapper.writeValueAsString(root))
  }
}

/** Low-level consumer replay of the Pinot Kinesis plugin's loop
  * (`stream.kinesis.consumer.type=lowlevel`): one checkpoint per shard,
  * parent-before-child shard scheduling across reshards, iterator-expiry
  * recovery from the checkpoint. Delivery is exactly-once at this layer
  * because the checkpoint advances only over records the caller received —
  * pair it with the idempotent sealed-segment sink for end-to-end
  * exactly-once (strictly stronger than the reference's at-least-once +
  * ZK-offset posture, SURVEY.md §2.9 T5). */
final class FakeKinesisConsumer(
    stream: FakeKinesis,
    initialPosition: FakeKinesis.IteratorType = FakeKinesis.TrimHorizon) {
  import FakeKinesis._

  /** shardId → last sequence number delivered (the Pinot plugin checkpoints
    * sequence numbers per shard into ZK; here the map is the contract and
    * can be exported/restored for restart tests). */
  private val checkpoints = mutable.LinkedHashMap[String, Long]()
  /** Shards fully drained past their close (never revisited). */
  private val finished = mutable.LinkedHashSet[String]()
  /** Cached live iterator per shard (a real low-level consumer holds the
    * `nextShardIterator` from its last GetRecords and reuses it; a stall
    * longer than the expiry TTL invalidates it — the recovery path). */
  private val liveIterators = mutable.LinkedHashMap[String, ShardIterator]()
  /** Observable count of expiry-recovery events (spec evidence). */
  var expiredRecoveries: Int = 0
  /** Observable count of throttled shard polls (spec evidence). A throttled
    * shard is simply skipped for the pass: the checkpoint did not move and
    * the iterator token is kept for reuse, so backoff costs nothing — no
    * loss, no duplicates. */
  var throttledPolls: Int = 0
  /** Shards that existed at subscribe time with Latest start — their history
    * is skipped (LATEST applies per pre-existing shard; children always read
    * TRIM_HORIZON or nothing is seen after a reshard). */
  private val latestBaseline = mutable.LinkedHashMap[String, Long]()

  if (initialPosition == Latest) {
    stream.listShards().foreach { s =>
      val recs = stream.records(s.shardId)
      if (recs.nonEmpty) latestBaseline.put(s.shardId, recs.last.sequenceNumber)
    }
  }

  def exportCheckpoints(): Map[String, Long] = checkpoints.toMap
  def restoreCheckpoints(cp: Map[String, Long]): Unit = {
    checkpoints.clear(); checkpoints ++= cp
    liveIterators.clear() // a restarted consumer holds no live tokens
  }

  /** A shard is consumable when all its parents are finished (or it has
    * none). Ensures per-key order across splits/merges. */
  private def consumable(s: Shard, all: Map[String, Shard]): Boolean = {
    def parentDone(pid: String): Boolean =
      !all.contains(pid) || finished.contains(pid)
    s.parentShardId.forall(parentDone) && s.adjacentParentShardId.forall(parentDone)
  }

  /** One poll pass over all currently-consumable shards; returns delivered
    * records in shard-scan order. Handles iterator expiry by re-acquiring
    * from the checkpoint (the re-acquired iterator re-reads nothing already
    * checkpointed → no duplicates). */
  def poll(limitPerShard: Int = 10000): Seq[Record] = {
    val all = stream.listShards().map(s => s.shardId -> s).toMap
    val out = mutable.ArrayBuffer.empty[Record]
    stream.listShards().foreach { shard =>
      if (!finished.contains(shard.shardId) && consumable(shard, all)) {
        def startType: IteratorType = checkpoints.get(shard.shardId) match {
          case Some(seq) => AfterSequenceNumber(seq)
          case None => latestBaseline.get(shard.shardId) match {
            case Some(seq) => AfterSequenceNumber(seq)
            case None => TrimHorizon
          }
        }
        val it = liveIterators.getOrElse(shard.shardId,
          stream.getShardIterator(shard.shardId, startType))
        val resOpt =
          try Some(stream.getRecords(it, limitPerShard))
          catch {
            case _: ExpiredIteratorException =>
              // recovery contract: re-acquire from the checkpoint — the new
              // iterator starts AFTER the last delivered record, so the
              // stall costs nothing (no loss, no dup)
              expiredRecoveries += 1
              try Some(stream.getRecords(
                stream.getShardIterator(shard.shardId, startType), limitPerShard))
              catch {
                case _: ProvisionedThroughputExceededException =>
                  throttledPolls += 1; liveIterators.remove(shard.shardId); None
              }
            case _: ProvisionedThroughputExceededException =>
              // throttled: keep the token (the service advanced nothing),
              // skip the shard this pass, retry on a later poll
              throttledPolls += 1
              liveIterators.put(shard.shardId, it)
              None
          }
        resOpt.foreach { res =>
          if (res.records.nonEmpty) {
            out ++= res.records
            checkpoints.put(shard.shardId, res.records.last.sequenceNumber)
          }
          res.nextIterator match {
            case Some(next) => liveIterators.put(shard.shardId, next)
            case None =>
              liveIterators.remove(shard.shardId)
              finished += shard.shardId
          }
        }
      }
    }
    out.toSeq
  }

  /** Drain everything currently consumable: poll until a pass delivers no
    * records AND finishes no shard (an empty pass can still close out a
    * drained parent, unlocking its children for the next pass). A throttled
    * pass counts as progress — the limiter's window rolls with the stream's
    * clock, so the drain backs off briefly and retries rather than
    * abandoning undelivered records. The retry is only sound if the clock
    * ADVANCES (a fixed test `clockMs` can never roll the window), so
    * consecutive all-throttled passes with a non-advancing clock fail
    * loudly instead of spinning forever. */
  def drain(): Seq[Record] = {
    val out = mutable.ArrayBuffer.empty[Record]
    var progressed = true
    var stuckThrottled = 0
    while (progressed) {
      val finishedBefore = finished.size
      val throttledBefore = throttledPolls
      val clockBefore = stream.clockMs()
      val got = poll()
      out ++= got
      val throttled = throttledPolls > throttledBefore
      if (throttled && got.isEmpty && finished.size == finishedBefore) {
        Thread.sleep(25L)
        if (stream.clockMs() <= clockBefore) {
          stuckThrottled += 1
          require(stuckThrottled < 40,
            "drain(): every pass throttled and clockMs() is not advancing — " +
              "the rolling rate window can never roll (fixed test clock + " +
              "tight shard limit); advance the clock or raise the limit")
        } else stuckThrottled = 0
      } else stuckThrottled = 0
      progressed = got.nonEmpty || finished.size > finishedBefore || throttled
    }
    out.toSeq
  }

  /** Records → the connector-shaped frame (`EventIngest.kinesisRecordSchema`)
    * → shared [[EventIngest.decodeKinesis]] path. */
  def toFrame(spark: org.apache.spark.sql.SparkSession, recs: Seq[Record]): org.apache.spark.sql.DataFrame = {
    val rows = recs.map { r =>
      org.apache.spark.sql.Row(r.data, stream.streamName, r.partitionKey,
        r.sequenceNumber.toString, new java.sql.Timestamp(r.approximateArrivalTimestamp))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), EventIngest.kinesisRecordSchema)
  }
}
