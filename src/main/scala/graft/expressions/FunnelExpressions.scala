package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Pinot funnel aggregation vocabulary — FUNNELMAXSTEP / FUNNELMATCHSTEP /
  * FUNNELCOMPLETECOUNT of the deployed Pinot 1.2.0 endpoint (version pinned
  * at `/root/reference/resources/bastion/bastionUserData.sh:7`; open SQL
  * surface per `/root/reference/README.md:110`) — as ONE real
  * TypedImperativeAggregate, so `GROUP BY user_id` funnels work verbatim in
  * SQL instead of requiring the `ops.Funnel` DataFrame pipeline.
  *
  * Semantics are the greedy-min chain documented on [[graft.ops.Funnel]]
  * (deterministic, oracle-replicable): t1 = min ts among step-1 events in
  * the group; tk = min ts among step-k events with ts >= t(k-1) and, when a
  * window is set, ts <= t1 + window. The chain therefore completes steps
  * 1..maxStep contiguously. Evaluation is level-by-level min over the
  * buffered (ts, stepBits) pairs — no sort needed, O(numSteps·events).
  *
  * Scale posture: the shuffle carries one (ts, bits) pair per MATCHING
  * event per group — rows matching no step are never buffered, and the
  * 12-byte packed encoding keeps partial buffers small. Groups are users;
  * per-user event counts bound the buffer (the same state bound Pinot's own
  * funnel aggregations carry per group). For corpus-wide step counts over
  * unbounded groups, `ops.Funnel.funnelCounts` remains the
  * stage-frame shape that never materializes per-event state.
  */
object FunnelAggs {

  /** Builds the per-row step bitmask: bit i set iff stepConds(i) is true. */
  def stepBits(stepConds: Seq[Expression]): Expression = {
    require(stepConds.nonEmpty && stepConds.size <= 30,
      s"funnel supports 1..30 steps, got ${stepConds.size}")
    stepConds.zipWithIndex
      .map { case (c, i) =>
        If(EqualTo(Cast(c, BooleanType), Literal(true)),
          Literal(1 << i), Literal(0))
      }
      .reduce[Expression]((a, b) => BitwiseOr(a, b))
  }

  private def agg(
      mode: FunnelAgg.Mode,
      ts: Expression,
      window: Long,
      stepConds: Seq[Expression],
      strictIncrease: Boolean = false): Expression =
    FunnelAgg(Cast(ts, LongType), stepBits(stepConds), stepConds.size, window,
      mode, strictIncrease, maxBufferedEvents = configuredCap())
      .toAggregateExpression()

  /** Per-group buffer cap, read from the active session at BUILD time
    * (analysis runs on the driver; executors see the baked-in value). A
    * single hot key — a bot user emitting step-matching events forever —
    * would otherwise grow one group's aggregation buffer without bound. */
  private[expressions] def configuredCap(): Int =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString(FunnelAgg.MaxEventsConfKey, FunnelAgg.DefaultMaxBufferedEvents.toString)
      .toInt
    catch { case _: Exception => FunnelAgg.DefaultMaxBufferedEvents }

  /** Column-API surface (used by declared queries and specs). `window <= 0`
    * means unbounded; ts must be integral in the same unit as `window`. */
  def maxStep(ts: Column, window: Long, steps: Seq[Column]): Column =
    GraftBridge.column(
      agg(FunnelAgg.MaxStep, GraftBridge.expression(ts), window,
        steps.map(GraftBridge.expression)))

  def matchStep(ts: Column, window: Long, steps: Seq[Column]): Column =
    GraftBridge.column(
      agg(FunnelAgg.MatchStep, GraftBridge.expression(ts), window,
        steps.map(GraftBridge.expression)))

  def completeCount(ts: Column, window: Long, steps: Seq[Column]): Column =
    GraftBridge.column(
      agg(FunnelAgg.Complete, GraftBridge.expression(ts), window,
        steps.map(GraftBridge.expression)))

  def stepDurations(ts: Column, window: Long, steps: Seq[Column]): Column =
    GraftBridge.column(
      agg(FunnelAgg.Durations, GraftBridge.expression(ts), window,
        steps.map(GraftBridge.expression)))

  /** SQL-registry builder for the Pinot spellings
    * `funnelMaxStep(tsExpr, windowSize, numSteps, step1, ..., stepN
    * [, 'strict_increase'])` — windowSize and numSteps must be literals
    * (Pinot requires the same). windowSize accepts a numeric or string
    * literal ('1000' in the Pinot docs' own examples); <= 0 disables the
    * window. The optional trailing mode string after the steps supports
    * Pinot's STRICT_INCREASE (each step's timestamp strictly after the
    * previous step's); other mode strings are rejected loudly. */
  def sqlBuilder(mode: FunnelAgg.Mode)(args: Seq[Expression]): Expression = {
    require(args.length >= 4,
      "funnel aggregate needs (ts, windowSize, numSteps, step...)")
    val window = args(1) match {
      case Literal(v, _) if v != null => v.toString.toLong
      case other => throw new IllegalArgumentException(
        s"funnel windowSize must be a literal, got $other")
    }
    val n = args(2) match {
      case Literal(v, _) if v != null => v.toString.toInt
      case other => throw new IllegalArgumentException(
        s"funnel numSteps must be a literal, got $other")
    }
    val (steps, strict) = args.drop(3) match {
      case ss if ss.length == n + 1 => ss.last match {
        case Literal(m, StringType) if m != null &&
            m.toString.equalsIgnoreCase("strict_increase") => (ss.dropRight(1), true)
        case other => throw new IllegalArgumentException(
          s"unsupported funnel mode $other (supported: 'strict_increase')")
      }
      case ss => (ss, false)
    }
    require(steps.length == n,
      s"funnel declared $n steps but got ${steps.length} step expressions")
    agg(mode, args(0), window, steps, strict)
  }
}

/** Inert resolved carrier for FUNNEL_COUNT's `STEPS(...)` /
  * `CORRELATE_BY(...)` / `SETTINGS(...)` argument groups: unlike the
  * GAPFILL marker this one EXPOSES its arguments as children, because the
  * step predicates and the correlation column are real row expressions the
  * analyzer must resolve before the FUNNEL_COUNT builder consumes them.
  * Outside FUNNEL_COUNT the marker is Unevaluable and errors at planning. */
final case class FunnelArgMarker(kind: String, override val children: Seq[Expression])
  extends Expression with Unevaluable {
  override def dataType: DataType = NullType
  override def nullable: Boolean = true
  override def prettyName: String = kind
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FunnelArgMarker =
    copy(children = newChildren)
}

object FunnelAgg {
  /** Session conf key for the per-group buffered-event cap. */
  val MaxEventsConfKey = "graft.funnel.maxEventsPerGroup"

  /** Default per-group cap: 1M step-matching events ≈ 12 MB of packed
    * buffer for ONE group — far beyond any human user, small enough that a
    * handful of hot keys cannot OOM an executor. Exceeding it fails
    * LOUDLY (the group's funnel answer would be legitimate but the key is
    * pathological); raise the conf or pre-aggregate with ops.Funnel's
    * stage frames, which never buffer per-event state. */
  val DefaultMaxBufferedEvents: Int = 1000000

  sealed trait Mode extends Serializable
  case object MaxStep extends Mode
  case object MatchStep extends Mode
  case object Complete extends Mode

  /** Per-transition durations t(k+1)−t(k) of the greedy-min chain
    * (−1.0 marks a transition the chain never reached) — the duration
    * vector Pinot's funnelStepDurationStats statistics summarize. */
  case object Durations extends Mode
}

/** The shared funnel aggregate. Buffer = matching events as (ts, stepBits);
  * eval runs the greedy-min chain (see [[FunnelAggs]] scaladoc). */
case class FunnelAgg(
    tsExpr: Expression,
    bitsExpr: Expression,
    numSteps: Int,
    window: Long,
    mode: FunnelAgg.Mode,
    strictIncrease: Boolean = false,
    maxBufferedEvents: Int = FunnelAgg.DefaultMaxBufferedEvents,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[(Long, Int)]]
  with BinaryLike[Expression] {

  require(numSteps >= 1 && numSteps <= 30, s"numSteps out of range: $numSteps")

  override def left: Expression = tsExpr
  override def right: Expression = bitsExpr

  override def prettyName: String = mode match {
    case FunnelAgg.MaxStep => "funnel_max_step"
    case FunnelAgg.MatchStep => "funnel_match_step"
    case FunnelAgg.Complete => "funnel_complete_count"
    case FunnelAgg.Durations => "funnel_step_durations"
  }

  override def dataType: DataType = mode match {
    case FunnelAgg.MaxStep => IntegerType
    case FunnelAgg.MatchStep => ArrayType(IntegerType, containsNull = false)
    case FunnelAgg.Complete => LongType
    case FunnelAgg.Durations => ArrayType(DoubleType, containsNull = false)
  }

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.ArrayBuffer[(Long, Int)] =
    mutable.ArrayBuffer.empty

  override def update(
      buf: mutable.ArrayBuffer[(Long, Int)],
      input: InternalRow): mutable.ArrayBuffer[(Long, Int)] = {
    val t = tsExpr.eval(input)
    val b = bitsExpr.eval(input)
    if (t != null && b != null) {
      val bits = b.asInstanceOf[Int]
      if (bits != 0) { checkCap(buf.length + 1); buf += ((t.asInstanceOf[Long], bits)) }
    }
    buf
  }

  override def merge(
      a: mutable.ArrayBuffer[(Long, Int)],
      b: mutable.ArrayBuffer[(Long, Int)]): mutable.ArrayBuffer[(Long, Int)] = {
    checkCap(a.length + b.length)
    a ++= b; a
  }

  /** Loud per-group state guard (see FunnelAgg.DefaultMaxBufferedEvents). */
  private def checkCap(newSize: Int): Unit =
    if (newSize > maxBufferedEvents)
      throw new IllegalStateException(
        s"$prettyName: one group buffered more than $maxBufferedEvents " +
          s"step-matching events — a hot key would grow executor memory " +
          s"without bound. Raise ${FunnelAgg.MaxEventsConfKey} or " +
          "pre-aggregate with ops.Funnel stage frames (no per-event state).")

  /** Greedy-min chain over the buffered events, level by level: exactly
    * `ops.Funnel.stageFrames` restricted to one group. Returns the chain
    * times t(1..n); Long.MinValue marks an unreached step. */
  private def chain(buf: mutable.ArrayBuffer[(Long, Int)]): Array[Long] = {
    val t = Array.fill(numSteps)(Long.MinValue)
    var prev = Long.MinValue
    var deadline = Long.MaxValue
    var k = 0
    var reached = true
    while (k < numSteps && reached) {
      var best = Long.MaxValue
      var found = false
      val mask = 1 << k
      var i = 0
      val n = buf.length
      while (i < n) {
        val (ts, bits) = buf(i)
        val after = if (strictIncrease && k > 0) ts > prev else ts >= prev
        if ((bits & mask) != 0 && after && (k == 0 || ts <= deadline) &&
            ts < best) {
          best = ts; found = true
        }
        i += 1
      }
      if (found) {
        t(k) = best
        if (k == 0 && window > 0) deadline = best + window
        prev = best
        k += 1
      } else reached = false
    }
    t
  }

  override def eval(buf: mutable.ArrayBuffer[(Long, Int)]): Any = {
    val t = chain(buf)
    mode match {
      case FunnelAgg.MaxStep =>
        var k = 0
        while (k < numSteps && t(k) != Long.MinValue) k += 1
        k
      case FunnelAgg.MatchStep =>
        new GenericArrayData(
          t.map(v => if (v != Long.MinValue) 1 else 0))
      case FunnelAgg.Complete =>
        if (t(numSteps - 1) != Long.MinValue) 1L else 0L
      case FunnelAgg.Durations =>
        new GenericArrayData(
          (1 until numSteps).map { k =>
            if (t(k) != Long.MinValue) (t(k) - t(k - 1)).toDouble else -1.0
          }.toArray)
    }
  }

  override def serialize(buf: mutable.ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 12 * buf.length)
    bb.putInt(buf.length)
    buf.foreach { case (ts, bits) => bb.putLong(ts); bb.putInt(bits) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[(Long, Int)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { buf += ((bb.getLong, bb.getInt)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FunnelAgg =
    copy(tsExpr = newLeft, bitsExpr = newRight)
}

object FunnelCountAgg {
  /** Strategy hints Pinot 1.2 accepts in `SETTINGS(...)` — all are
    * EXECUTION hints for the same set-intersection answer (Pinot picks a
    * physical strategy; Spark picks its own), so they validate and no-op
    * here. Unknown settings error loudly. */
  val KnownSettings: Set[String] =
    Set("set", "bitmap", "theta_sketch", "sorted", "partitioned")

  /** Builds the SQL form from the marker arguments:
    * `FUNNEL_COUNT(STEPS(p1, ..., pn), CORRELATE_BY(col) [, SETTINGS(...)])`.
    * Semantics (Pinot FunnelCountAggregationFunction, 1.2): per correlated
    * id, a step counts iff the id has rows matching EVERY earlier step too
    * (prefix set-intersection — funnelCount is the order-free funnel; the
    * time-ordered family is funnelMaxStep/funnelMatchStep). Returns
    * array<bigint>: counts(k) = |S1 ∩ … ∩ S(k+1)| over distinct ids. */
  def sqlBuilder(args: Seq[Expression]): Expression = {
    var steps: Seq[Expression] = Nil
    var corr: Option[Expression] = None
    var settings: Set[String] = Set.empty
    args.foreach {
      case m: FunnelArgMarker => m.kind match {
        case "steps" =>
          require(steps.isEmpty, "FUNNEL_COUNT: one STEPS(...) group")
          steps = m.children
        case "correlate_by" =>
          require(corr.isEmpty && m.children.length == 1,
            "FUNNEL_COUNT: CORRELATE_BY takes exactly one column")
          corr = Some(m.children.head)
        case "settings" =>
          m.children.foreach {
            case Literal(s, StringType) if s != null =>
              val v = s.toString.toLowerCase
              require(KnownSettings.contains(v),
                s"FUNNEL_COUNT setting '$s' (supported: ${KnownSettings.mkString(", ")})")
              settings += v
            case other => throw new IllegalArgumentException(
              s"FUNNEL_COUNT settings must be string literals, got $other")
          }
        case other => throw new IllegalArgumentException(
          s"FUNNEL_COUNT argument group $other (STEPS | CORRELATE_BY | SETTINGS)")
      }
      case other => throw new IllegalArgumentException(
        s"FUNNEL_COUNT arguments must be STEPS(...)/CORRELATE_BY(...)/SETTINGS(...), got $other")
    }
    require(steps.nonEmpty, "FUNNEL_COUNT needs STEPS(predicate, ...)")
    val c = corr.getOrElse(throw new IllegalArgumentException(
      "FUNNEL_COUNT needs CORRELATE_BY(column)"))
    if (settings.contains("theta_sketch"))
      // the APPROXIMATE strategy is real here too: bounded per-group state
      // (one theta per step), Pinot's unbounded-group trade
      FunnelCountThetaAgg(XxHash64(Seq(c), 42L),
        FunnelAggs.stepBits(steps), steps.size).toAggregateExpression()
    else
      // 128-bit id key (two seeded xxhash64) — the contentKey collision
      // standard: merging two real ids needs a 128-bit collision
      FunnelCountAgg(
        XxHash64(Seq(c), 42L), XxHash64(Seq(c), 7L),
        FunnelAggs.stepBits(steps), steps.size,
        // analysis-time conf read, same doctrine as FunnelAggs.agg — capFail()
        // tells users to raise graft.funnel.maxEventsPerGroup, so it must
        // actually govern this aggregate too
        maxUsers = FunnelAggs.configuredCap())
        .toAggregateExpression()
  }
}

/** FUNNEL_COUNT: per-group state = one Int bitmask per DISTINCT correlated
  * id (128-bit hashed key), OR-folded across that id's rows; eval counts
  * ids whose mask covers each step prefix. The shuffle carries |distinct
  * ids in group| × 20 B — the same per-group distinct-state bound Pinot's
  * own set-strategy funnelCount carries (its sketch strategies trade that
  * bound for approximation; at Spark scale pre-aggregate per id with
  * funnelMatchStep + element-wise sums instead, the two-level shape). The
  * FunnelAgg event cap doctrine applies: more than `maxUsers` distinct ids
  * in ONE group fails loudly rather than growing executor memory. */
case class FunnelCountAgg(
    h1: Expression,
    h2: Expression,
    bitsExpr: Expression,
    numSteps: Int,
    maxUsers: Int = FunnelAgg.DefaultMaxBufferedEvents,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[(Long, Long), Int]] {

  require(numSteps >= 1 && numSteps <= 30, s"numSteps out of range: $numSteps")

  override def children: Seq[Expression] = Seq(h1, h2, bitsExpr)
  override def prettyName: String = "funnel_count"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[(Long, Long), Int] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[(Long, Long), Int],
      input: InternalRow): mutable.HashMap[(Long, Long), Int] = {
    val b = bitsExpr.eval(input)
    val k1 = h1.eval(input)
    if (b != null && k1 != null) {
      val bits = b.asInstanceOf[Int]
      if (bits != 0) {
        val key = (k1.asInstanceOf[Long], h2.eval(input).asInstanceOf[Long])
        val prev = buf.getOrElse(key, 0)
        if (prev == 0 && buf.size >= maxUsers) capFail()
        buf.update(key, prev | bits)
      }
    }
    buf
  }

  override def merge(
      a: mutable.HashMap[(Long, Long), Int],
      b: mutable.HashMap[(Long, Long), Int]): mutable.HashMap[(Long, Long), Int] = {
    b.foreach { case (k, bits) =>
      val prev = a.getOrElse(k, 0)
      if (prev == 0 && a.size >= maxUsers) capFail()
      a.update(k, prev | bits)
    }
    a
  }

  private def capFail(): Nothing =
    throw new IllegalStateException(
      s"funnel_count: one group exceeded $maxUsers distinct correlated ids — " +
        s"raise ${FunnelAgg.MaxEventsConfKey} or pre-aggregate per id with " +
        "funnelMatchStep and sum element-wise (no per-id state in one group).")

  override def eval(buf: mutable.HashMap[(Long, Long), Int]): Any = {
    val counts = new Array[Long](numSteps)
    buf.valuesIterator.foreach { bits =>
      var k = 0
      while (k < numSteps && ((bits >> k) & 1) == 1) { counts(k) += 1; k += 1 }
    }
    new GenericArrayData(counts)
  }

  override def serialize(buf: mutable.HashMap[(Long, Long), Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 20 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case ((a, b), bits) => bb.putLong(a); bb.putLong(b); bb.putInt(bits) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[(Long, Long), Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.HashMap.empty[(Long, Long), Int]
    var i = 0
    while (i < n) { buf.update((bb.getLong, bb.getLong), bb.getInt); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FunnelCountAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1), bitsExpr = newChildren(2))
}

/** FUNNEL_COUNT under `SETTINGS('theta_sketch')` — Pinot's approximate
  * strategy made REAL (DataSketches theta): per-group state is ONE theta
  * sketch per step (each updated with the correlated id's 64-bit hash),
  * and eval estimates |S1|, |S1 ∩ S2|, … via progressive intersection.
  * This is the UNBOUNDED-GROUP shape: state is O(numSteps · 2^lgK)
  * regardless of how many distinct ids the group sees — the exact-map
  * strategy's cap does not apply. Estimates are exact below the sketch's
  * retained-entries threshold and carry theta's proven error above it. */
case class FunnelCountThetaAgg(
    h1: Expression,
    bitsExpr: Expression,
    numSteps: Int,
    lgK: Int = 12,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[org.apache.datasketches.theta.Union]] {

  import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
  import org.apache.datasketches.memory.Memory

  require(numSteps >= 1 && numSteps <= 30, s"numSteps out of range: $numSteps")

  override def children: Seq[Expression] = Seq(h1, bitsExpr)
  override def prettyName: String = "funnel_count_theta"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  private def newUnion(): Union =
    SetOperation.builder().setNominalEntries(1 << lgK).buildUnion()

  override def createAggregationBuffer(): Array[Union] =
    Array.fill(numSteps)(newUnion())

  override def update(buf: Array[Union], input: InternalRow): Array[Union] = {
    val b = bitsExpr.eval(input)
    val k1 = h1.eval(input)
    if (b != null && k1 != null) {
      val bits = b.asInstanceOf[Int]
      if (bits != 0) {
        val id = k1.asInstanceOf[Long]
        var k = 0
        while (k < numSteps) {
          if (((bits >> k) & 1) == 1) buf(k).update(id)
          k += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Union], b: Array[Union]): Array[Union] = {
    var k = 0
    while (k < numSteps) { a(k).union(b(k).getResult); k += 1 }
    a
  }

  override def eval(buf: Array[Union]): Any = {
    val counts = new Array[Long](numSteps)
    val inter = SetOperation.builder().setNominalEntries(1 << lgK).buildIntersection()
    var k = 0
    while (k < numSteps) {
      inter.intersect(buf(k).getResult)
      counts(k) = Math.round(inter.getResult.getEstimate)
      k += 1
    }
    new GenericArrayData(counts)
  }

  override def serialize(buf: Array[Union]): Array[Byte] = {
    val parts = buf.map(_.getResult.toByteArray)
    val bb = java.nio.ByteBuffer.allocate(4 + parts.map(4 + _.length).sum)
    bb.putInt(parts.length)
    parts.foreach { p => bb.putInt(p.length); bb.put(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Union] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n) {
      val len = bb.getInt
      val p = new Array[Byte](len)
      bb.get(p)
      val u = newUnion()
      u.union(Sketches.wrapSketch(Memory.wrap(p)))
      u
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FunnelCountThetaAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FunnelCountThetaAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FunnelCountThetaAgg =
    copy(h1 = newChildren(0), bitsExpr = newChildren(1))
}
