package graft

import graft.expressions.FunnelAggs
import org.apache.spark.sql.functions._

/** Randomized ground-truth check for the funnel aggregate: seeded event
  * streams vs a plain-Scala reference of the greedy-min chain, through a
  * repartitioned plan (exercising partial buffers, serialize, merge).
  */
class FunnelPropertySpec extends GraftSuite {

  private val nSteps = 4

  /** Reference chain: level-by-level min, window anchored at t1. */
  private def refMaxStep(events: Seq[(Long, Int)], window: Long): Int = {
    var prev = Long.MinValue
    var deadline = Long.MaxValue
    var k = 0
    var done = false
    while (k < nSteps && !done) {
      val cand = events.collect {
        case (ts, bits) if (bits & (1 << k)) != 0 && ts >= prev &&
          (k == 0 || ts <= deadline) => ts
      }
      if (cand.isEmpty) done = true
      else {
        val t = cand.min
        if (k == 0 && window > 0) deadline = t + window
        prev = t
        k += 1
      }
    }
    k
  }

  test("seeded random streams match the reference chain (1000 users)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val rows = (1 to 1000).flatMap { u =>
      val nEvents = 1 + rnd.nextInt(12)
      (1 to nEvents).map { _ =>
        // small ts range forces plenty of ties; bits random incl. zero and
        // multi-step events
        (s"u$u", rnd.nextInt(40).toLong, rnd.nextInt(1 << nSteps))
      }
    }
    val window = 15L
    val expected = rows.groupBy(_._1).map { case (u, evs) =>
      u -> refMaxStep(evs.map(e => (e._2, e._3)), window)
    }
    // the aggregate consumes step CONDITIONS; reconstruct them from bits
    val stepCols = (0 until nSteps).map(i => (col("bits").bitwiseAND(1 << i)) =!= 0)
    val got = rows.toDF("user_id", "tus", "bits")
      .repartition(16)
      .groupBy(col("user_id"))
      .agg(FunnelAggs.maxStep(col("tus"), window, stepCols).as("m"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got.size === expected.size)
    expected.foreach { case (u, m) =>
      assert(got(u) === m, s"user $u")
    }
  }
}
