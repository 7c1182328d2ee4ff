package graft

import graft.ops.LabelProp
import org.apache.spark.sql.functions._

/** Synchronous min-tie label propagation: matches a local reference loop
  * exactly, separates planted communities across a bridge, and is invariant
  * under edge direction/duplication/order. */
class LabelPropSpec extends GraftSuite {

  import spark.implicits._

  /** Local reference: same synchronous recurrence, plain loops. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
    val adj = und.groupBy(_._1).map { case (n, g) => n -> g.map(_._2) }
    var labels = adj.keys.map(n => n -> n).toMap
    (0 until iters).foreach { _ =>
      labels = adj.map { case (n, ns) =>
        val counts = ns.groupBy(labels).map { case (l, g) => (l, g.size) }
        n -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  private def runMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelProp.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two planted cliques joined by one bridge resolve to two communities") {
    val cliqueA = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val cliqueB = for (i <- 11L to 15L; j <- (i + 1) to 15L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (5L, 11L)).toSeq
    val got = runMap(edges, 4)
    assert(got === reference(edges, 4))
    val comms = got.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    assert(comms.size === 2)
    assert(comms.values.toSet === Set((1L to 5L).toSet, (11L to 15L).toSet),
      "the bridge must not merge the cliques")
  }

  test("matches the reference on a seeded random graph at several horizons") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    Seq(1, 3, 5).foreach { iters =>
      assert(runMap(edges, iters) === reference(edges, iters), s"iters=$iters")
    }
  }

  test("invariant under direction, duplication, row order, partitioning") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4))
    val base = runMap(edges, 4)
    val mangled = scala.util.Random.shuffle(
      edges.map { case (a, b) => (b, a) } ++ edges ++ edges)
    val got = LabelProp.run(mangled.toDF("src", "dst").repartition(11), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === base)
  }

  test("census sums to the node count and star collapses to the hub-adjacent label") {
    // star: every leaf's only neighbor is the hub, the hub's neighbors all
    // carry distinct labels -> ties, smallest label wins
    val star = (1L to 6L).map(l => (0L, l))
    val census = LabelProp.census(star.toDF("src", "dst"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(census.values.sum === 7L)
    assert(runMap(star, 2) === reference(star, 2))
  }
}
