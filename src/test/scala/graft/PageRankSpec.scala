package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._

/** Exact-integer PageRank: matches a local reference loop bit for bit, is
  * invariant under edge order/partitioning, ranks hubs above spokes, and
  * handles dangling / in-edge-free nodes per the documented semantics. */
class PageRankSpec extends GraftSuite {

  import spark.implicits._

  private val Scale = 1000000000000L

  /** Local reference implementation: same integer recurrence, plain loops. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val es = edges.distinct
    val outdeg = es.groupBy(_._1).map { case (s, g) => s -> g.size.toLong }
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
    val base = Scale / 100 * 15
    var r = nodes.map(_ -> Scale).toMap
    (0 until iters).foreach { _ =>
      val msum = scala.collection.mutable.Map.empty[Long, BigInt].withDefaultValue(BigInt(0))
      es.foreach { case (s, d) => msum(d) += r(s) / outdeg(s) }
      r = nodes.map(n => n -> (base + (BigInt(85) * msum(n) / 100).toLong)).toMap
    }
    r
  }

  test("matches the local integer reference bit for bit on a mixed graph") {
    // hub-and-spoke + chain + dangling sink + isolated-source node
    val edges = Seq[(Long, Long)](
      (1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), // spokes -> hub
      (10L, 1L),                                  // hub -> one spoke
      (5L, 6L), (6L, 7L),                         // chain ending dangling at 7
      (8L, 10L))                                  // 8 has no in-edges
    val got = PageRank.run(edges.toDF("src", "dst"), iters = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === reference(edges, 7))
    // hub collected the most mass; dangling sink 7 still has rank; source 8 at base
    assert(got(10L) === got.values.max)
    assert(got(8L) === Scale / 100 * 15)
    assert(got(7L) > got(8L))
  }

  test("invariant under edge duplication, row order, and repartitioning") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (1, 3), (4, 1))
    val a = PageRank.run(edges.toDF("src", "dst"), iters = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val shuffled = scala.util.Random.shuffle(edges ++ edges ++ edges)
    val b = PageRank.run(shuffled.toDF("src", "dst").repartition(17), iters = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("symmetric cycle: equal ranks converging to scale") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 1))
    val got = PageRank.run(edges.toDF("src", "dst"), iters = 20)
      .collect().map(_.getLong(1)).toSet
    assert(got.size === 1, "cycle nodes must have identical ranks")
    // fixpoint of r = 0.15S + 0.85 r is exactly S (minus floor truncation)
    assert(math.abs(got.head - Scale) < 100)
  }

  test("weighted form: heavier edge carries proportionally more mass; parity with expanded multigraph on uniform weights") {
    val w = Seq[(Long, Long, Long)]((1, 2, 9L), (1, 3, 1L))
    val got = PageRank.runWeighted(w.toDF("src", "dst", "w"), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) > got(3L))
    // uniform weights == unweighted SET semantics
    val uw = Seq[(Long, Long, Long)]((1, 2, 1L), (2, 3, 1L), (3, 1, 1L))
    val a = PageRank.runWeighted(uw.toDF("src", "dst", "w"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = PageRank.run(uw.map(e => (e._1, e._2)).toDF("src", "dst"), iters = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }
}
