package graft

import graft.ops.KCore
import org.apache.spark.sql.functions._

/** Synchronous k-core peeling: trajectory matches a local reference loop
  * exactly, cascades one hop per round (the synchronous contract), and is
  * invariant under row order / partitioning. */
class KCoreSpec extends GraftSuite {

  import spark.implicits._

  /** Local reference: same synchronous recurrence, plain loops. Input is
    * undirected edge pairs; symmetrization + dedup happens here (the op's
    * input contract is the already-symmetric adjacency). */
  private def reference(edges: Seq[(Long, Long)], k: Int, rounds: Int): Seq[(Int, Long, Long)] = {
    var e = edges.filter(p => p._1 != p._2)
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
    val traj = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    traj += ((0, e.map(_._1).distinct.size.toLong, e.size.toLong / 2))
    (1 to rounds).foreach { r =>
      val deg = e.groupBy(_._1).map { case (n, g) => n -> g.size }
      val alive = deg.filter(_._2 >= k).keySet
      e = e.filter { case (u, v) => alive(u) && alive(v) }
      traj += ((r, e.map(_._1).distinct.size.toLong, e.size.toLong / 2))
    }
    traj.toSeq
  }

  private def sym(edges: Seq[(Long, Long)]) =
    edges.filter(p => p._1 != p._2)
      .flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Seq[(Int, Long, Long)] =
    KCore.peelTrajectory(spark, sym(edges).toDF("src", "dst"), k, rounds)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq

  test("pendant chain peels ONE hop per round (synchronous contract)") {
    // triangle core 10-11-12 with chain 10-1-2-3-4: at k=2 the chain end
    // peels first, then each next chain node as its degree drops — four
    // distinct rounds before the triangle-only fixpoint
    val edges = Seq[(Long, Long)](
      (10, 11), (11, 12), (12, 10), (10, 1), (1, 2), (2, 3), (3, 4))
    val got = run(edges, k = 2, rounds = 6)
    assert(got === reference(edges, 2, 6))
    // round 0: 7 nodes; rounds peel 4, then 3, then 2, then 1 chain nodes
    assert(got.map(_._2) === Seq(7L, 6L, 5L, 4L, 3L, 3L, 3L))
    assert(got.last._3 === 3L, "the triangle is the 2-core")
  }

  test("whole-structure removal is simultaneous, not ordered") {
    // 4-clique + a 4-cycle sharing one vertex: at k=3 the cycle's non-shared
    // nodes (degree 2) all vanish in round 1 TOGETHER, and the shared vertex
    // keeps its clique degree
    val clique = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cycle = Seq[(Long, Long)]((1, 21), (21, 22), (22, 23), (23, 1))
    val edges = clique ++ cycle
    val got = run(edges, k = 3, rounds = 3)
    assert(got === reference(edges, 3, 3))
    assert(got(1)._2 === 4L, "cycle nodes leave together in round 1")
    assert(got(2) === got(1).copy(_1 = 2), "fixpoint after one round")
  }

  test("matches the reference on a seeded random graph at several k") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2)
    Seq(2, 5, 9).foreach { k =>
      assert(run(edges, k, 5) === reference(edges, k, 5), s"k=$k")
    }
  }

  test("invariant under row order and partitioning") {
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2)
    val base = run(edges, 4, 4)
    val mangled = scala.util.Random.shuffle(sym(edges))
    val got = KCore.peelTrajectory(spark, mangled.toDF("src", "dst").repartition(11), 4, 4)
      .orderBy(col("round"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === base)
  }
}
