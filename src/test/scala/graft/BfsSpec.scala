package graft

import graft.ops.Bfs
import org.apache.spark.sql.functions._

/** Synchronous frontier BFS: levels match a local reference, disconnected
  * components stay unreached, rounds cap truncates, partition-invariant. */
class BfsSpec extends GraftSuite {

  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], source: Long, rounds: Int): Map[Long, Int] = {
    val adj = edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct
      .groupBy(_._1).map { case (n, g) => n -> g.map(_._2) }
    var dist = Map(source -> 0)
    var frontier = Set(source)
    (1 to rounds).foreach { r =>
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty))
        .filterNot(dist.contains)
      dist = dist ++ next.map(_ -> r)
      frontier = next
    }
    dist
  }

  private def sym(edges: Seq[(Long, Long)]) =
    edges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.distinct

  private def run(edges: Seq[(Long, Long)], source: Long, rounds: Int): Map[Long, Int] =
    Bfs.levels(spark, sym(edges).toDF("src", "dst"), source, rounds)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("path + branch levels; disconnected triangle unreached") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4), (2, 10), (10, 11), // tree from 1
      (20, 21), (21, 22), (22, 20))              // island
    val got = run(edges, source = 1L, rounds = 6)
    assert(got === reference(edges, 1L, 6))
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 10L -> 2, 4L -> 3, 11L -> 3))
    assert(!got.contains(20L), "the island must stay unreached")
  }

  test("rounds cap truncates the expansion") {
    val chain = (1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = run(chain, 1L, rounds = 3)
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("matches the reference on a seeded random graph") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    Seq(2, 4, 7).foreach { rounds =>
      assert(run(edges, edges.map(_._1).min, rounds) ===
        reference(edges, edges.map(_._1).min, rounds), s"rounds=$rounds")
    }
  }

  test("invariant under partitioning") {
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(80)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
    val base = run(edges, 0L, 5)
    val got = Bfs.levels(spark,
        sym(edges).toDF("src", "dst").repartition(13), 0L, 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === base)
  }
}
