package graft

import graft.ops.Triangles
import org.apache.spark.sql.functions._

/** Triangle counting: known closed forms, a brute-force reference on a
  * random graph, and invariance under edge direction/duplication/order. */
class TrianglesSpec extends GraftSuite {

  import spark.implicits._

  private def bruteForce(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val es = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).toSet
    val nodes = es.map(_._1).toSeq.sorted
    (for {
      x <- nodes; y <- nodes if y > x && es((x, y))
      z <- nodes if z > y && es((x, z)) && es((y, z))
    } yield (x, y, z)).toSet
  }

  test("closed forms: K4 has 4 triangles (3 per node), C5 has none, K5 has 10") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val t4 = Triangles.triangles(k4.toDF("src", "dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(t4.length === 4 && t4.distinct.length === 4)
    val pn = Triangles.perNode(k4.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pn === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val c5 = Seq[(Long, Long)]((1, 2), (2, 3), (3, 4), (4, 5), (5, 1))
    assert(Triangles.count(c5.toDF("src", "dst")) === 0L)
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(Triangles.count(k5.toDF("src", "dst")) === 10L)
  }

  test("matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val got = Triangles.triangles(edges.toDF("src", "dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === bruteForce(edges))
    assert(got.forall(t => t._1 < t._2 && t._2 < t._3))
  }

  test("invariant under direction, duplication, row order, partitioning") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (3, 4), (4, 1), (2, 4))
    val base = Triangles.perNode(edges.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mangled = scala.util.Random.shuffle(
      edges.map { case (a, b) => (b, a) } ++ edges ++ edges)
    val got = Triangles.perNode(mangled.toDF("src", "dst").repartition(13))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === base)
  }

  test("hub wedge explosion is avoided: star graph generates zero wedges at the hub") {
    // star K1,50: hub degree 50, every leaf degree 1 — orientation points
    // every edge INTO the hub, so the wedge join finds no (src) collisions
    val star = (1L to 50L).map(l => (l, 0L))
    assert(Triangles.count(star.toDF("src", "dst")) === 0L)
    // and adding one leaf-leaf edge yields exactly one triangle
    assert(Triangles.count((star :+ (1L, 2L)).toDF("src", "dst")) === 1L)
  }

  test("round 10: wedge batching is exact — batched slices ≡ single exchange") {
    // wedges are generated only at each triangle's min-rank vertex, so a
    // src-hash slice partitions the wedge set: the batched union must be
    // the IDENTICAL triangle set (no loss, no duplicates) at any fan
    val rnd = new scala.util.Random(0x1010)
    val edges = Seq.fill(400)((rnd.nextInt(35).toLong, rnd.nextInt(35).toLong))
      .filter(e => e._1 != e._2)
    val canon = Triangles.canonical(edges.toDF("src", "dst"))
    def setOf(batches: Int): Seq[(Long, Long, Long)] =
      Triangles.trianglesCanonical(canon, batches = batches).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    val single = setOf(1)
    assert(single.nonEmpty, "fixture has no triangles — test has no teeth")
    assert(single.distinct === single)
    Seq(2, 3, 7).foreach { b =>
      assert(setOf(b) === single, s"batches=$b diverges")
    }
    // degrees-supplied route composes with batching
    import org.apache.spark.sql.functions._
    val deg = canon.select(col("a").as("n")).union(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val withDeg = Triangles.trianglesCanonical(canon, Some(deg), batches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    assert(withDeg === single)
  }
}
