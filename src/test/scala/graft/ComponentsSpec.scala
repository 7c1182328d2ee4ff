package graft

import graft.ops.Components
import org.apache.spark.sql.functions._

/** Connected components on planted graphs: exact labels, and the pointer-
  * jumping convergence property that makes long drift-chains affordable. */
class ComponentsSpec extends GraftSuite {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)], maxIter: Int = 30): Map[Long, Long] =
    Components.connectedComponents(edges.toDF("id_a", "id_b"), maxIter)
      .as[(Long, Long)].collect().toMap

  test("two components + bridge node get exact min labels") {
    val labels = cc(Seq((5L, 3L), (3L, 9L), (20L, 30L)))
    assert(labels === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("a 200-node chain converges within the O(log n) iteration budget") {
    // worst case for plain min-propagation (diameter 199); pointer jumping
    // must close it in <= 30 rounds — wrong labels would surface here
    val chain = (1L until 200L).map(i => (i, i + 1))
    val labels = cc(chain, maxIter = 30)
    assert(labels.size === 200)
    assert(labels.values.toSet === Set(1L))
  }

  test("64-bit hash-scale node ids don't overflow the convergence check") {
    // three nodes near Long.MaxValue: a Long label-sum would exceed 2^63
    // and throw under ANSI mode mid-iteration; the DECIMAL(38,0) sum must
    // converge and label the pair by its min id
    val big = Long.MaxValue
    val labels = cc(Seq((big, big - 1), (big - 3, big - 2)))
    assert(labels === Map(
      big -> (big - 1), (big - 1) -> (big - 1),
      (big - 2) -> (big - 3), (big - 3) -> (big - 3)))
  }

  test("rings and cliques collapse to their min node") {
    val ring = (0L until 50L).map(i => (100 + i, 100 + (i + 1) % 50))
    val clique = for (a <- 0L until 10L; b <- (a + 1) until 10L) yield (500 + a, 500 + b)
    val labels = cc(ring ++ clique)
    assert(labels.filter(_._1 >= 500).values.toSet === Set(500L))
    assert(labels.filter(_._1 < 500).values.toSet === Set(100L))
  }
}
