package graft

import graft.ops.{Dedup, SemDeDup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SemDeDup cell-bounded embedding dedup: keeper rule (farther from the
  * centroid survives, ties to the smaller id), blocking (no cross-cell
  * pairs, salt-split sub-buckets bound overfull cells), reference parity
  * on a random fixture, and partition invariance. */
class SemDeDupSpec extends GraftSuite {

  import spark.implicits._

  /** (id, cell, dist, embedding) rows → assigned-shaped frame. */
  private def frame(rows: Seq[(Long, Int, Double, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "cell", "dist", "embedding")
      .select(col("vec_id"), col("embedding"), col("cell"), col("dist"))

  private def removed(df: DataFrame, tau: Double, cap: Int = 256): Set[Long] = {
    val salted = Dedup.saltSplit(df, Seq("cell"), "vec_id", cap)
    SemDeDup.removedOf(
        SemDeDup.cellPairs(salted, "vec_id", "embedding", "dist", "cell", tau))
      .collect().map(_.getLong(0)).toSet
  }

  private val e1 = Seq.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
  private val e2 = Seq.tabulate(8)(i => if (i == 1) 1.0f else 0.0f)

  test("keeper = farther from centroid; ties to the smaller id; far pairs survive") {
    // a,b identical direction (cos=1); c orthogonal (cos=0 < tau).
    val rows = Seq(
      (1L, 0, 0.50, e1), // nearer the centroid → dropped
      (2L, 0, 0.75, e1), // farther → survives
      (3L, 0, 0.90, e2)) // no qualifying neighbor
    assert(removed(frame(rows), 0.9) === Set(1L))
    // equal distances: the smaller id survives
    val tied = Seq((5L, 0, 0.5, e1), (9L, 0, 0.5, e1))
    assert(removed(frame(tied), 0.9) === Set(9L))
  }

  test("no cross-cell pairs: identical vectors in different cells both survive") {
    val rows = Seq((1L, 0, 0.5, e1), (2L, 1, 0.9, e1))
    assert(removed(frame(rows), 0.9) === Set.empty[Long])
  }

  test("pairwise-domination reference parity on a seeded random fixture") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.tabulate(60) { i =>
      (i.toLong, i % 3, rnd.nextInt(20) / 10.0,
        Seq.fill(8)((rnd.nextInt(9) - 4) / 4.0f))
    }
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val tau = 0.3
    val expect = (for {
      u <- rows; v <- rows
      if u._2 == v._2 && u._1 != v._1 && cos(u._4, v._4) >= tau
      // v removed iff u dominates: farther from centroid, ties to smaller id
      if u._3 > v._3 || (u._3 == v._3 && u._1 < v._1)
    } yield v._1).toSet
    assert(expect.nonEmpty, "fixture must produce removals")
    assert(removed(frame(rows), tau) === expect)
    // partition invariance
    assert(removed(frame(rows).repartition(7), tau) === expect)
  }

  test("salt-split caps an overfull cell: pairs stay within (cell, sub)") {
    // one cell of 40 identical vectors with cap 10 → 4 sub-buckets of the
    // id-mod split; each sub keeps exactly one survivor (all-pairs inside)
    val rows = Seq.tabulate(40)(i => (i.toLong, 0, i / 100.0, e1))
    val salted = Dedup.saltSplit(frame(rows), Seq("cell"), "vec_id", 10)
    val pairs = SemDeDup.cellPairs(salted, "vec_id", "embedding", "dist", "cell", 0.9)
    val subs = 4 // ceil(40/10)
    assert(pairs.count() === subs.toLong * (10 * 9 / 2))
    val rem = SemDeDup.removedOf(pairs).collect().map(_.getLong(0)).toSet
    // per sub-bucket the max-dist member survives = ids 36..39
    assert(rem === (0L until 40L).toSet -- Set(36L, 37L, 38L, 39L))
  }
}
