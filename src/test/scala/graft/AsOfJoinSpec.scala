package graft

import graft.ops.AsOfJoin
import org.apache.spark.sql.functions._

/** As-of join on planted rows: inclusive-≤ semantics, per-key isolation,
  * no-match nulls, and carry-forward across multiple left rows. */
class AsOfJoinSpec extends GraftSuite {
  import spark.implicits._

  private val left = Seq(
    (1L, 100L, 10L), (1L, 101L, 25L), (1L, 102L, 30L),
    (2L, 200L, 5L),
    (3L, 300L, 50L)
  ).toDF("k", "lid", "ts")

  private val right = Seq(
    (1L, 900L, 10L, 1.0),  // ties lid=100's ts exactly → inclusive match
    (1L, 901L, 20L, 2.0),
    (1L, 902L, 28L, 3.0),
    (2L, 903L, 99L, 4.0),  // after k=2's only left row → no match
    (4L, 904L, 1L, 5.0)    // other key → never visible
  ).toDF("k", "rid", "ts", "rv")

  private lazy val got = AsOfJoin.asofJoin(left, right, Seq("k"), "ts", Seq("rid", "rv"))
    .select($"k", $"lid", $"asof_rid", $"asof_rv")
    .as[(Long, Long, Option[Long], Option[Double])].collect()
    .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap

  test("each left row gets the latest right row at or before its timestamp") {
    assert(got((1L, 100L)) === ((Some(900L), Some(1.0))))  // equal ts is inclusive
    assert(got((1L, 101L)) === ((Some(901L), Some(2.0))))  // 20 <= 25, not 28
    assert(got((1L, 102L)) === ((Some(902L), Some(3.0))))
  }

  test("no earlier right row → nulls (left-outer semantics)") {
    assert(got((2L, 200L)) === ((None, None)))
    assert(got((3L, 300L)) === ((None, None)))
  }

  test("left row count is preserved exactly") {
    assert(got.size === 5)
  }

  test("null right value columns never stitch values from different right rows") {
    // latest right row at ts=20 has rv=NULL: the left row must get
    // (rid=911, rv=NULL) as a unit — per-column carry-forward would
    // wrongly resurrect rv=1.0 from the OLDER ts=10 row
    val l = Seq((1L, 500L, 25L)).toDF("k", "lid", "ts")
    val r = Seq(
      (1L, 910L, 10L, Some(1.0)),
      (1L, 911L, 20L, None)
    ).toDF("k", "rid", "ts", "rv")
    val row = AsOfJoin.asofJoin(l, r, Seq("k"), "ts", Seq("rid", "rv"))
      .select($"asof_rid", $"asof_rv")
      .as[(Option[Long], Option[Double])].head()
    assert(row === ((Some(911L), None)))
  }
}
