package graft

import org.apache.spark.sql.functions._

/** Pinot SEGMENT_PARTITIONED_DISTINCT_COUNT analog: once the data is
  * hash-partitioned on the counted column, per-partition distinct sets are
  * disjoint, so summing local distinct counts is EXACT — with only
  * numPartitions longs ever crossing the wire. */
class SegPartDistinctSpec extends GraftSuite {

  private def segPartDistinct(ids: Seq[Long], parts: Int): Long = {
    import spark.implicits._
    ids.toDF("k")
      .repartition(parts, col("k"))
      .as[Long]
      .mapPartitions { it =>
        val seen = new java.util.HashSet[Long]()
        var n = 0L
        while (it.hasNext) { if (seen.add(it.next())) n += 1 }
        Iterator.single(n)
      }
      .toDF("partial")
      .agg(coalesce(sum(col("partial")), lit(0L)))
      .head().getLong(0)
  }

  test("sum of per-partition distincts equals the exact global distinct count") {
    // keys deliberately duplicated many times so that, without the
    // repartition, the same key WOULD appear in several input partitions
    val ids = (1L to 500L).flatMap(k => Seq.fill(7)(k))
    assert(segPartDistinct(ids, 8) === 500L)
    assert(segPartDistinct(ids, 1) === 500L) // degenerate single segment
    assert(segPartDistinct(Seq.empty[Long], 4) === 0L)
  }

  test("declared q_agg_segpart_distinct matches countDistinct on the fixture") {
    val got = SparkEntry.queries("q_agg_segpart_distinct")(spark, sfDir)
      .head().getLong(0)
    val exact = graft.sources.Tables.t(spark, sfDir, "events")
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(got === exact)
  }
}
