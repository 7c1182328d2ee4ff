package graft

/** q_text_tfidf's size-adaptive persist (round 12): the partitioned-by-term
  * path (engaged above graft.text.partitionPersistBytes) must return the
  * EXACT rows of the small-input map-side path — same aggregates over the
  * same token rows, so the only thing the switch may change is the plan. */
class TfidfPartitionParitySpec extends GraftSuite {

  test("partitioned and map-side persist paths return identical rows") {
    val dir = "/root/testdata/sf0.001"
    val fn = SparkEntry.queries("q_text_tfidf")
    def rows(threshold: String) = {
      spark.conf.set("graft.text.partitionPersistBytes", threshold)
      try {
        spark.catalog.clearCache()
        fn(spark, dir).collect().map(_.toSeq).toSeq
      } finally spark.conf.unset("graft.text.partitionPersistBytes")
    }
    val small = rows(Long.MaxValue.toString) // force the map-side path
    val big = rows("1")                      // force the partitioned path
    assert(big === small)
    assert(small.nonEmpty)
  }
}
