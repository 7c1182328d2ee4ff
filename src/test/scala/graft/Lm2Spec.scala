package graft

/** q_text_lm2_score: the Stupid-Backoff path must actually be exercised
  * (train = even doc_ids only, so held-out docs carry unseen bigrams), and
  * surprising docs rank bottom. */
class Lm2Spec extends GraftSuite {

  test("backoff fires on held-out docs and the score orders them bottom") {
    val rows = SparkEntry.queries("q_text_lm2_score")(spark, sfDir).collect()
    assert(rows.length === 10)
    // at least one bottom-10 doc backed off at least once — a
    // train-on-everything setup would make this structurally zero
    assert(rows.exists(_.getLong(3) > 0L),
      s"no backoff in bottom-10: ${rows.map(_.toSeq).mkString(", ")}")
    // scores ascend with rank (most surprising first)
    val scores = rows.sortBy(_.getInt(0)).map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b })
    // log-probabilities: every score is negative
    assert(scores.forall(_ < 0.0))
  }
}
