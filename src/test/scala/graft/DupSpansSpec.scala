package graft

import graft.ops.Dedup

/** Planted-truth coverage for Dedup.duplicateSpans (the Lee-et-al exact-
  * substring span shape): cross-doc shared runs merge to ONE maximal span,
  * same-doc repeats are duplicates, distant repeats split into separate
  * islands, sub-n docs and unique docs report nothing. */
class DupSpansSpec extends GraftSuite {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d e f g h i j"),            // shares a..h with doc 2
      (2L, "x1 x2 a b c d e f g h y z"),      // the shared run, offset by 2
      (3L, "p q r s t u v w"),                // all grams unique -> no spans
      (4L, "m n o m n o k l"),                // same-doc repeat, overlapping islands
      (5L, "a b c z1 z2 z3 z4 a b c"),        // two distant repeats -> two islands
      (6L, "a b")                             // sub-n doc: no positional grams
    ).toDF("doc_id", "text")
  }

  test("planted spans: cross-doc run, same-doc repeat, split islands") {
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1: dup gram positions 0..5 -> one island, tokens a..h = 5-0+3 = 8
    assert(got(1L) === ((1L, 8L)))
    // doc2: positions 2..7 -> one island of 8 tokens
    assert(got(2L) === ((1L, 8L)))
    // doc4: (m,n,o) at 0 and 3; gap 3 <= n -> ONE island covering 6 tokens
    assert(got(4L) === ((1L, 6L)))
    // doc5: (a,b,c) at 0 and 7; gap 7 > n -> TWO islands of 3 tokens each
    assert(got(5L) === ((2L, 6L)))
    // doc3 (unique) and doc6 (sub-n) report nothing
    assert(!got.contains(3L) && !got.contains(6L))
  }

  test("planted removal: keep the globally-first occurrence, cut the rest") {
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3)))).toMap
    // doc1 is the keeper of every shared gram (lowest (doc, pos)) -> intact
    assert(got(1L) === (("a b c d e f g h i j", 0L)))
    // doc2 loses the whole shared run a..h (covered positions 2..9)
    assert(got(2L) === (("x1 x2 y z", 8L)))
    // doc4: second (m,n,o) occurrence cut, first kept
    assert(got(4L) === (("m n o k l", 3L)))
    // doc5: BOTH (a,b,c) occurrences lose to doc1's keeper
    assert(got(5L) === (("z1 z2 z3 z4", 6L)))
    // unique and sub-n docs pass through untouched
    assert(got(3L) === (("p q r s t u v w", 0L)))
    assert(got(6L) === (("a b", 0L)))
  }

  test("span accounting is invariant to partitioning") {
    val a = Dedup.duplicateSpans(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = Dedup.duplicateSpans(docs.coalesce(1), "doc_id", "text", 3)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a === b)
  }
}
