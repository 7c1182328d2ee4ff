package graft

import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** PII scrubbing on PLANTED strings (the fixture corpus is synthetic and
  * PII-free, so q_text_pii's fixture counts are typically zero — real
  * behavior is proven here). */
class PiiSpec extends GraftSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "contact me at jane.doe+spam@example.co.uk or call 555-123-4567 today"),
    (2L, "two mails: a@b.io and c.d@e-f.org; phone 02.9999.1234 nope 555.123.4567"),
    (3L, "no pii here at all"),
    (4L, "edge: not-an-email @missing.local and 12-345-6789 is not a phone")
  ).toDF("doc_id", "text")

  private def counted = docs
    .withColumn("n_emails", regexp_count($"text", lit(PipelineQueries.emailRe)))
    .withColumn("n_phones", regexp_count($"text", lit(PipelineQueries.phoneRe)))
    .withColumn("scrubbed", regexp_replace(
      regexp_replace($"text", PipelineQueries.emailRe, "[EMAIL]"),
      PipelineQueries.phoneRe, "[PHONE]"))

  test("email and phone patterns count planted PII exactly") {
    val r = counted.orderBy($"doc_id")
      .select($"n_emails", $"n_phones").as[(Int, Int)].collect()
    assert(r === Array((1, 1), (2, 1), (0, 0), (0, 0)))
  }

  test("scrubbing removes every matched span and nothing else") {
    val s = counted.orderBy($"doc_id").select($"scrubbed").as[String].collect()
    assert(s(0) === "contact me at [EMAIL] or call [PHONE] today")
    assert(s(1) === "two mails: [EMAIL] and [EMAIL]; phone 02.9999.1234 nope [PHONE]")
    assert(s(2) === "no pii here at all")
    // scrubbed text contains no residual matches
    assert(counted.filter(
      regexp_count($"scrubbed", lit(PipelineQueries.emailRe)) > 0 ||
      regexp_count($"scrubbed", lit(PipelineQueries.phoneRe)) > 0).count() === 0)
  }
}
