package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** The composed two-stage quantized retrieval (annTopKQuantized): int8
  * shortlist over the LSH bucket candidate stream, exact refine — the
  * SCALE.md composition, now code-backed. Evidence: recall vs brute force,
  * agreement with in-bucket exact ANN, probes as a recall lever, and a plan
  * assertion that stage 1 joins on bucket (no cartesian over candidates). */
class TwoStageAnnSpec extends GraftSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"
  private lazy val e = sources.Tables.t(spark, dir, "embeddings")
  private val qFilter = col("vec_id") < 20
  private val k = 3

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("qid", "nid").as[(Long, Long)].collect().toSet

  test("composed pipeline recall vs brute force matches the plain LSH path") {
    // the quantized stage must not LOSE recall relative to exact scoring of
    // the same bucket candidates: with an 8-wide shortlist over ~1%
    // quantization error, the in-bucket exact top-3 should survive intact
    val brute = pairs(Similarity.bruteForceTopK(e, e.filter(qFilter), "vec_id", "embedding", k))
    val lshExact = pairs(Similarity.annTopK(e, "vec_id", "embedding", qFilter, k, nPlanes = 4))
    val lshQuant = pairs(Similarity.annTopKQuantized(
      e, "vec_id", "embedding", qFilter, k, nPlanes = 4, probes = 1, shortlist = 8))
    val rExact = lshExact.intersect(brute).size.toDouble / brute.size
    val rQuant = lshQuant.intersect(brute).size.toDouble / brute.size
    assert(rQuant >= rExact - 0.05,
      s"quantized stage lost recall: quant=$rQuant exact=$rExact")
    // absolute floor at the recall-lever setting SimilarityProbeSpec pins
    // for the plain path (r5 >= 0.4): the int8 stage may cost a few points
    // through the 8-wide shortlist cut, not collapse
    val r5 = pairs(Similarity.annTopKQuantized(
      e, "vec_id", "embedding", qFilter, k, nPlanes = 4, probes = 5, shortlist = 8))
      .intersect(brute).size.toDouble / brute.size
    assert(r5 >= 0.35, s"5-probe composed recall $r5 below floor")
  }

  test("probes widen the composed pipeline's recall monotonically") {
    val brute = pairs(Similarity.bruteForceTopK(e, e.filter(qFilter), "vec_id", "embedding", k))
    def recall(p: Int) = pairs(Similarity.annTopKQuantized(
      e, "vec_id", "embedding", qFilter, k, nPlanes = 4, probes = p, shortlist = 8))
      .intersect(brute).size.toDouble / brute.size
    val r1 = recall(1)
    val r3 = recall(3)
    assert(r3 >= r1, s"3-probe composed recall $r3 < single-probe $r1")
  }

  test("stage 1 runs over the bucket candidate stream, not a cartesian of all candidates") {
    val df = Similarity.annTopKQuantized(
      e, "vec_id", "embedding", qFilter, k, nPlanes = 8, probes = 1, shortlist = 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"),
      s"stage 1 must not cross-join candidates:\n$finalSection")
    assert(!finalSection.contains("BroadcastNestedLoopJoin"),
      s"stage 1 must not nested-loop candidates:\n$finalSection")
  }
}
