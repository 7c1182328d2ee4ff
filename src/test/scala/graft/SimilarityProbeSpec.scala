package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Multi-probe ANN recall evidence: probing neighbor buckets must recover
  * brute-force neighbors that single-probe misses (the recall lever SCALE.md
  * names — a query parameter, not a re-index). */
class SimilarityProbeSpec extends GraftSuite {
  import spark.implicits._

  // sf0.01 with 4 planes: 500 vectors over 16 buckets (~31/bucket) — dense
  // enough that recall is a meaningful signal (at sf0.001's 50 vectors over
  // 256 buckets nearly every bucket is a singleton and recall@3 is noise)
  private lazy val e = sources.Tables.t(spark, "/root/testdata/sf0.01", "embeddings")
  private val qFilter = col("vec_id") < 20
  private val k = 3
  private val nPlanes = 4

  private lazy val bruteSet: Set[(Long, Long)] =
    Similarity.bruteForceTopK(e, e.filter(qFilter), "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet

  private def annSet(probes: Int): Set[(Long, Long)] =
    Similarity.annTopK(e, "vec_id", "embedding", qFilter, k, nPlanes, probes)
      .select("qid", "nid").as[(Long, Long)].collect().toSet

  private def recall(ann: Set[(Long, Long)]): Double =
    ann.intersect(bruteSet).size.toDouble / bruteSet.size

  test("multi-probe recall@3 is at least single-probe recall and above floor") {
    val r1 = recall(annSet(1))
    val r3 = recall(annSet(3))
    val r5 = recall(annSet(5))
    assert(r3 >= r1, s"3-probe recall $r3 < single-probe $r1")
    assert(r5 >= r3, s"5-probe recall $r5 < 3-probe $r3")
    assert(r5 >= 0.4, s"5-probe recall $r5 below floor (index useless?); r1=$r1 r3=$r3")
  }

  test("two-stage quantized retrieval recovers the exact top-3 (recall on the int8 shortlist)") {
    // the declared q_sim_ann_quantized shape: int8-dequantized approx
    // scores shortlist 8, exact cosine refines to 3 — with an 8-wide
    // shortlist over ~1% quantization error the exact top-3 should survive
    val quant = SparkEntry.queries("q_sim_ann_quantized")(spark, "/root/testdata/sf0.01")
      .select($"qid", $"nid").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(
        e, e.filter($"vec_id" < 5), "vec_id", "embedding", k)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    val r = quant.intersect(exact).size.toDouble / exact.size
    assert(r >= 0.8, s"two-stage recall $r below 0.8 (exact=$exact quant=$quant)")
  }

  test("probing all hamming-1 neighbors strictly widens the candidate pool") {
    val n1 = annSet(1).size
    val nAll = annSet(nPlanes + 1).size
    assert(nAll >= n1)
  }

  test("multi-probe results are a superset-ranked refinement: every returned pair shares a probed bucket") {
    val withB = e.withColumn("b", queries.SimilarityQueries.srpBucket($"embedding", nPlanes))
    val probed = e.filter(qFilter)
      .select($"vec_id".as("qid"),
        queries.SimilarityQueries.srpProbeBuckets($"embedding", nPlanes, 3).as("pbs"))
    val ann = Similarity.annTopK(e, "vec_id", "embedding", qFilter, k, nPlanes, probes = 3)
    val joined = ann
      .join(probed, Seq("qid"))
      .join(withB.select($"vec_id".as("nid"), $"b".as("nb")), Seq("nid"))
    assert(joined.filter(not(array_contains($"pbs", $"nb"))).count() === 0)
  }
}
