package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** LSH bucket-cap evidence (the 100 TB scale-killer fix): plant one
  * pathological band bucket — hundreds of identical documents, which all
  * share every signature band — and assert the salt-split bounds the
  * per-bucket self-join quadratic while still finding duplicates. */
class DedupCapSpec extends GraftSuite {
  import spark.implicits._

  private val nDup = 400
  private val cap = 10

  /** 400 identical docs (one hot bucket per band) + 50 distinct docs. */
  private def planted = {
    val hot = (1L to nDup.toLong).map(i => (i, "the same boilerplate page body repeated verbatim across mirrors"))
    val rnd = new scala.util.Random(7)
    val cold = (1000L until 1050L).map(i => (i, Seq.fill(40)("w" + rnd.nextInt(5000)).mkString(" ")))
    (hot ++ cold).toDF("id", "text")
  }

  test("minhash: salt-split caps the planted bucket's pair blowup") {
    val capped = Dedup.minhashNearDupPairs(planted, "id", "text", threshold = 0.0, maxBucket = cap)
      .select("id_a", "id_b").distinct().count()
    // uncapped, the hot bucket alone would emit C(400,2) = 79,800 pairs;
    // capped: nSplit = ceil(400/10) = 40 sub-buckets of ~10 docs
    // → ≤ 40 × C(10,2) = 1,800 pairs from the hot bucket
    val worstCase = math.ceil(nDup.toDouble / cap).toLong * (cap.toLong * (cap - 1) / 2)
    assert(capped <= worstCase, s"capped pair count $capped exceeds bound $worstCase")
    assert(capped > 0, "identical docs within a sub-bucket must still pair")
  }

  test("minhash: capped run still confirms duplicates at jaccard 1.0") {
    val pairs = Dedup.minhashNearDupPairs(planted, "id", "text", threshold = 0.5, maxBucket = cap)
    val j = pairs.agg(min(col("jaccard")), max(col("jaccard"))).head()
    assert(j.getDouble(0) === 1.0 && j.getDouble(1) === 1.0)
    // every surviving pair is from the planted duplicate set
    assert(pairs.filter(col("id_a") > nDup || col("id_b") > nDup).count() === 0)
  }

  test("simhash: salt-split caps the planted bucket's pair blowup") {
    val capped = Dedup.simhashNearDupPairs(planted, "id", "text", maxHamming = 64, maxBucket = cap)
      .select("id_a", "id_b").distinct().count()
    val worstCase = math.ceil(nDup.toDouble / cap).toLong * (cap.toLong * (cap - 1) / 2)
    assert(capped <= worstCase, s"capped pair count $capped exceeds bound $worstCase")
    assert(capped > 0)
  }

  test("cap is a no-op for buckets under the threshold") {
    // genuinely distinct docs → tiny buckets → identical results with and
    // without cap (template-sharing docs would legitimately exceed it)
    val rnd = new scala.util.Random(11)
    val docs = (1L to 60L).map(i =>
      (i, Seq.fill(50)("t" + rnd.nextInt(100000)).mkString(" "))).toDF("id", "text")
    val withCap = Dedup.minhashNearDupPairs(docs, "id", "text", threshold = 0.0, maxBucket = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val noCap = Dedup.minhashNearDupPairs(docs, "id", "text", threshold = 0.0, maxBucket = Int.MaxValue)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(withCap === noCap)
  }
}
