package graft

import graft.functions._
import org.apache.spark.sql.functions._

/** MinHash/LSH statistical properties: the signature's match fraction
  * estimates true Jaccard, and the band join recalls planted near-dups. */
class MinHashSpec extends GraftSuite {
  import spark.implicits._

  test("minhash signature match-rate approximates true Jaccard") {
    // two token sets with known overlap: |A∩B| = 60, |A∪B| = 140 → J ≈ 0.4286
    val a = (1 to 100).map(i => s"t$i")
    val b = (41 to 180).map(i => s"t$i").take(100)
    val inter = a.toSet.intersect(b.toSet).size.toDouble
    val union = a.toSet.union(b.toSet).size.toDouble
    val trueJ = inter / union
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select($"id", minhashSignature($"toks", 128).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val est = sigs(1L).zip(sigs(2L)).count { case (x, y) => x == y }.toDouble / 128
    assert(math.abs(est - trueJ) < 0.15, s"estimate $est vs true $trueJ")
  }

  test("LSH bands recall a planted near-duplicate pair") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 500).map(i => s"w$i")
    def randomDoc() = Seq.fill(80)(vocab(rnd.nextInt(vocab.size)))
    val base = randomDoc()
    val nearDup = base.updated(3, "CHANGED")  // ~97% shingle overlap
    val docs = (1L, base) +: (2L, nearDup) +: (3L to 30L).map(_ -> randomDoc())
    val df = docs.toDF("doc_id", "toks")
      .select($"doc_id",
        minhashSignature(array_distinct(wordShingles($"toks", 3)), 64).as("sig"))
    val bands = df.select($"doc_id", explode(lshBands($"sig", 16, 4)).as("bk"))
    val pairs = bands.as("a")
      .join(bands.as("b"), $"a.bk" === $"b.bk" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("ia"), $"b.doc_id".as("ib")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"planted pair not recalled; got $pairs")
  }

  test("wordShingles produces n-gram windows") {
    val out = Seq(Tuple1(Seq("a", "b", "c", "d"))).toDF("toks")
      .select(wordShingles($"toks", 3).as("sh"))
      .collect().head.getSeq[String](0)
    assert(out === Seq("a b c", "b c d"))
  }

  test("srp-bucketed ANN recalls most brute-force top-1 neighbors (smoke)") {
    // determinism of the bucket function: same embedding → same bucket
    val e = sources.Tables.t(spark, sfDir, "embeddings").limit(50)
    val b1 = e.select(queries.SimilarityQueries.srpBucket($"embedding", 8).as("b")).collect()
    val b2 = e.select(queries.SimilarityQueries.srpBucket($"embedding", 8).as("b")).collect()
    assert(b1.map(_.getInt(0)).toSeq === b2.map(_.getInt(0)).toSeq)
  }
}
