package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The reusable library operators (graft.ops) on PLANTED inputs — exact
  * expectations, independent of the fixture contents. */
class OpsSpec extends GraftSuite {
  import spark.implicits._

  private def doc(words: Seq[String]) = words.mkString(" ")

  test("Dedup.exactSurvivors keeps min id per identical text") {
    val df = Seq(
      (10L, "a b c"), (3L, "a b c"), (7L, "x y z"), (1L, "q")).toDF("id", "text")
    val survivors = Dedup.exactSurvivors(df, "text", "id")
      .select("keeper_id").as[Long].collect().sorted
    assert(survivors === Array(1L, 3L, 7L))
  }

  test("Dedup.minhashNearDupPairs finds the planted pair and only it") {
    val rnd = new scala.util.Random(5)
    val vocab = (1 to 800).map(i => s"w$i")
    def randomDoc() = doc(Seq.fill(90)(vocab(rnd.nextInt(vocab.size))))
    val base = Seq.fill(90)(vocab(rnd.nextInt(vocab.size)))
    val nearDup = base.updated(10, "CHANGED")
    val docs = ((1L, doc(base)) +: (2L, doc(nearDup)) +: (3L to 40L).map(_ -> randomDoc())).toDF("id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, "id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"planted near-dup missing: $pairs")
    assert(pairs.forall(p => p == ((1L, 2L))), s"false positives: ${pairs - ((1L, 2L))}")
  }

  test("Dedup.incrementalNearDupPairs finds planted new-vs-corpus dups, never corpus-corpus") {
    val rnd = new scala.util.Random(11)
    val vocab = (1 to 800).map(i => s"w$i")
    def randomDoc() = doc(Seq.fill(90)(vocab(rnd.nextInt(vocab.size))))
    val corpusBase = Seq.fill(90)(vocab(rnd.nextInt(vocab.size)))
    // corpus: the base doc, a near-dup of it (corpus-internal dup the
    // incremental pass must IGNORE), and noise
    val corpus = ((1L, doc(corpusBase)) +: (2L, doc(corpusBase.updated(5, "ALTERED"))) +:
      (3L to 30L).map(_ -> randomDoc())).toDF("id", "text")
    // new batch: one near-dup of corpus doc 1, one fresh doc
    val newBatch = Seq(
      (100L, doc(corpusBase.updated(20, "CHANGED"))),
      (101L, randomDoc())).toDF("id", "text")

    val pairs = Dedup.incrementalNearDupPairs(newBatch, corpus, "id", "text", threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((100L, 1L)), s"planted incremental dup missing: $pairs")
    assert(pairs.forall(_._1 >= 100L), s"corpus-corpus pair leaked: $pairs")
    assert(!pairs.exists(_._1 == 101L), s"fresh doc falsely matched: $pairs")
  }

  test("Dedup.nearDupSurvivors keeps exactly one doc per near-dup cluster") {
    val rnd = new scala.util.Random(9)
    val vocab = (1 to 800).map(i => s"w$i")
    val base = Seq.fill(90)(vocab(rnd.nextInt(vocab.size)))
    val docs = (
      (1L, doc(base)) +:                        // cluster {1,2,3}: near-dups
      (2L, doc(base.updated(3, "X"))) +:
      (3L, doc(base.updated(7, "Y"))) +:
      (10L to 20L).map(i => (i, doc(Seq.fill(90)(vocab(rnd.nextInt(vocab.size))))))
    ).toDF("id", "text")
    val out = Dedup.nearDupSurvivors(docs, "id", "text")
      .select("doc_id", "cluster", "is_survivor")
      .as[(Long, Long, Boolean)].collect()
    assert(out.length === 14)                    // every doc labeled
    val cluster = out.filter(r => Set(1L, 2L, 3L)(r._1))
    assert(cluster.forall(_._2 == 1L), s"expected one cluster: ${cluster.mkString(",")}")
    assert(cluster.count(_._3) === 1 && cluster.find(_._3).get._1 === 1L)
    val singles = out.filter(_._1 >= 10L)
    assert(singles.forall(r => r._3 && r._2 == r._1), "unique docs must all survive")
  }

  test("Dedup.simhashNearDupPairs hamming filter holds") {
    val base = (1 to 120).map(i => s"t$i")
    val docs = Seq(
      (1L, doc(base)),
      (2L, doc(base.updated(5, "x"))),
      (3L, doc((1 to 120).map(i => s"zzz$i")))).toDF("id", "text")
    val pairs = Dedup.simhashNearDupPairs(docs, "id", "text", maxHamming = 12)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("Similarity.bruteForceTopK ranks an exact-match neighbor first") {
    val e = sources.Tables.t(spark, sfDir, "embeddings")
    // query = candidate 0's own vector under a different id ⇒ its top-1 must
    // be vec 0 with sim 1.0
    val q = e.filter($"vec_id" === 0).select(lit(9999L).as("vec_id"), $"embedding")
    val top = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .orderBy($"rn").collect()
    assert(top.head.getAs[Long]("nid") === 0L)
    assert(top.head.getAs[Double]("sim") === 1.0)
  }

  test("Similarity.annTopK in-bucket results agree with brute force restricted to the bucket") {
    val e = sources.Tables.t(spark, sfDir, "embeddings")
    val ann = Similarity.annTopK(e, "vec_id", "embedding", $"vec_id" < 10, k = 3)
    // every returned neighbor must share the query's SRP bucket by construction
    val withBuckets = e.withColumn("b", queries.SimilarityQueries.srpBucket($"embedding", 8))
      .select($"vec_id", $"b")
    val joined = ann
      .join(withBuckets.withColumnRenamed("vec_id", "qid").withColumnRenamed("b", "qb"), Seq("qid"))
      .join(withBuckets.withColumnRenamed("vec_id", "nid").withColumnRenamed("b", "nb"), Seq("nid"))
    assert(joined.filter($"qb" =!= $"nb").count() === 0)
  }
}
