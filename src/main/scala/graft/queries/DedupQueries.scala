package graft.queries

import graft.Q
import graft.functions._
import graft.sources.Tables

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication extension (SURVEY.md §2.11 X1) — the operators a 100 TB
  * training-data pipeline needs. All pipelines are shuffle-minimal:
  * signatures/fingerprints are computed per-row with array expressions (no
  * explode until the band join), and candidate generation is always blocked
  * (LSH bands / hash bands / group blocks) — never an all-pairs cartesian,
  * which is the difference between O(n²) and O(n·bucket) at scale.
  */
object DedupQueries {

  /** X1-exact: hash-groupBy dedup — survivors = min doc_id per identical
    * text. One shuffle on the text hash; at 100 TB you'd groupBy a 128-bit
    * content hash instead of the raw text to keep shuffle rows narrow. */
  private val dedupExact = Q(
    "q_dedup_exact",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .groupBy()
        .agg(
          count(lit(1)).as("n_unique"),
          sum(col("n_copies")).as("n_total"),
          sum(when(col("n_copies") > 1, col("n_copies") - 1).otherwise(0L)).as("n_removed"))
    },
    Some("""SELECT count(*) AS n_unique,
            CAST(sum(n_copies) AS BIGINT) AS n_total,
            CAST(sum(CASE WHEN n_copies > 1 THEN n_copies - 1 ELSE 0 END) AS BIGINT) AS n_removed
            FROM (SELECT text, min(doc_id) AS keeper_id, count(*) AS n_copies
                  FROM documents GROUP BY text)"""))

  /** X1-exact survivors listing (the dedup operator's actual output). */
  private val dedupSurvivors = Q(
    "q_dedup_survivors",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      d.groupBy(col("text"))
        .agg(min(col("doc_id")).as("keeper_id"))
        .select(col("keeper_id"))
        .orderBy(col("keeper_id"))
        .limit(200)
    },
    Some("""SELECT min(doc_id) AS keeper_id FROM documents GROUP BY text
            ORDER BY keeper_id LIMIT 200"""))

  /** X1-minhash: MinHash(64) + LSH(16 bands × 4) near-dup detection with
    * exact-Jaccard confirmation of candidates. Non-SQL-expressible → driver
    * rows-only check; correctness covered by MinHashSpec (property: candidate
    * superset of high-Jaccard pairs) and determinism by the stable hash spec.
    *
    * Scale: signature = per-row array math (no shuffle); the only shuffles
    * are the band-key self-join (rows = docs × bands, narrow) and the final
    * pair dedup. Exact confirm joins shingle sets back only for candidate
    * pairs (tiny vs n²). */
  private val dedupMinhash = Q(
    "q_dedup_minhash",
    (spark, dir) => {
      // threshold 0 keeps every band candidate so the summary can report
      // both candidate volume and the confirmed (J ≥ 0.5) subset
      val withSets = graft.ops.Dedup.minhashNearDupPairs(
        Tables.t(spark, dir, "documents"), "doc_id", "text",
        shingleN = 3, k = 64, bands = 16, rowsPerBand = 4, threshold = 0.0)
      withSets.agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when(col("jaccard") >= 0.5, lit(1))).as("n_confirmed_pairs"),
        round(coalesce(max(col("jaccard")), lit(0.0)), 4).as("max_jaccard"))
    },
    None,
    doc = "MinHash+LSH near-dup; rows-only check (non-SQL-expressible)")

  /** X1-simhash: 64-bit SimHash fingerprints, candidate pairs via 4×16-bit
    * hash bands, confirmed at Hamming distance ≤ 8 with built-in
    * bit_count(xor). */
  private val dedupSimhash = Q(
    "q_dedup_simhash",
    (spark, dir) => {
      // maxHamming 64 keeps every band candidate for the summary counts
      val pairs = graft.ops.Dedup.simhashNearDupPairs(
        Tables.t(spark, dir, "documents"), "doc_id", "text", maxHamming = 64)
      pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when(col("hamming") <= 8, lit(1))).as("n_near_dup"),
        coalesce(min(col("hamming")), lit(-1)).as("min_hamming"))
    },
    None,
    doc = "SimHash near-dup via hash bands; rows-only check")

  /** X1-ngram-jaccard: exact character-trigram Jaccard, blocked by
    * (lang, source) — the blocking pattern that replaces all-pairs at scale.
    * Emits the best pair per block. */
  private val dedupNgramJaccard = Q(
    "q_dedup_ngram_jaccard",
    (spark, dir) => {
      val d = Tables.t(spark, dir, "documents")
      // gram sets as SORTED stable 64-bit hashes: sorting once per doc lets
      // every pair use the allocation-free two-pointer intersect kernel
      // (sorted_intersect_count) instead of a hash set per pair
      val grams = d.select(
        col("lang"), col("source"), col("doc_id"),
        sort_array(array_distinct(transform(
          expr("transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))"),
          g => stable_hash64(g)))).as("grams"))
        .withColumn("n_grams", size(col("grams")))
        .persist()  // consumed by both sides of the block self-join
      // |A∪B| = |A|+|B|-|A∩B|: one set operation per pair instead of two
      val pairs = grams.as("a")
        .join(grams.as("b"),
          col("a.lang") === col("b.lang") && col("a.source") === col("b.source") &&
            col("a.doc_id") < col("b.doc_id"))
        .withColumn("n_inter", sorted_intersect_count(col("a.grams"), col("b.grams")))
        .select(
          col("a.lang").as("lang"), col("a.source").as("source"),
          col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(col("n_inter").cast("double") /
            (col("a.n_grams") + col("b.n_grams") - col("n_inter")).cast("double"), 4).as("jaccard"))
      val w = Window.partitionBy(col("lang"), col("source"))
        .orderBy(col("jaccard").desc, col("id_a").asc, col("id_b").asc)
      pairs
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("lang"), col("source"), col("id_a"), col("id_b"), col("jaccard"))
        .orderBy(col("lang"), col("source"))
    },
    None,
    doc = "blocked exact n-gram Jaccard; rows-only check")

  /** X1-embedding: cosine near-dup via signed-random-projection buckets
    * (8 hyperplanes → 256 buckets); candidates share a bucket, confirmed at
    * cosine ≥ 0.9 with the native codegen'd expression. */
  private val dedupEmbedding = Q(
    "q_dedup_embedding",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val withBucket = e.withColumn("bucket", SimilarityQueries.srpBucket(col("embedding"), 8))
        .persist()  // both sides of the bucket self-join
      val pairs = withBucket.as("a")
        .join(withBucket.as("b"),
          col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
        .select(
          col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          cosine_sim(col("a.embedding"), col("b.embedding")).as("cos"))
      pairs.agg(
        count(lit(1)).as("n_candidate_pairs"),
        count(when(col("cos") >= 0.9, lit(1))).as("n_near_dup"),
        round(coalesce(max(col("cos")), lit(-1.0)), 4).as("max_cos"))
    },
    None,
    doc = "embedding cosine near-dup via SRP-LSH buckets; rows-only check")

  val all: Seq[Q] = Seq(
    dedupExact, dedupSurvivors, dedupMinhash, dedupSimhash,
    dedupNgramJaccard, dedupEmbedding)
}
