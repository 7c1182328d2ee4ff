package graft.queries

import graft.tools.DuckDbSql._

/** DuckDB oracle SQL for the hash-based dedup queries — generated, because
  * the engine's stable hash family (FNV-1a + SplitMix64, MinHash remix) is
  * inlined as plain 64-bit SQL arithmetic (see graft.tools.DuckDbSql).
  * Each oracle mirrors its Spark query stage-for-stage: gram hashing →
  * per-band MinHash mins → bucket-cap salt-split → block self-join →
  * exact-Jaccard confirm.
  */
object DedupOracles {

  /** Oracle for q_dedup_ngram_jaccard (8 bands, r=1, cap 64, τ=0.4). */
  val ngramJaccardSql: String = {
    val gramHash = hash64("substring(text, gi, 3)")
    val remix = toSigned(remixU(toUnsigned("gh"), "s.seed"))
    s"""WITH gr AS (
       |  SELECT lang, doc_id,
       |         list_distinct(list_transform(range(1, greatest(length(text)-2, 0)+1),
       |           gi -> $gramHash)) AS grams
       |  FROM documents
       |), sized AS (
       |  SELECT lang, doc_id, grams, len(grams) AS n_grams FROM gr
       |), g AS (
       |  SELECT lang, doc_id, unnest(grams) AS gh FROM gr
       |), seeds AS (
       |  SELECT * FROM ${seedsValues(8)} t(band, seed)
       |), mins AS (
       |  SELECT g.lang, g.doc_id, s.band, min($remix) AS bv
       |  FROM g, seeds s GROUP BY g.lang, g.doc_id, s.band
       |), counted AS (
       |  SELECT *, count(*) OVER (PARTITION BY lang, band, bv) AS bk_n FROM mins
       |), salted AS (
       |  SELECT lang, doc_id, band, bv,
       |         doc_id % CAST(ceil(bk_n / 64.0) AS BIGINT) AS sub FROM counted
       |), pairs AS (
       |  SELECT DISTINCT a.lang AS lang, a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM salted a JOIN salted b
       |    ON a.lang = b.lang AND a.band = b.band AND a.bv = b.bv
       |       AND a.sub = b.sub AND a.doc_id < b.doc_id
       |), scored AS (
       |  SELECT p.lang, p.id_a, p.id_b,
       |         len(list_intersect(ga.grams, gb.grams)) AS n_inter,
       |         ga.n_grams AS na, gb.n_grams AS nb
       |  FROM pairs p
       |  JOIN sized ga ON ga.doc_id = p.id_a
       |  JOIN sized gb ON gb.doc_id = p.id_b
       |), conf AS (
       |  SELECT lang, id_a, id_b,
       |         round(n_inter * 1.0 / (na + nb - n_inter), 4) AS jaccard FROM scored
       |)
       |SELECT lang, id_a, id_b, jaccard FROM conf WHERE jaccard >= 0.4
       |ORDER BY lang, id_a, id_b""".stripMargin
  }
}
