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

  /** The shared CTE chain of the MinHash pipeline, ending with
    * `salted(doc_id, band, fk, sub)` and `sized(doc_id, shingles, n_sh)` —
    * reused by the self-join oracle (minhashSql) and the incremental
    * new-vs-corpus oracle (incrementalSql). */
  private lazy val minhashPipelineCtes: String = {
    val prime = u(0x100000001b3L)
    val offset = u(0xcbf29ce484222325L)
    val golden = u(0x9e3779b97f4a7c15L)
    // shingle(th, si): ((OFF*p + th[si])*p + th[si+1])*p + th[si+2], finalized
    val acc1 = wadd(wmul(offset, prime), "th[si]")
    val acc2 = wadd(wmul(acc1, prime), "th[si+1]")
    val acc3 = wadd(wmul(acc2, prime), "th[si+2]")
    val shingle = mix(wadd(acc3, golden))
    val remix = toSigned(remixU("shv", "s.seed"))
    val foldKey = foldHash64U(s"list_transform(list(mv ORDER BY sidx), fku -> ${toUnsigned("fku")})")
    s"""th AS (
       |  SELECT doc_id, list_transform(string_split(text, ' '), tk -> ${hash64U("tk")}) AS th
       |  FROM documents
       |), sh AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(range(1, greatest(len(th)-2, 0)+1), si -> $shingle)) AS shingles
       |  FROM th
       |), sized AS (
       |  SELECT doc_id, shingles, len(shingles) AS n_sh FROM sh
       |), shex AS (
       |  SELECT doc_id, unnest(shingles) AS shv FROM sh
       |), seeds AS (
       |  SELECT * FROM ${seedsValues(64)} t(sidx, seed)
       |), mins AS (
       |  SELECT d.doc_id, s.sidx,
       |         coalesce(min($remix), 9223372036854775807) AS mv
       |  FROM (SELECT doc_id FROM documents) d
       |  CROSS JOIN seeds s
       |  LEFT JOIN shex ON shex.doc_id = d.doc_id
       |  GROUP BY d.doc_id, s.sidx
       |), bands AS (
       |  SELECT doc_id, sidx // 4 AS band, $foldKey AS fk
       |  FROM mins GROUP BY doc_id, sidx // 4
       |), counted AS (
       |  SELECT *, count(*) OVER (PARTITION BY band, fk) AS bk_n FROM bands
       |), salted AS (
       |  SELECT doc_id, band, fk, doc_id % CAST(ceil(bk_n / 256.0) AS BIGINT) AS sub FROM counted
       |)""".stripMargin
  }

  /** Oracle for q_dedup_minhash: the full MinHash(64) + LSH(16×4) near-dup
    * pipeline — word-3-shingle hashes (FNV fold over token hashes), 64-seed
    * signature mins, fold_hash64 band keys, 256-doc bucket cap, exact-Jaccard
    * confirm — replicated stage-for-stage in SQL. Empty-shingle docs keep
    * Long.MaxValue signature lanes (coalesce), matching the kernel. */
  lazy val minhashSql: String =
    s"""WITH $minhashPipelineCtes, pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM salted a JOIN salted b
       |    ON a.band = b.band AND a.fk = b.fk AND a.sub = b.sub AND a.doc_id < b.doc_id
       |), conf AS (
       |  SELECT p.id_a, p.id_b,
       |         round(len(list_intersect(ga.shingles, gb.shingles)) * 1.0 /
       |               (ga.n_sh + gb.n_sh - len(list_intersect(ga.shingles, gb.shingles))), 4) AS j
       |  FROM pairs p
       |  JOIN sized ga ON ga.doc_id = p.id_a
       |  JOIN sized gb ON gb.doc_id = p.id_b
       |)
       |SELECT count(*) AS n_candidate_pairs,
       |       count(CASE WHEN j >= 0.5 THEN 1 END) AS n_confirmed_pairs,
       |       round(coalesce(max(j), 0.0), 4) AS max_jaccard
       |FROM conf""".stripMargin

  /** Oracle for q_dedup_incremental: the SAME MinHash pipeline, but pairs
    * join the NEW side (doc_id % 10 = 0) against the CORPUS side only —
    * no corpus×corpus work. Shingle/signature/band/salt CTEs are identical
    * because each doc's computation is side-independent, and the bucket
    * count (and therefore the salt split) runs over the union of both
    * sides, exactly as the engine's unioned band frame does. */
  lazy val incrementalSql: String =
    s"""WITH $minhashPipelineCtes, pairs AS (
       |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
       |  FROM salted a JOIN salted b
       |    ON a.band = b.band AND a.fk = b.fk AND a.sub = b.sub
       |   AND a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
       |), conf AS (
       |  SELECT p.new_id, p.corpus_id,
       |         round(len(list_intersect(ga.shingles, gb.shingles)) * 1.0 /
       |               (ga.n_sh + gb.n_sh - len(list_intersect(ga.shingles, gb.shingles))), 4) AS j
       |  FROM pairs p
       |  JOIN sized ga ON ga.doc_id = p.new_id
       |  JOIN sized gb ON gb.doc_id = p.corpus_id
       |)
       |SELECT (SELECT count(*) FROM documents WHERE doc_id % 10 = 0) AS n_new_docs,
       |       count(*) AS n_candidate_pairs,
       |       count(DISTINCT CASE WHEN j >= 0.5 THEN new_id END) AS n_dup_new_docs,
       |       round(coalesce(max(j), 0.0), 4) AS max_jaccard
       |FROM conf""".stripMargin

  /** Oracle for q_dedup_simhash: SimHash-64 bit-majority fingerprints,
    * 4×16-bit band keys, 256-doc bucket cap, Hamming via bit_count(xor). */
  lazy val simhashSql: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_transform(string_split(text, ' '), tk -> ${hash64U("tk")})) AS h
       |  FROM documents
       |), bits AS (
       |  SELECT * FROM $bitValues64 t(bit, pw)
       |), votes AS (
       |  SELECT toks.doc_id, bits.bit, bits.pw,
       |         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS c
       |  FROM toks, bits GROUP BY toks.doc_id, bits.bit, bits.pw
       |), sim AS (
       |  SELECT doc_id,
       |         ${toSigned(s"CAST(coalesce(sum(CASE WHEN c > 0 THEN CAST(pw AS HUGEINT) END), 0) AS UBIGINT)")} AS sig
       |  FROM votes GROUP BY doc_id
       |), bands AS (
       |  SELECT doc_id, sig, band, (sig >> (16 * band)) & 65535 AS key
       |  FROM sim, (SELECT unnest(range(0, 4)) AS band) b
       |), counted AS (
       |  SELECT *, count(*) OVER (PARTITION BY band, key) AS bk_n FROM bands
       |), salted AS (
       |  SELECT doc_id, sig, band, key,
       |         doc_id % CAST(ceil(bk_n / 256.0) AS BIGINT) AS sub FROM counted
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |                  a.sig AS sig_a, b.sig AS sig_b
       |  FROM salted a JOIN salted b
       |    ON a.band = b.band AND a.key = b.key AND a.sub = b.sub AND a.doc_id < b.doc_id
       |), conf AS (
       |  SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming FROM pairs
       |)
       |SELECT count(*) AS n_candidate_pairs,
       |       count(CASE WHEN hamming <= 8 THEN 1 END) AS n_near_dup,
       |       CAST(coalesce(min(hamming), -1) AS INTEGER) AS min_hamming
       |FROM conf""".stripMargin
  }

  /** The shared CTE chain computing the confirmed ngram near-dup pairs
    * (ends with `conf(lang, id_a, id_b, jaccard)`). */
  private[queries] lazy val ngramPipelineCtes: String = {
    val gramHash = hash64("substring(text, gi, 3)")
    val remix = toSigned(remixU(toUnsigned("gh"), "s.seed"))
    val foldKey = foldHash64U(s"list_transform(list(mv ORDER BY sidx), fku -> ${toUnsigned("fku")})")
    s"""gr AS (
       |  SELECT lang, doc_id,
       |         list_distinct(list_transform(range(1, greatest(length(text)-2, 0)+1),
       |           gi -> $gramHash)) AS grams
       |  FROM documents
       |), sized AS (
       |  SELECT lang, doc_id, grams, len(grams) AS n_grams FROM gr
       |), g AS (
       |  SELECT lang, doc_id, unnest(grams) AS gh FROM gr
       |), seeds AS (
       |  SELECT * FROM ${seedsValues(8)} t(sidx, seed)
       |), mins AS (
       |  SELECT g.lang, g.doc_id, s.sidx, min($remix) AS mv
       |  FROM g, seeds s GROUP BY g.lang, g.doc_id, s.sidx
       |), bands AS (
       |  SELECT lang, doc_id, sidx // 2 AS band, $foldKey AS bv
       |  FROM mins GROUP BY lang, doc_id, sidx // 2
       |), counted AS (
       |  SELECT *, count(*) OVER (PARTITION BY lang, band, bv) AS bk_n FROM bands
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
       |  WHERE round(n_inter * 1.0 / (na + nb - n_inter), 4) >= 0.4
       |)""".stripMargin
  }

  /** Oracle for q_dedup_ngram_jaccard (4 bands × r=2 over MinHash(8) of the
    * gram set, fold_hash64 band keys, cap 64, τ=0.4). */
  lazy val ngramJaccardSql: String =
    s"""WITH $ngramPipelineCtes
       |SELECT lang, id_a, id_b, jaccard FROM conf
       |ORDER BY lang, id_a, id_b""".stripMargin

  /** Oracle for q_dedup_clusters: connected components over the confirmed
    * pair list via recursive min-label reachability (pruned: a label only
    * propagates to nodes it could lower), then per-component sizes. */
  lazy val clustersSql: String =
    s"""WITH RECURSIVE $ngramPipelineCtes,
       |sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM conf WHERE jaccard >= 0.7
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM conf WHERE jaccard >= 0.7
       |), reach(node, lbl) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
       |  WHERE r.lbl < s.dst
       |), labels AS (
       |  SELECT node, min(lbl) AS cluster FROM reach GROUP BY node
       |)
       |SELECT cluster AS cluster_rep, count(*) AS n_docs
       |FROM labels GROUP BY cluster
       |ORDER BY n_docs DESC, cluster_rep ASC LIMIT 100""".stripMargin
}
