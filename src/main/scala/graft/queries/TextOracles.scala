package graft.queries

import graft.tools.DuckDbSql._

/** DuckDB oracle SQL for the fingerprint/text queries whose outputs are
  * defined by the engine's stable hash family (see graft.tools.DuckDbSql for
  * the bit-exact SQL replication of TextOps.hash64 / simhash64 /
  * rollingFingerprint). */
object TextOracles {

  /** Oracle for q_text_fingerprint: per-document SimHash-64 (bit-majority
    * over seed-0 token hashes), order-sensitive rolling fingerprint
    * (acc*31 + seed-1 token hash, NO finalizer), and seed-0 content hash. */
  lazy val fingerprintSql: String = {
    val tokHash0 = hash64U("tk")
    val tokHash1 = hash64U("tk", 1L)
    val rolling = toSigned(
      s"list_reduce([${u(0xcbf29ce484222325L)}] || list_transform(string_split(text, ' '), tk -> $tokHash1)," +
        s" (rh, rv) -> ${wadd(wmul("rh", u(31L)), "rv")})")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_transform(string_split(text, ' '), tk -> $tokHash0)) AS h
       |  FROM documents
       |), bits AS (
       |  SELECT * FROM $bitValues64 t(bit, pw)
       |), votes AS (
       |  SELECT toks.doc_id, bits.bit, bits.pw,
       |         sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS c
       |  FROM toks, bits GROUP BY toks.doc_id, bits.bit, bits.pw
       |), sim AS (
       |  SELECT doc_id,
       |         ${toSigned(s"CAST(coalesce(sum(CASE WHEN c > 0 THEN CAST(pw AS HUGEINT) END), 0) AS UBIGINT)")} AS simhash
       |  FROM votes GROUP BY doc_id
       |), roll AS (
       |  SELECT doc_id, $rolling AS rolling_fp, ${hash64("text")} AS content_hash
       |  FROM documents
       |)
       |SELECT sim.doc_id AS doc_id, simhash, rolling_fp, content_hash
       |FROM sim JOIN roll ON sim.doc_id = roll.doc_id
       |ORDER BY sim.doc_id LIMIT 200""".stripMargin
  }

  /** Oracle for q_text_langid: per-profile score = number of distinct
    * profile stopwords present in the token stream; argmax with alphabetical
    * tiebreak; 'unknown' when the best score is 0. Profiles come from the
    * same Scala constant the query uses (TextQueries.langProfiles). */
  lazy val langIdSql: String = {
    val profiles = TextQueries.langProfiles
      .map { case (l, ws) => s"('$l', [${ws.map(w => s"'$w'").mkString(", ")}])" }
      .mkString("(VALUES ", ", ", ")")
    s"""WITH profiles AS (
       |  SELECT * FROM $profiles p(plang, words)
       |), scored AS (
       |  SELECT d.lang, d.doc_id, p.plang,
       |         len(list_filter(p.words, w -> list_contains(string_split(d.text, ' '), w))) AS score
       |  FROM documents d, profiles p
       |), best AS (
       |  SELECT lang, doc_id, plang, score,
       |         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang ASC) AS rn
       |  FROM scored
       |)
       |SELECT lang, CASE WHEN score > 0 THEN plang ELSE 'unknown' END AS predicted,
       |       count(*) AS n
       |FROM best WHERE rn = 1
       |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin
  }

  /** Oracle for q_text_rare_ngram: same bigram derivation (adjacent token
    * pairs of the single-space split), per-(doc, bigram) occurrence counts,
    * corpus totals, hapax-occurrence ratio. The ratio is BIGINT/BIGINT in
    * float64 — correctly-rounded IEEE division, bit-identical to Spark with
    * no fold-order subtleties; sparkRound guards the display rounding. */
  lazy val rareNgramSql: String = {
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), bi AS (
       |  SELECT doc_id, t[g.i] || ' ' || t[g.i + 1] AS bg
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i) g
       |), perdoc AS (
       |  SELECT doc_id, bg, count(*) AS occ FROM bi GROUP BY doc_id, bg
       |), corpus AS (
       |  SELECT bg, CAST(sum(occ) AS BIGINT) AS c FROM perdoc GROUP BY bg
       |), docstat AS (
       |  SELECT p.doc_id,
       |         CAST(sum(p.occ) AS BIGINT) AS n_bigrams,
       |         CAST(sum(CASE WHEN c.c <= 1 THEN p.occ ELSE 0 END) AS BIGINT) AS n_rare
       |  FROM perdoc p JOIN corpus c USING (bg)
       |  GROUP BY p.doc_id
       |), ranked AS (
       |  SELECT doc_id, n_bigrams, n_rare,
       |         CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS ratio,
       |         row_number() OVER (
       |           ORDER BY CAST(n_rare AS DOUBLE) / CAST(n_bigrams AS DOUBLE) DESC,
       |                    doc_id ASC) AS rn
       |  FROM docstat WHERE n_bigrams >= 5
       |)
       |SELECT CAST(rn AS INTEGER) AS rn, doc_id, n_bigrams, n_rare,
       |       ${graft.tools.DuckDbSql.sparkRound("ratio", 6)} AS rare_ratio
       |FROM ranked WHERE rn <= 15 ORDER BY rn""".stripMargin
  }
}
