package graft.queries

/** DuckDB oracle SQL for the vector-similarity queries. The engine's
  * native kernels (graft.expressions.VectorOps) accumulate float32 inputs
  * into float64 sequentially in array order; these oracles replicate that
  * with `list_reduce` folds (sequential by definition) over `CAST(x AS
  * DOUBLE)` products, so dot products, cosines, and SRP bucket signs are
  * bit-identical — not merely close — between engines. The SRP hyperplanes
  * are inlined as literals from the same `SimilarityQueries.planes`
  * constants the queries use (rendered via Double.toString, which
  * round-trips exactly). */
object SimilarityOracles {

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  private def sym(p: String) = p + counter.incrementAndGet()

  /** Sequential left fold sum (matches the kernels' loop order). */
  private def seqSum(listExpr: String): String = {
    val a = sym("sa")
    val b = sym("sb")
    s"list_reduce($listExpr, ($a, $b) -> $a + $b)"
  }

  /** Float32 element as float64, 1-based index. */
  private def el(col: String)(i: String): String = s"CAST($col[$i] AS DOUBLE)"

  private def dot(a: String => String, b: String => String, dim: Int = 64): String = {
    val i = sym("di")
    seqSum(s"list_transform(range(1, ${dim + 1}), $i -> ${a(i)} * ${b(i)})")
  }

  /** cosine(aCol, bCol) — VectorOps.cosine replica (float cols). */
  private[queries] def cos(aCol: String, bCol: String): String = {
    val d = dot(el(aCol), el(bCol))
    val na = dot(el(aCol), el(aCol))
    val nb = dot(el(bCol), el(bCol))
    s"($d / (sqrt($na) * sqrt($nb)))"
  }

  /** The SRP plane as a DOUBLE list literal: the exact float32 values the
    * Spark query feeds DotProduct (lit(v.toFloat)), widened to double. */
  private def planeLit(p: Array[Double]): String =
    p.map(v => java.lang.Double.toString(v.toFloat.toDouble)).mkString("[", ", ", "]")

  /** srpBucket(embCol, nPlanes) replica: bit j = sign(emb · plane_j). */
  private def srpBucket(embCol: String, nPlanes: Int): String = {
    val ps = SimilarityQueries.planes(nPlanes, 64)
    (0 until nPlanes).map { j =>
      val d = dot(el(embCol), i => s"(${planeLit(ps(j))})[$i]")
      s"(CASE WHEN $d > 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Oracle for q_dedup_embedding: SRP(8)-bucketed near-dup candidate pairs
    * with raw-double cosine >= 0.9 confirmation. */
  lazy val dedupEmbeddingSql: String = {
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${srpBucket("embedding", 8)} AS bucket FROM embeddings
       |), pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         ${cos("a.embedding", "b.embedding")} AS c
       |  FROM bucketed a JOIN bucketed b
       |    ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |)
       |SELECT count(*) AS n_candidate_pairs,
       |       count(CASE WHEN c >= 0.9 THEN 1 END) AS n_near_dup,
       |       round(coalesce(max(c), -1.0), 4) AS max_cos
       |FROM pairs""".stripMargin
  }

  /** Oracle for q_dedup_semantic: SRP(8)-bucketed cosine≥0.9 edges →
    * recursive min-label connected components → survivor accounting
    * (one keeper per cluster, singletons all survive). */
  lazy val dedupSemanticSql: String = {
    s"""WITH RECURSIVE bucketed AS (
       |  SELECT vec_id, embedding, ${srpBucket("embedding", 8)} AS bucket FROM embeddings
       |), counted AS (
       |  SELECT vec_id, embedding, bucket,
       |         count(*) OVER (PARTITION BY bucket) AS bk_n
       |  FROM bucketed
       |), salted AS (
       |  SELECT vec_id, embedding, bucket,
       |         vec_id % CAST(ceil(bk_n / 256.0) AS BIGINT) AS sub
       |  FROM counted
       |), pairs AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
       |  FROM salted a JOIN salted b
       |    ON a.bucket = b.bucket AND a.sub = b.sub AND a.vec_id < b.vec_id
       |  WHERE ${cos("a.embedding", "b.embedding")} >= 0.9
       |), sym AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), reach(node, lbl) AS (
       |  SELECT src, src FROM sym
       |  UNION
       |  SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node
       |  WHERE r.lbl < s.dst
       |), labels AS (
       |  SELECT node, min(lbl) AS cluster FROM reach GROUP BY node
       |)
       |SELECT (SELECT count(*) FROM embeddings) AS n_vectors,
       |       (SELECT count(*) FROM pairs) AS n_edges,
       |       count(*) AS n_clustered,
       |       count(DISTINCT cluster) AS n_clusters,
       |       (SELECT count(*) FROM embeddings) - (count(*) - count(DISTINCT cluster)) AS n_survivors
       |FROM labels""".stripMargin
  }

  /** Oracle for q_sim_ann_lsh: SRP(8)-bucketed ANN, queries vec_id < 20,
    * in-bucket top-3 by (rounded sim desc, nid). */
  lazy val annLshSql: String = {
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${srpBucket("embedding", 8)} AS bucket FROM embeddings
       |), q AS (
       |  SELECT vec_id AS qid, embedding AS qe, bucket FROM bucketed WHERE vec_id < 20
       |), sims AS (
       |  SELECT q.qid, c.vec_id AS nid,
       |         round(${cos("q.qe", "c.embedding")}, 4) AS sim
       |  FROM bucketed c JOIN q USING (bucket) WHERE c.vec_id <> q.qid
       |), ranked AS (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM sims
       |)
       |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Oracle for q_sim_ann_quantized_lsh: the composed two-stage int8
    * retrieval over the SRP(8) bucket candidate stream
    * (Similarity.annTopKQuantized) — bucket join, int8-dequantized approx
    * shortlist of 8 (sequential float64 folds, bit-exact), exact float
    * cosine refine to top-3. Queries vec_id < 20, single probe. */
  lazy val annQuantizedLshSql: String = {
    def dqel(col: String)(i: String): String = s"$col[$i]"
    val adot = dot(dqel("q.qv"), dqel("c.v"))
    val anq = dot(dqel("q.qv"), dqel("q.qv"))
    val anc = dot(dqel("c.v"), dqel("c.v"))
    s"""WITH bucketed AS (
       |  SELECT vec_id, embedding, ${srpBucket("embedding", 8)} AS bucket,
       |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |  FROM embeddings
       |), dq AS (
       |  SELECT vec_id, embedding, bucket,
       |         list_transform(embedding, x -> coalesce(floor(CAST(x AS DOUBLE) / nullif(scale, 0)) * nullif(scale, 0), 0.0)) AS v
       |  FROM bucketed
       |), q AS (
       |  SELECT vec_id AS qid, embedding AS qe, v AS qv, bucket FROM dq WHERE vec_id < 20
       |), s1 AS (
       |  SELECT q.qid, c.vec_id AS nid, q.qe, c.embedding AS ce,
       |         ($adot) / (sqrt($anq) * sqrt($anc)) AS asim
       |  FROM dq c JOIN q USING (bucket) WHERE c.vec_id <> q.qid
       |), short AS (
       |  SELECT qid, nid, qe, ce,
       |         row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid ASC) AS arn
       |  FROM s1
       |), refined AS (
       |  SELECT qid, nid, round(${cos("qe", "ce")}, 4) AS sim
       |  FROM short WHERE arn <= 8
       |), ranked AS (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM refined
       |)
       |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Oracle for q_sim_ann_multiprobe: SRP(8) ANN with 3-probe queries —
    * own bucket + the two buckets across the nearest hyperplanes (flip bits
    * ranked by |dot| asc, mask asc), replicating srpProbeBuckets. */
  lazy val annMultiprobeSql: String = {
    val ps = SimilarityQueries.planes(8, 64)
    val dotCols = (0 until 8)
      .map(j => s"${dot(el("embedding"), i => s"(${planeLit(ps(j))})[$i]")} AS d$j")
      .mkString(",\n         ")
    val bucket = (0 until 8)
      .map(j => s"(CASE WHEN d$j > 0.0 THEN ${1 << j} ELSE 0 END)")
      .mkString("(", " + ", ")")
    val flips = (0 until 8)
      .map(j => s"{'a': abs(d$j), 'm': ${1 << j}}")
      .mkString("[", ", ", "]")
    s"""WITH scored AS (
       |  SELECT vec_id, embedding,
       |         $dotCols
       |  FROM embeddings
       |), bucketed AS (
       |  SELECT vec_id, embedding, $bucket AS bucket, list_sort($flips) AS flips
       |  FROM scored
       |), qp AS (
       |  SELECT vec_id AS qid, embedding AS qe,
       |         unnest([bucket] || list_transform(flips[1:2],
       |           f -> xor(bucket, struct_extract(f, 'm')))) AS bucket
       |  FROM bucketed WHERE vec_id < 20
       |), sims AS (
       |  SELECT qp.qid, c.vec_id AS nid,
       |         round(${cos("qp.qe", "c.embedding")}, 4) AS sim
       |  FROM bucketed c JOIN qp USING (bucket) WHERE c.vec_id <> qp.qid
       |), ranked AS (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM sims
       |)
       |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Oracle for q_sim_centroids: per-label mean embedding (each mean rounded
    * to 6 decimals, then narrowed to float32 — matching the query), cosine
    * of every label pair. */
  lazy val centroidsSql: String = {
    // centroid element as double: the float32 narrowing replica
    def cel(col: String)(i: String): String = s"CAST(CAST($col[$i] AS REAL) AS DOUBLE)"
    val d = dot(cel("a.centroid"), cel("b.centroid"))
    val na = dot(cel("a.centroid"), cel("a.centroid"))
    val nb = dot(cel("b.centroid"), cel("b.centroid"))
    s"""WITH pos AS (
       |  SELECT label, ui AS i, round(avg(CAST(embedding[ui] AS DOUBLE)), 6) AS m
       |  FROM (SELECT label, embedding, unnest(range(1, 65)) AS ui FROM embeddings)
       |  GROUP BY label, ui
       |), cents AS (
       |  SELECT label, list(m ORDER BY i) AS centroid FROM pos GROUP BY label
       |)
       |SELECT a.label AS label_a, b.label AS label_b,
       |       round($d / (sqrt($na) * sqrt($nb)), 4) AS centroid_cos
       |FROM cents a JOIN cents b ON a.label < b.label
       |ORDER BY label_a, label_b""".stripMargin
  }

  /** Oracle for q_sim_ann_ivf: 16 coarse centroids (= embeddings vec_id<16),
    * candidates assigned to their argmax-cosine cell, queries (20<=id<40)
    * probe their top-2 cells, exact in-cell top-3. */
  lazy val annIvfSql: String = {
    s"""WITH cents AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce FROM embeddings WHERE vec_id < 16
       |), scored AS (
       |  SELECT e.vec_id, e.embedding, c.cell,
       |         ${cos("e.embedding", "c.ce")} AS cs
       |  FROM embeddings e, cents c
       |), ranked_cells AS (
       |  SELECT vec_id, embedding, cell, cs,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS crn
       |  FROM scored
       |), cands AS (
       |  SELECT vec_id, embedding, cell FROM ranked_cells WHERE crn = 1
       |), qs AS (
       |  SELECT vec_id AS qid, embedding AS qe, cell
       |  FROM ranked_cells WHERE crn <= 2 AND vec_id >= 20 AND vec_id < 40
       |), sims AS (
       |  SELECT q.qid, c.vec_id AS nid,
       |         round(${cos("q.qe", "c.embedding")}, 4) AS sim
       |  FROM cands c JOIN qs q USING (cell) WHERE c.vec_id <> q.qid
       |), ranked AS (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM sims
       |)
       |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Oracle for q_sim_vector_similarity — the VECTOR_SIMILARITY predicate
    * routed through the registered AnnIndex: candidates = vectors whose
    * best cell (cos desc, cell asc — the shared cellsOf contract) is among
    * the query vector's 2 best cells; exact cosine over candidates, top-10
    * by (rounded sim desc, id asc), NO self-exclusion (the query is a
    * literal vector, not a row — the identical row ranks first at 1.0).
    * The displayed sim replicates the projection's 1−COSINEDISTANCE double
    * chain; the RANKING sim is round(cos, 4) as in AnnIndex.topK. */
  lazy val vectorSimilaritySql: String = {
    s"""WITH cents AS (
       |  SELECT CAST(vec_id AS INTEGER) AS cell, embedding AS ce
       |  FROM embeddings WHERE vec_id < 16
       |), scored AS (
       |  SELECT e.vec_id, e.embedding, c.cell, ${cos("e.embedding", "c.ce")} AS cs
       |  FROM embeddings e, cents c
       |), ranked_cells AS (
       |  SELECT vec_id, embedding, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS crn
       |  FROM scored
       |), cands AS (
       |  SELECT vec_id, embedding, cell FROM ranked_cells WHERE crn = 1
       |), q AS (
       |  SELECT embedding AS qe FROM embeddings WHERE vec_id = 0
       |), qcells AS (
       |  SELECT cell FROM (
       |    SELECT c.cell,
       |           row_number() OVER (ORDER BY ${cos("q0.qe", "c.ce")} DESC, c.cell ASC) AS crn
       |    FROM cents c, q q0) WHERE crn <= 2
       |), sims AS (
       |  SELECT c.vec_id AS nid,
       |         round(${cos("q1.qe", "c.embedding")}, 4) AS rank_sim,
       |         round(CAST(1.0 AS DOUBLE) -
       |               (CAST(1.0 AS DOUBLE) - ${cos("q1.qe", "c.embedding")}), 4) AS sim
       |  FROM cands c JOIN qcells USING (cell) CROSS JOIN q q1
       |), ranked AS (
       |  SELECT nid, sim, row_number() OVER (ORDER BY rank_sim DESC, nid ASC) AS rn
       |  FROM sims
       |)
       |SELECT CAST(nid AS BIGINT) AS vec_id, sim
       |FROM ranked WHERE rn <= 10 ORDER BY sim DESC, vec_id""".stripMargin
  }

  /** Sequential float64 squared-L2 between 16-element block `b` (0-based,
    * column `bCol`) of two float vectors — the `Pq.l2sqBlock` replica:
    * the i = 1..16 sequential fold of (x−y)², then sqrt, then square —
    * matching the Spark side's MinkowskiDistance-kernel-then-square
    * composition exactly (same fold value → same IEEE sqrt → same
    * product). */
  private def l2sqBlk(aCol: String, cCol: String, bCol: String): String = {
    val i = sym("pi")
    val diff = s"(CAST($aCol[$bCol*16+$i] AS DOUBLE) - CAST($cCol[$bCol*16+$i] AS DOUBLE))"
    val fold = seqSum(s"list_transform(range(1, 17), $i -> $diff * $diff)")
    val s = sym("sq")
    s"(list_transform([sqrt($fold)], $s -> $s * $s)[1])"
  }

  /** Oracle for q_sim_ann_pq (IVF-PQ + ADC): coarse cells as in
    * annIvfSql; PQ codes = per-(vector, block) argmin of the block
    * distance to the 16 sample centroids (ties to the lowest j); a pair's
    * ADC = the query's block distances at the candidate's codes, folded in
    * block order (list(d ORDER BY b) — matches the Spark-side sequential
    * aggregate over b = 1..4). */
  /** Shared CTE chain for the PQ oracles: cells, block distances, codes,
    * probed pairs, and the per-pair ADC sum. */
  private lazy val annPqCtes: String = {
    s"""WITH cents AS (
       |  SELECT CAST(vec_id AS INTEGER) AS j, embedding AS ce FROM embeddings WHERE vec_id < 16
       |), cscored AS (
       |  SELECT e.vec_id, e.embedding, c.j AS cell,
       |         ${cos("e.embedding", "c.ce")} AS cs
       |  FROM embeddings e, cents c
       |), ranked_cells AS (
       |  SELECT vec_id, cell,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell ASC) AS crn
       |  FROM cscored
       |), blkd AS (
       |  SELECT e.vec_id, blocks.b, c.j,
       |         ${l2sqBlk("e.embedding", "c.ce", "blocks.b")} AS d
       |  FROM embeddings e, cents c, (SELECT unnest(range(0, 4)) AS b) blocks
       |), codes AS (
       |  SELECT vec_id, b, j AS code FROM (
       |    SELECT vec_id, b, j,
       |           row_number() OVER (PARTITION BY vec_id, b ORDER BY d ASC, j ASC) AS rn
       |    FROM blkd)
       |  WHERE rn = 1
       |), cands AS (
       |  SELECT vec_id AS nid, cell FROM ranked_cells WHERE crn = 1
       |), qs AS (
       |  SELECT vec_id AS qid, cell FROM ranked_cells
       |  WHERE crn <= 2 AND vec_id >= 20 AND vec_id < 40
       |), pairs AS (
       |  SELECT q.qid, c.nid FROM cands c JOIN qs q USING (cell) WHERE c.nid <> q.qid
       |), adc AS (
       |  SELECT p.qid, p.nid,
       |         list_reduce(list(bl.d ORDER BY bl.b), (sa, sb) -> sa + sb) AS adc
       |  FROM pairs p
       |  JOIN codes co ON co.vec_id = p.nid
       |  JOIN blkd bl ON bl.vec_id = p.qid AND bl.b = co.b AND bl.j = co.code
       |  GROUP BY p.qid, p.nid
       |)""".stripMargin
  }

  /** Oracle for q_sim_ann_pq (IVF-PQ + ADC): coarse cells as in
    * annIvfSql; PQ codes = per-(vector, block) argmin of the block
    * distance to the 16 sample centroids (ties to the lowest j); a pair's
    * ADC = the query's block distances at the candidate's codes, folded in
    * block order (list(d ORDER BY b) — matches the Spark-side sequential
    * aggregate over b = 1..4). */
  lazy val annPqSql: String = {
    s"""$annPqCtes, ranked AS (
       |  -- rank on the ROUNDED value: the Spark side rounds before its
       |  -- window, so the tiebreak must see the same numbers
       |  SELECT qid, nid, round(adc, 4) AS adc,
       |         row_number() OVER (PARTITION BY qid ORDER BY round(adc, 4) ASC, nid ASC) AS rn
       |  FROM adc
       |)
       |SELECT qid, rn, nid, adc FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }

  /** Oracle for q_sim_ann_pq_trained — the distributed k-means trainer
    * (Pq.trainDistributed) UNROLLED in SQL: two Lloyd iterations as chained
    * CTEs. Replication is bit-exact because both engines are deterministic
    * by construction: assignment distances fold (v−c)² sequentially in
    * element order (the rawL2sq zip_with replica — init-0.0 left fold and
    * DuckDB's seedless list_reduce bracket identically since 0.0+x == x);
    * centroid updates sum float64 in sid order (list(... ORDER BY sid))
    * then /count then CAST to REAL — exactly the ordered-fold update the
    * Spark side uses; empty clusters COALESCE back to the previous
    * centroid; argmin ties break to the lowest code. The final corpus
    * encode uses the l2sqBlk sqrt-then-square composition (encodeCol's
    * MinkowskiDistance kernel), NOT the raw training fold — the two folds
    * differ by a ulp and each side must use its own. */
  lazy val annPqTrainedSql: String = {
    def trainFold(v: String, c: String, ord: String): String = {
      val dd = s"(CAST($v AS DOUBLE) - CAST($c AS DOUBLE))"
      val (fa, fb) = (sym("fa"), sym("fb"))
      s"list_reduce(list($dd * $dd ORDER BY $ord), ($fa, $fb) -> $fa + $fb)"
    }
    def sumFold(v: String, ord: String): String = {
      val (ga, gb) = (sym("ga"), sym("gb"))
      s"list_reduce(list(CAST($v AS DOUBLE) ORDER BY $ord), ($ga, $gb) -> $ga + $gb)"
    }
    def iteration(n: Int): String = {
      val prev = s"cents${n - 1}"
      s"""d$n AS (
         |  SELECT s.sid, s.b, c.j, ${trainFold("s.v", "c.c", "s.pos")} AS d
         |  FROM sblk s JOIN $prev c ON c.b = s.b AND c.pos = s.pos
         |  GROUP BY s.sid, s.b, c.j
         |), a$n AS (
         |  SELECT sid, b, j AS code FROM (
         |    SELECT sid, b, j,
         |           row_number() OVER (PARTITION BY sid, b ORDER BY d ASC, j ASC) AS rn
         |    FROM d$n) WHERE rn = 1
         |), u$n AS (
         |  SELECT a.b, a.code AS j, s.pos,
         |         CAST(${sumFold("s.v", "s.sid")} / count(*) AS REAL) AS c
         |  FROM a$n a JOIN sblk s ON s.sid = a.sid AND s.b = a.b
         |  GROUP BY a.b, a.code, s.pos
         |), cents$n AS (
         |  SELECT p.b, p.j, p.pos, COALESCE(u.c, p.c) AS c
         |  FROM $prev p LEFT JOIN u$n u ON u.b = p.b AND u.j = p.j AND u.pos = p.pos
         |)""".stripMargin
    }
    val encDiff = s"(CAST(e.embedding[c.b*16 + c.pos] AS DOUBLE) - CAST(c.c AS DOUBLE))"
    val (ea, eb) = (sym("ea"), sym("eb"))
    val encFold = s"list_reduce(list($encDiff * $encDiff ORDER BY c.pos), ($ea, $eb) -> $ea + $eb)"
    val esq = sym("esq")
    s"""WITH sample AS (
       |  SELECT CAST(vec_id AS BIGINT) AS sid, embedding FROM embeddings WHERE vec_id < 32
       |), sblk AS (
       |  SELECT s.sid, CAST(bl.b AS INTEGER) AS b, CAST(p.pos AS INTEGER) AS pos,
       |         s.embedding[bl.b*16 + p.pos] AS v
       |  FROM sample s,
       |       (SELECT unnest(range(0, 4)) AS b) bl,
       |       (SELECT unnest(range(1, 17)) AS pos) p
       |), init AS (
       |  SELECT sid, CAST(j AS INTEGER) AS j FROM (
       |    SELECT sid, row_number() OVER (ORDER BY sid) - 1 AS j FROM sample)
       |  WHERE j < 4
       |), cents0 AS (
       |  SELECT sb.b, i.j, sb.pos, sb.v AS c
       |  FROM init i JOIN sblk sb ON sb.sid = i.sid
       |), ${iteration(1)}, ${iteration(2)}, encd AS (
       |  SELECT e.vec_id, c.b, c.j,
       |         (list_transform([sqrt($encFold)], $esq -> $esq * $esq)[1]) AS d
       |  FROM embeddings e, cents2 c
       |  GROUP BY e.vec_id, c.b, c.j
       |), codes AS (
       |  SELECT vec_id, b, j AS code FROM (
       |    SELECT vec_id, b, j,
       |           row_number() OVER (PARTITION BY vec_id, b ORDER BY d ASC, j ASC) AS rn
       |    FROM encd) WHERE rn = 1
       |), hist AS (
       |  SELECT b, code, CAST(count(*) AS BIGINT) AS n_vecs FROM codes GROUP BY b, code
       |), csum AS (
       |  SELECT b, j AS code, ${sumFold("c", "pos")} AS raw_sum
       |  FROM cents2 GROUP BY b, j
       |)
       |SELECT CAST(cs.b AS INTEGER) AS b, CAST(cs.code AS INTEGER) AS code,
       |       CAST(COALESCE(h.n_vecs, 0) AS BIGINT) AS n_vecs,
       |       ${graft.tools.DuckDbSql.sparkRound("cs.raw_sum", 4)} AS cent_sum
       |FROM csum cs LEFT JOIN hist h ON h.b = cs.b AND h.code = cs.code
       |ORDER BY b, code""".stripMargin
  }

  /** Oracle for q_sim_ann_pq_rerank: the 10-wide ADC shortlist of the PQ
    * oracle, exact-cosine re-ranked to top-3. */
  lazy val annPqRerankSql: String = {
    s"""$annPqCtes, shortlist AS (
       |  SELECT qid, nid FROM (
       |    SELECT qid, nid,
       |           row_number() OVER (PARTITION BY qid ORDER BY adc ASC, nid ASC) AS srn
       |    FROM adc)
       |  WHERE srn <= 10
       |), reranked AS (
       |  SELECT s.qid, s.nid,
       |         round(${cos("q.embedding", "c.embedding")}, 4) AS sim
       |  FROM shortlist s
       |  JOIN embeddings q ON q.vec_id = s.qid
       |  JOIN embeddings c ON c.vec_id = s.nid
       |), ranked AS (
       |  SELECT qid, nid, sim,
       |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
       |  FROM reranked
       |)
       |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
  }
}
