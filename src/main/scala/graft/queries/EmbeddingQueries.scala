package graft.queries

import graft.Q
import graft.sources.Tables

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column transforms a training pipeline runs before indexing or
  * export: L2 normalization and int8 quantization (the storage/serving
  * compression step — 4× smaller vectors at a measured reconstruction
  * error). Both are map-only column expressions (no shuffle except the
  * final small per-label aggregate), so they stream at any scale.
  *
  * Float math contract: elements are widened float32→float64 and folded
  * SEQUENTIALLY in array order (Spark `aggregate`), which the DuckDB
  * oracles replicate with `list_reduce` — per-row values are bit-identical
  * across engines; only the cross-row averages need rounding.
  */
object EmbeddingQueries {

  import graft.ops.VectorPrep

  private val seqSumSql = "list_reduce([CAST(0.0 AS DOUBLE)] || %s, (a, b) -> a + b)"

  /** X2 embedding normalization: per-label L2-norm stats plus the mean
    * first component after normalization (proves the rescale, not just the
    * norm computation). */
  private val embedNorm = Q(
    "q_embed_norm",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      e.withColumn("norm", VectorPrep.l2Norm(col("embedding")))
        .withColumn("first_n", element_at(col("embedding"), 1).cast("double") / col("norm"))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          round(avg(col("norm")), 4).as("avg_norm"),
          round(min(col("norm")), 4).as("min_norm"),
          round(avg(col("first_n")), 4).as("avg_first_normalized"))
        .orderBy(col("label"))
    },
    Some {
      val squares = "list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
      s"""WITH normed AS (
         |  SELECT label,
         |         sqrt(${seqSumSql.format(squares)}) AS norm,
         |         CAST(embedding[1] AS DOUBLE) AS x1
         |  FROM embeddings
         |)
         |SELECT label, count(*) AS n_vecs,
         |       round(avg(norm), 4) AS avg_norm,
         |       round(min(norm), 4) AS min_norm,
         |       round(avg(x1 / norm), 4) AS avg_first_normalized
         |FROM normed GROUP BY label ORDER BY label""".stripMargin
    })

  /** X2 int8 symmetric quantization: scale = max|x| / 127 per vector,
    * q = floor(x / scale) (floor, not round — identical semantics in both
    * engines), reconstruction error = mean |x - q·scale|. Per-label mean
    * error and scale quantify the compression loss. */
  private val embedQuantize = Q(
    "q_embed_quantize",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      e.withColumn("scale", VectorPrep.int8Scale(col("embedding")))
        .withColumn("mean_err",
          VectorPrep.quantError(col("embedding"), col("scale"), dim = 64))
        .groupBy(col("label"))
        .agg(
          count(lit(1)).as("n_vecs"),
          round(avg(col("scale")), 6).as("avg_scale"),
          round(avg(col("mean_err")), 6).as("avg_recon_err"),
          round(max(col("mean_err")), 6).as("max_recon_err"))
        .orderBy(col("label"))
    },
    Some {
      // max is order-independent (exact comparison), so list_max suffices;
      // the error SUM is a sequential fold to match Spark's aggregate()
      val errs = "list_transform(embedding, x -> coalesce(" +
        "abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / nullif(scale, 0)) * nullif(scale, 0)), 0.0))"
      s"""WITH scaled AS (
         |  SELECT label,
         |         embedding,
         |         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
         |  FROM embeddings
         |), erred AS (
         |  SELECT label, scale,
         |         ${seqSumSql.format(errs)} / 64.0 AS mean_err
         |  FROM scaled
         |)
         |SELECT label, count(*) AS n_vecs,
         |       round(avg(scale), 6) AS avg_scale,
         |       round(avg(mean_err), 6) AS avg_recon_err,
         |       round(max(mean_err), 6) AS max_recon_err
         |FROM erred GROUP BY label ORDER BY label""".stripMargin
    })

  private val KmK = 8
  private val KmIters = 3
  private val KmDim = 64

  /** Train the declared-query codebook (k lowest-id seeds, KmIters Lloyd
    * rounds) and assign the corpus: `(vec_id, embedding, cell, dist)`.
    * Shared by q_embed_kmeans, q_sample_cluster_balanced and
    * q_dedup_semdedup — the matching oracle replay is [[kmeansReplayCtes]]
    * (its `af` CTE is exactly this frame). */
  private[queries] def kmeansAssigned(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val e = Tables.t(spark, dir, "embeddings")
    val init = e.filter(col("vec_id") < KmK)
      .select(col("vec_id").cast("int"), col("embedding"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
      .toSeq
    val cents = graft.ops.KMeans.train(e, "embedding", init, KmIters)
    graft.ops.KMeans.assign(e, "embedding", cents)
  }

  /** The declared-parameter Lloyd replay chain (c0 → rounds → af) for
    * oracles outside this file. */
  private[queries] def kmeansReplayCtes: String = kmeansCtes(KmK, KmIters, KmDim)

  private[queries] def kmK: Int = KmK
  private[queries] def kmIters: Int = KmIters
  private[queries] def kmDim: Int = KmDim

  /** X2 semantic clustering (round 9): distributed Lloyd's k-means over the
    * corpus embeddings — the step that feeds cluster-balanced sampling and
    * IVF coarse-quantizer training. `ops/KMeans` is deterministic end to
    * end (kernel-fold distances, ties to the lowest cell, decimal-grid
    * centroid updates), so the DuckDB oracle replays EVERY Lloyd iteration
    * and the comparison covers the whole trajectory: cluster populations,
    * the first centroid component, and the within-cluster inertia under
    * the final codebook. */
  private val embedKmeans = Q(
    "q_embed_kmeans",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      // init = the k lowest-id vectors (the IVF-style deterministic seed)
      val init = e.filter(col("vec_id") < KmK)
        .select(col("vec_id").cast("int"), col("embedding"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
        .toSeq
      val cents = graft.ops.KMeans.train(e, "embedding", init, KmIters)
      val cf = spark.createDataFrame(cents.map { case (c, a) => (c, a(0).toDouble) })
        .toDF("cell", "c_first")
      graft.ops.KMeans.assign(e, "embedding", cents)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_members"),
          round(sum(col("dist") * col("dist")), 4).as("inertia"))
        .join(broadcast(cf), Seq("cell"))
        .select(col("cell"), col("n_members"), col("c_first"), col("inertia"))
        .orderBy(col("cell"))
    },
    Some(kmeansSql(KmK, KmIters, KmDim)))

  /** Unrolled Lloyd iterations in DuckDB, mirroring ops/KMeans step for
    * step: distance = sqrt of the sequential (x−y)² fold (list_reduce ≡
    * the MinkowskiDistance kernel loop), assignment ties to the lowest
    * cell, centroid update = sparkRound(avg, 6) narrowed through REAL
    * (the float32 codebook), empty cells carried by LEFT JOIN + coalesce. */
  private def kmeansSql(k: Int, iters: Int, dim: Int): String = {
    import graft.tools.DuckDbSql
    s"""WITH ${kmeansCtes(k, iters, dim)},
       |g AS (
       |  SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
       |         ${DuckDbSql.sparkRound("sum(d * d)", 4)} AS inertia
       |  FROM af GROUP BY cell)
       |SELECT g.cell, g.n_members, c.ce[1] AS c_first, g.inertia
       |FROM g JOIN c$iters c ON c.cell = g.cell
       |ORDER BY g.cell""".stripMargin
  }

  /** The shared Lloyd-replay WITH-chain: c0 → (a·, m·, c·)×iters → af,
    * where `af` is the final assignment (vec_id, embedding, cell, d) under
    * the trained codebook `c{iters}`. */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtesFrom(k, iters, dim, "embeddings", s"WHERE vec_id < $k")

  /** One Lloyd-assignment CTE: rows of `src` labeled with the nearest
    * `centsCte` cell (kernel-fold distance, ties to the lowest cell) —
    * reusable for assigning a SECOND source (e.g. a new batch) under an
    * already-trained codebook. */
  private[queries] def kmeansAssignCte(name: String, src: String,
      centsCte: String, keepD: Boolean, dim: Int = KmDim): String = {
    val diff = s"(CAST(e.embedding[kmi] AS DOUBLE) - c.ce[kmi])"
    val d2 =
      s"sqrt(list_reduce(list_transform(range(1, ${dim + 1}), kmi -> $diff * $diff), (kma, kmb) -> kma + kmb))"
    s"""$name AS MATERIALIZED (
       |  SELECT vec_id, embedding, cell${if (keepD) ", d" else ""} FROM (
       |    SELECT vec_id, embedding, cell, d,
       |           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cell ASC) AS rn
       |    FROM (SELECT e.vec_id, e.embedding, c.cell,
       |                 $d2 AS d
       |          FROM $src e, $centsCte c)) WHERE rn = 1)""".stripMargin
  }

  /** Lloyd replay over an arbitrary source CTE/table and init clause —
    * `initClause` selects the k seed rows of `src` (cell id = the seed's
    * vec_id, matching `ops.KMeans.train` init). */
  private[queries] def kmeansCtesFrom(k: Int, iters: Int, dim: Int,
      src: String, initClause: String): String = {
    import graft.tools.DuckDbSql
    def assignCte(name: String, centsCte: String, keepD: Boolean): String =
      kmeansAssignCte(name, src, centsCte, keepD, dim)
    val rounds = (1 to iters).map { r =>
      s"""${assignCte(s"a$r", s"c${r - 1}", keepD = false)},
         |m$r AS MATERIALIZED (
         |  SELECT cell, ui AS i,
         |         CAST(CAST(${DuckDbSql.sparkRound(s"avg(CAST(embedding[ui] AS DOUBLE))", 6)} AS REAL) AS DOUBLE) AS m
         |  FROM (SELECT cell, embedding, unnest(range(1, ${dim + 1})) AS ui FROM a$r)
         |  GROUP BY cell, ui),
         |c$r AS MATERIALIZED (
         |  SELECT c.cell, coalesce(nw.ce, c.ce) AS ce
         |  FROM c${r - 1} c LEFT JOIN (
         |    SELECT cell, list(m ORDER BY i) AS ce FROM m$r GROUP BY cell) nw
         |  ON nw.cell = c.cell)""".stripMargin
    }.mkString(",\n")
    s"""c0 AS MATERIALIZED (
       |  SELECT CAST(vec_id AS INTEGER) AS cell,
       |         list_transform(embedding, kmx -> CAST(kmx AS DOUBLE)) AS ce
       |  FROM $src $initClause),
       |$rounds,
       |${assignCte("af", s"c$iters", keepD = true)}""".stripMargin
  }

  /** X5b cluster-balanced sampling (round 9): exact-N-per-cluster draw
    * over the k-means cells — the "semantic stratification" a curation
    * pipeline uses to rebalance a scraped corpus (equal budget per
    * semantic cluster instead of per source tag). Selection = seeded-hash
    * rank within each cell (zero RNG state, the q_sample_stratified
    * doctrine); Spark's WindowGroupLimit turns rank<=N into a
    * per-partition top-N BEFORE the shuffle, so the exchanged rows are
    * bounded by N×cells×partitions, not the corpus. */
  private val sampleClusterBalanced = Q(
    "q_sample_cluster_balanced",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.t(spark, dir, "embeddings")
      val init = e.filter(col("vec_id") < KmK)
        .select(col("vec_id").cast("int"), col("embedding"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray)
        .toSeq
      val cents = graft.ops.KMeans.train(e, "embedding", init, KmIters)
      val w = Window.partitionBy(col("cell")).orderBy(col("h"), col("vec_id"))
      graft.ops.KMeans.assign(e, "embedding", cents)
        .withColumn("h", graft.functions.stable_hash64(col("vec_id").cast("string"), 17L))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("cell"), col("rk"), col("vec_id"))
        .orderBy(col("cell"), col("rk"))
    },
    Some {
      import graft.tools.DuckDbSql
      val h = DuckDbSql.hash64("CAST(vec_id AS VARCHAR)", 17L)
      s"""WITH ${kmeansCtes(KmK, KmIters, KmDim)},
         |ranked AS (
         |  SELECT cell, vec_id,
         |         row_number() OVER (PARTITION BY cell ORDER BY ($h), vec_id) AS rk
         |  FROM af)
         |SELECT cell, CAST(rk AS INTEGER) AS rk, vec_id
         |FROM ranked WHERE rk <= 10 ORDER BY cell, rk""".stripMargin
    })

  private val PcaDim = 64
  private val PcaQScale = 10000
  private val PcaIters = 8
  private val PcaXScale = 1000000L

  /** X2g distributed PCA (round 10) — dominant-variance direction of the
    * embedding corpus via the GRAM TRICK (one map-side pass accumulates
    * the d×d integer second-moment matrix; driver state and the power
    * iteration are d²-sized, independent of n — the spectral cousin of
    * q_embed_kmeans's codebook contract). Everything after quantization
    * is exact integer arithmetic (ops/Pca: floor-div rescale per
    * iteration, first-nonzero-positive sign), so the DuckDB oracle
    * replays the ENTIRE trajectory — Gram, all 8 power iterations, sign
    * canonicalization, projections — in HUGEINT and the top-10
    * most-extreme projections compare hash-exact. */
  private val embedPca = Q(
    "q_embed_pca",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val x = graft.ops.Pca.dominantDirection(
        e, "embedding", PcaDim, PcaQScale, PcaIters, PcaXScale)
      graft.ops.Pca.project(e, "vec_id", "embedding", PcaQScale, x)
        .orderBy(abs(col("proj")).desc, col("vec_id"))
        .limit(10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(abs(col("proj")).desc, col("vec_id"))))
        .select(col("rk"), col("vec_id"), col("proj"),
          lit(x(0).toLong).as("ev0"), lit(x(1).toLong).as("ev1"),
          lit(x(2).toLong).as("ev2"), lit(x(3).toLong).as("ev3"))
        .orderBy(col("rk"))
    },
    Some(pcaSql(PcaDim, PcaQScale, PcaIters, PcaXScale)))

  /** Unrolled exact-integer PCA in DuckDB: quantized coordinates, the
    * full Gram matrix by self-join, one MATERIALIZED (y, x) CTE pair per
    * power iteration (y = G·x in HUGEINT, x' = y·xScale // max|y| —
    * DuckDB `//` TRUNCATES toward zero, probe-verified -7//2 = -3, which
    * is exactly the kernel's BigInt `/`), first-nonzero-positive
    * sign, exact projections. Every float literal is CAST to DOUBLE (the
    * round-6 decimal-literal folding rule). */
  /** The shared first-direction replay: q → g (full symmetric matrix) →
    * x0 → unrolled power iterations → xs (sign-canonicalized x1). */
  private def pcaChainCtes(dim: Int, qScale: Int, iters: Int, xScale: Long): String = {
    val its = (1 to iters).map { k =>
      s"""y$k AS MATERIALIZED (
         |  SELECT g.i AS i, SUM(g.g * x.v) AS y
         |  FROM g JOIN x${k - 1} x ON x.i = g.j GROUP BY g.i),
         |x$k AS MATERIALIZED (
         |  SELECT i, y * $xScale // (SELECT MAX(abs(y)) FROM y$k) AS v
         |  FROM y$k)""".stripMargin
    }.mkString(",\n")
    s"""q AS MATERIALIZED (
       |  SELECT vec_id, gs.i AS i,
       |         CAST(floor(CAST(embedding[gs.i] AS DOUBLE) * CAST($qScale AS DOUBLE)
       |                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
       |  FROM embeddings, generate_series(1, $dim) gs(i)
       |  WHERE embedding IS NOT NULL AND len(embedding) = $dim),
       |g AS MATERIALIZED (
       |  SELECT a.i AS i, b.i AS j, SUM(CAST(a.q AS HUGEINT) * b.q) AS g
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i),
       |x0 AS MATERIALIZED (
       |  SELECT i, CAST($xScale AS HUGEINT) AS v FROM generate_series(1, $dim) t(i)),
       |$its,
       |xs AS MATERIALIZED (
       |  SELECT i, CASE WHEN (SELECT v FROM x$iters WHERE v <> 0 ORDER BY i LIMIT 1) < 0
       |                 THEN -v ELSE v END AS v
       |  FROM x$iters)""".stripMargin
  }

  private def pcaSql(dim: Int, qScale: Int, iters: Int, xScale: Long): String = {
    s"""WITH ${pcaChainCtes(dim, qScale, iters, xScale)},
       |proj AS MATERIALIZED (
       |  SELECT q.vec_id, CAST(SUM(CAST(q.q AS HUGEINT) * x.v) AS BIGINT) AS proj
       |  FROM q JOIN xs x ON x.i = q.i GROUP BY q.vec_id),
       |ranked AS (
       |  SELECT vec_id, proj,
       |         row_number() OVER (ORDER BY abs(proj) DESC, vec_id) AS rk
       |  FROM proj)
       |SELECT CAST(rk AS INTEGER) AS rk, vec_id, proj,
       |       (SELECT CAST(v AS BIGINT) FROM xs WHERE i = 1) AS ev0,
       |       (SELECT CAST(v AS BIGINT) FROM xs WHERE i = 2) AS ev1,
       |       (SELECT CAST(v AS BIGINT) FROM xs WHERE i = 3) AS ev2,
       |       (SELECT CAST(v AS BIGINT) FROM xs WHERE i = 4) AS ev3
       |FROM ranked WHERE rk <= 10 ORDER BY rk""".stripMargin
  }

  private val PcaDeflScale = 100L

  /** X2g-2 second principal component (round 10) — exact-integer Hotelling
    * deflation (`ops/Pca.deflated`): G₂ = (n²·G − λ·v'v'ᵀ) // n with
    * v' = x1 // 100 (down-scaled so the HUGEINT oracle replays without
    * overflow), then the SAME power iteration on G₂. Output = top-10 most
    * extreme second-axis projections plus the exact integer x1·x2 dot (the
    * orthogonality diagnostic — near zero relative to |x1||x2| ≈ 6.4e13).
    * Every step after quantization is integer arithmetic, so the oracle
    * replays BOTH trajectories — Gram, 8+8 iterations, deflation, signs,
    * projections — and compares hash-exact. */
  private val embedPca2 = Q(
    "q_embed_pca2",
    (spark, dir) => {
      val e = Tables.t(spark, dir, "embeddings")
      val g = graft.ops.Pca.collectGram(e, "embedding", PcaDim, PcaQScale)
      val x1 = graft.ops.Pca.powerIterate(g, PcaIters, PcaXScale)
      val x2 = graft.ops.Pca.powerIterate(
        graft.ops.Pca.deflated(g, x1, PcaDeflScale), PcaIters, PcaXScale)
      val dot12 = x1.zip(x2).map { case (a, b) => a * b }.sum
      graft.ops.Pca.project(e, "vec_id", "embedding", PcaQScale, x2)
        .withColumnRenamed("proj", "proj2")
        .orderBy(abs(col("proj2")).desc, col("vec_id"))
        .limit(10)
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(abs(col("proj2")).desc, col("vec_id"))))
        .select(col("rk"), col("vec_id"), col("proj2"),
          lit(dot12.toLong).as("dot12"))
        .orderBy(col("rk"))
    },
    Some(pca2Sql(PcaDim, PcaQScale, PcaIters, PcaXScale, PcaDeflScale)))

  /** Second-direction replay: the full first-direction chain, the
    * deflation CTEs (vd → nn → lam → g2), the second unrolled power
    * iteration (w-chain over g2), sign, projections. All HUGEINT; `//`
    * truncates toward zero on negatives = BigInt `/`. */
  private def pca2Sql(dim: Int, qScale: Int, iters: Int, xScale: Long,
      dScale: Long): String = {
    val its = (1 to iters).map { k =>
      s"""z$k AS MATERIALIZED (
         |  SELECT g2.i AS i, SUM(g2.g * w.v) AS y
         |  FROM g2 JOIN w${k - 1} w ON w.i = g2.j GROUP BY g2.i),
         |w$k AS MATERIALIZED (
         |  SELECT i, y * $xScale // (SELECT MAX(abs(y)) FROM z$k) AS v
         |  FROM z$k)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${pcaChainCtes(dim, qScale, iters, xScale)},
       |vd AS MATERIALIZED (SELECT i, v // $dScale AS v FROM xs),
       |nn AS MATERIALIZED (SELECT SUM(v * v) AS n FROM vd),
       |lam AS MATERIALIZED (
       |  SELECT SUM(a.v * g.g * b.v) AS l
       |  FROM g JOIN vd a ON a.i = g.i JOIN vd b ON b.i = g.j),
       |g2 AS MATERIALIZED (
       |  SELECT g.i AS i, g.j AS j,
       |         ((SELECT n FROM nn) * (SELECT n FROM nn) * g.g
       |          - (SELECT l FROM lam) * a.v * b.v) // (SELECT n FROM nn) AS g
       |  FROM g JOIN vd a ON a.i = g.i JOIN vd b ON b.i = g.j),
       |w0 AS MATERIALIZED (
       |  SELECT i, CAST($xScale AS HUGEINT) AS v FROM generate_series(1, $dim) t(i)),
       |$its,
       |ws AS MATERIALIZED (
       |  SELECT i, CASE WHEN (SELECT v FROM w$iters WHERE v <> 0 ORDER BY i LIMIT 1) < 0
       |                 THEN -v ELSE v END AS v
       |  FROM w$iters),
       |proj2 AS MATERIALIZED (
       |  SELECT q.vec_id, CAST(SUM(CAST(q.q AS HUGEINT) * w.v) AS BIGINT) AS proj2
       |  FROM q JOIN ws w ON w.i = q.i GROUP BY q.vec_id),
       |ranked AS (
       |  SELECT vec_id, proj2,
       |         row_number() OVER (ORDER BY abs(proj2) DESC, vec_id) AS rk
       |  FROM proj2)
       |SELECT CAST(rk AS INTEGER) AS rk, vec_id, proj2,
       |       (SELECT CAST(SUM(a.v * b.v) AS BIGINT)
       |        FROM xs a JOIN ws b ON b.i = a.i) AS dot12
       |FROM ranked WHERE rk <= 10 ORDER BY rk""".stripMargin
  }

  val all: Seq[Q] = Seq(embedNorm, embedQuantize, embedKmeans,
    sampleClusterBalanced, embedPca, embedPca2)
}
