package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed principal-direction extraction over an embedding column —
  * the curation diagnostic training pipelines run on corpus embeddings
  * (dominant-variance axis: topical drift detection, whitening input,
  * outlier projection; the spectral cousin of [[KMeans]]).
  *
  * The distributed shape is the GRAM TRICK: PCA on n×d data needs only
  * the d×d Gram/second-moment matrix G = Σ q qᵀ, accumulated in ONE
  * map-side pass (per-row upper-triangle pair products, hash-aggregated
  * with map-side combine to ≤ d(d+1)/2 keys) — never an n×n anything,
  * never a row collect. Driver state is G (d² integers = codebook-sized,
  * the [[KMeans]] collect contract) and the power iteration runs ON THE
  * DRIVER over that d×d matrix — its cost is independent of n.
  *
  * Determinism doctrine ([[PageRank]] applied to spectra): embeddings are
  * QUANTIZED to an integer grid (`q = floor(x·qScale + 0.5)` — computed
  * in IEEE double identically by any engine), so G is an exact integer
  * sum (order-free under any partitioning), each power-iteration step is
  * an exact integer matrix-vector product rescaled by TRUNCATING division
  * (`x' = y·xScale // max|y|` — DuckDB `//` truncates toward zero on
  * negatives, probe-verified `-7 // 2 = -3`, exactly BigInt `/`), and the
  * sign is canonicalized (first nonzero component positive). Every iterate is therefore bit-identical across
  * engines and an unrolled DuckDB oracle replays the WHOLE trajectory in
  * HUGEINT. Quantization costs ~1/qScale relative precision — a curation
  * diagnostic, not a numeric library; the payoff is reproducibility under
  * any row order, partitioning, or engine.
  */
object Pca {

  /** Integer-quantized coordinates: one array column of LONGs.
    * floor(x·s + 0.5) = round-half-toward-+inf, exact and identical in
    * IEEE double on both engines (float32 → double widening is exact). */
  def quantized(vecCol: Column, qScale: Int): Column =
    transform(vecCol, x => floor(x.cast("double") * lit(qScale.toDouble)
      + lit(0.5d)).cast("long"))

  /** Upper-triangle Gram matrix of the quantized vectors: (i, j, g) with
    * 0 ≤ i ≤ j < dim, g = Σ_rows q_i·q_j as DECIMAL(38,0) (overflow-free
    * at any row count — the PageRank sum doctrine). One map-side pass;
    * the shuffle carries ≤ d(d+1)/2 keys per map partition. */
  def gram(vecs: DataFrame, vecCol: String, dim: Int, qScale: Int): DataFrame = {
    // TWO plain posexplode generates instead of a nested-lambda pair
    // builder: q is projected ONCE per row below the first Generate
    // (inlining the transform would re-quantize the vector per pair —
    // the interpreted-HOF recompute class from the round-5 PQ fix, first
    // cut measured 40 s at sf0.1), and the pair fan-out runs through
    // GenerateExec's array fast path with zero lambda machinery (nested
    // transform/flatten/struct lambdas measured 4-6.5 s vs ~1 s for this
    // shape on 2k×64 vectors). Row j0 is the 0-based position WITHIN the
    // tail slice starting at i, so (i, i + j0) enumerates exactly the
    // upper triangle, diagonal included.
    vecs
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(quantized(col(vecCol), qScale).as("q"))
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"),
        posexplode(slice(col("q"), col("i") + 1, lit(dim))).as(Seq("j0", "qj")))
      .groupBy(col("i"), (col("i") + col("j0")).as("j"))
      .agg(sum((col("qi") * col("qj")).cast("decimal(38,0)")).as("g"))
  }

  /** The symmetric d×d Gram matrix, collected (d²-sized driver state). */
  def collectGram(vecs: DataFrame, vecCol: String, dim: Int,
      qScale: Int): Array[Array[BigInt]] = {
    val g = Array.ofDim[BigInt](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim) g(i)(j) = BigInt(0)
    gram(vecs, vecCol, dim, qScale).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val v = BigInt(r.getDecimal(2).toBigInteger)
      g(i)(j) = v
      g(j)(i) = v
    }
    g
  }

  /** `iters` exact-integer power iterations over a symmetric integer
    * matrix: x₀ = (xScale, …, xScale); per step y = G·x, x' = y·xScale //
    * max|y| (truncating division, = BigInt `/` = DuckDB `//` — every
    * component lands in [−xScale, xScale]); final sign canonicalized so
    * the first nonzero component is positive. */
  def powerIterate(g: Array[Array[BigInt]], iters: Int,
      xScale: Long): Array[BigInt] = {
    val dim = g.length
    var x = Array.fill(dim)(BigInt(xScale))
    var it = 0
    while (it < iters) {
      val y = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + g(i)(j) * x(j)))
      val m = y.map(_.abs).max
      require(m.signum > 0,
        "pca: zero iterate — matrix annihilated the iterate (rank-deficient input)")
      x = y.map(v => (v * BigInt(xScale)) / m) // BigInt / truncates = DuckDB //
      it += 1
    }
    val firstNz = x.indexWhere(_.signum != 0)
    require(firstNz >= 0, "pca: zero eigendirection")
    if (x(firstNz).signum < 0) x.map(-_) else x
  }

  /** Dominant eigendirection of the Gram matrix (see [[powerIterate]]).
    * Returns the `dim` integer components. */
  def dominantDirection(vecs: DataFrame, vecCol: String, dim: Int,
      qScale: Int, iters: Int, xScale: Long): Array[BigInt] = {
    require(dim >= 1 && iters >= 1 && xScale >= 1,
      s"pca: dim/iters/xScale must be positive ($dim/$iters/$xScale)")
    powerIterate(collectGram(vecs, vecCol, dim, qScale), iters, xScale)
  }

  /** EXACT-INTEGER deflation: the matrix whose power iteration yields the
    * second principal direction. With v' = v // dScale (down-scaled so a
    * HUGEINT oracle replays without overflow), n = v'ᵀv', λ = v'ᵀGv':
    *
    *   G₂ = (n²·G − λ·v'v'ᵀ) // n    (elementwise truncating division)
    *
    * For the exact eigenvector this is the classic Hotelling deflation
    * scaled by n > 0 (G₂v' ≈ 0; G₂w = n·Gw for w ⟂ v'), so the top
    * direction of G₂ is the second component. v is an ITERATE, not the
    * exact eigenvector, and the division truncates — both deviations are
    * deterministic and replayed bit-for-bit by the oracle; the planted-axis
    * spec shows the recovered direction is the true second axis on clean
    * fixtures. Sign of v is irrelevant (v'v'ᵀ is even in v'). */
  def deflated(g: Array[Array[BigInt]], v: Array[BigInt],
      dScale: Long): Array[Array[BigInt]] = {
    val dim = g.length
    require(v.length == dim, s"pca: direction dim ${v.length} != gram dim $dim")
    val vd = v.map(_ / BigInt(dScale))
    val n = vd.foldLeft(BigInt(0))((acc, c) => acc + c * c)
    require(n.signum > 0, "pca: deflation direction vanished under dScale")
    val lam = (0 until dim).foldLeft(BigInt(0)) { (acc, i) =>
      acc + vd(i) * (0 until dim).foldLeft(BigInt(0))((a, j) => a + g(i)(j) * vd(j))
    }
    Array.tabulate(dim, dim)((i, j) => (n * n * g(i)(j) - lam * vd(i) * vd(j)) / n)
  }

  /** Exact integer projection of every row onto `direction`: (idCol,
    * proj) — map-side fold of q·x over the 64-element zip, no shuffle.
    * Caller guarantees `direction` came from the same (dim, qScale). */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
      qScale: Int, direction: Array[BigInt]): DataFrame = {
    val dir = typedlit(direction.map(_.toLong).toSeq)
    val q = quantized(col(vecCol), qScale)
    vecs
      .where(col(vecCol).isNotNull && size(col(vecCol)) === direction.length)
      .select(col(idCol),
        aggregate(zip_with(q, dir, (a, b) => a * b),
          lit(0L).cast("decimal(38,0)"),
          (acc, p) => acc + p.cast("decimal(38,0)")).cast("long").as("proj"))
  }
}
