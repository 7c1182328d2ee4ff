package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-column preparation kernels (L2 norm, int8 quantization) used
  * by the declared q_embed_* queries and available as a library API. All
  * are pure column expressions: float32 elements widen to float64 and fold
  * SEQUENTIALLY in array order, so results are reproducible bit-for-bit
  * across engines and partitionings (the DuckDB oracles rely on it).
  */
object VectorPrep {

  private def xd(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential sum fold in array order. */
  def seqSum(c: Column): Column = aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** L2 norm of a float-array column, accumulated in float64. */
  def l2Norm(c: Column): Column = sqrt(seqSum(transform(xd(c), x => x * x)))

  /** Unit-normalized copy of a float-array column (float64 elements). */
  def l2Normalize(c: Column): Column = {
    val n = l2Norm(c)
    transform(xd(c), x => x / n)
  }

  /** Symmetric int8 scale: max|x| / 127 (order-independent, exact). */
  def int8Scale(c: Column): Column =
    aggregate(xd(c), lit(0.0), (a, x) => greatest(a, abs(x))) / 127.0

  /** Zero-safe divisor: an all-zero embedding has scale 0; dividing by it
    * diverges between engines (Spark Inf/NaN vs DuckDB NULL/error). NULL
    * the divisor and coalesce the element back to 0.0 — the exact answer
    * for a zero vector (oracles mirror with nullif(scale, 0)). */
  private def safeScale(scale: Column): Column =
    when(scale === 0.0, lit(null).cast("double")).otherwise(scale)

  /** Mean |x − floor(x/scale)·scale| reconstruction error of int8
    * quantization at the given scale (floor, not round: floor has
    * identical semantics everywhere; per-element error is < scale). */
  def quantError(c: Column, scale: Column, dim: Int): Column = {
    val s = safeScale(scale)
    seqSum(transform(xd(c), x =>
      coalesce(abs(x - floor(x / s) * s), lit(0.0)))) / dim.toDouble
  }

  /** Dequantized int8 approximation of a float-array column (float64
    * elements) — what a scanner reconstructs from the compressed index. */
  def dequantized(c: Column, scale: Column): Column = {
    val s = safeScale(scale)
    transform(c, x => coalesce(floor(x.cast("double") / s) * s, lit(0.0)))
  }

  /** Cosine over two float64-array columns, sequential folds (bit-exact
    * vs DuckDB list_reduce — rankings on it agree across engines). */
  def cosineDouble(a: Column, b: Column): Column = {
    val dot = seqSum(zip_with(a, b, (x, y) => x * y))
    val na = seqSum(transform(a, x => x * x))
    val nb = seqSum(transform(b, x => x * x))
    dot / (sqrt(na) * sqrt(nb))
  }
}
