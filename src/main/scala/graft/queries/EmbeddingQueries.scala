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

  val all: Seq[Q] = Seq(embedNorm, embedQuantize)
}
