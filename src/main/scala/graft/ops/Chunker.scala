package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlapping token-window document chunking — the context-window prep step
  * of a training/RAG pipeline: split each document into windows of
  * `chunkSize` whitespace tokens advancing by `stride` tokens (overlap =
  * chunkSize − stride), so every token belongs to at least one chunk and
  * window boundaries never cut more than `overlap` tokens of context.
  *
  * Chunk starts are 0, stride, 2·stride, …, ceil(max(n−chunkSize,0)/stride)
  * ·stride — i.e. exactly one trailing (possibly short) chunk covers the
  * tail, and a document shorter than `chunkSize` yields exactly one chunk.
  *
  * Scale posture: pure map-side work — `split` + `sequence` + `explode` +
  * `slice` are all codegen'd; no shuffle, no state, output rows ∝ input
  * tokens / stride. At 100 TB this runs at scan speed and parallelizes
  * perfectly; the explode factor (≈ n/stride chunks per doc) is bounded by
  * the documents' own length, never by corpus size.
  */
object Chunker {

  /** Explode `df` into one row per chunk. Adds columns:
    * `chunk_start` (0-based token offset), `chunk_text`, `chunk_tokens`
    * (token count in this chunk, = chunkSize except the trailing chunk).
    * The original text/token columns are dropped from the output.
    */
  def chunks(df: DataFrame, textCol: Column, chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val toks = split(textCol, " ")
    val n = size(toks)
    // last start = ceil(max(n − chunkSize, 0) / stride) · stride
    val lastStart =
      (ceil(greatest(n - chunkSize, lit(0)).cast("double") / stride) * stride).cast("int")
    df.withColumn("__toks", toks)
      .withColumn("__n", n)
      .withColumn("chunk_start", explode(sequence(lit(0), lastStart, lit(stride))))
      .withColumn("chunk_text", array_join(slice(col("__toks"), col("chunk_start") + 1, lit(chunkSize)), " "))
      .withColumn("chunk_tokens", least(lit(chunkSize), col("__n") - col("chunk_start")))
      .drop("__toks", "__n")
  }
}
