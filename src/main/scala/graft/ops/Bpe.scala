package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) subword tokenizer TRAINING — the
  * vocabulary-learning half of the training-data pipeline (the engine
  * already counts/chunks tokens; this learns the merge table itself).
  *
  * Classic BPE trains on the WORD-FREQUENCY table, not the raw corpus
  * (Sennrich et al. 2016, public): the corpus collapses to
  * (unique word, freq) in ONE shuffle — at 100 TB that is millions of rows
  * instead of trillions — and every merge iteration is then a pair-count
  * aggregate plus a map over that small frame. This implementation keeps
  * the iteration state as a DataFrame of (token array, freq) with the same
  * localCheckpoint discipline as ops.Components (lineage truncation every
  * round; a bare persist chain grows exponentially in iterative plans).
  *
  * Determinism: the argmax merge breaks count ties lexicographically on
  * (left, right), so the learned merge list is a pure function of the
  * corpus — BpeSpec trains twice and asserts equality, and replays a
  * planted corpus against hand-computed merges.
  */
object Bpe {

  /** End-of-word marker (classic BPE: lets merges distinguish suffixes). */
  val Eow = "</w>"

  /** (unique word, frequency) table for a text column — the one
    * corpus-sized shuffle of the whole training run. */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Initial tokenization: word → [chars..., </w>]. */
  private def initTokens(words: DataFrame): DataFrame =
    words.select(
      concat(
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
        array(lit(Eow))).as("toks"),
      col("freq"))

  /** Weighted adjacent-pair counts over the current token arrays.
    * Returns (l, r, n) — the BPE pair-statistics table. */
  def pairCounts(state: DataFrame): DataFrame =
    state
      .select(explode(zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - 1, lit(0))),
        slice(col("toks"), lit(2), greatest(size(col("toks")) - 1, lit(0))),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("freq")).as("n"))

  /** Learn `numMerges` merge rules from a text column. Each round: one
    * pair-count aggregate (argmax via a 1-row sort-limit, tie-broken
    * lexicographically) and one map applying the merge to the token
    * arrays. Rounds operate on the |unique words| frame only. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var state: Dataset[(Seq[String], Long)] =
      initTokens(wordFreq(docs, textCol)).as[(Seq[String], Long)]
        .localCheckpoint()
    var round = 0
    while (round < numMerges) {
      val top = pairCounts(state.toDF("toks", "freq"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) { round = numMerges }
      else {
        val (l, r) = (top(0).getString(0), top(0).getString(1))
        merges += ((l, r))
        state = state.map { case (toks, freq) =>
          (mergeOnce(toks, l, r), freq)
        }.localCheckpoint()
        round += 1
      }
    }
    merges.toSeq
  }

  /** Replace every adjacent (l, r) by the fused token, left to right. */
  def mergeOnce(toks: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  /** Encode a word with a learned merge list (merges applied in learned
    * priority order — standard BPE apply). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var toks: Seq[String] = word.map(_.toString) :+ Eow
    merges.foreach { case (l, r) => toks = mergeOnce(toks, l, r) }
    toks
  }
}
