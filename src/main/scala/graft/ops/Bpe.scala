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

  /** Batched trainer — same merge list as [[train]], far fewer Spark jobs.
    *
    * The sequential trainer is one driver round-trip + one full rewrite of
    * the unique-word frame PER MERGE: at a production vocab (30k–100k
    * merges) that is tens of thousands of sequential Spark jobs. This
    * variant accepts a PREFIX of the stale candidate list per round and
    * applies the whole batch in ONE map + localCheckpoint, with a
    * selection rule that makes the batch provably identical to what the
    * sequential trainer would have picked:
    *
    *  - candidates are scanned in (count desc, l, r) order — the argmax
    *    order — and acceptance STOPS (never skips) at the first conflict,
    *    so accepted pairs are exactly the sequential prefix;
    *  - a pair is a conflict if it shares a symbol with any accepted pair
    *    (its count may have changed after those merges) — fused strings
    *    l+r count as symbols too, since a later pair naming the fused
    *    token would gain occurrences mid-batch;
    *  - merging (a,b) creates only pairs involving the fused token, and
    *    count(x, ab) ≤ count(x, a) ≤ maxRight(a), count(ab, y) ≤
    *    count(b, y) ≤ maxLeft(b), where maxLeft/maxRight are per-symbol
    *    maxima of the stale pair table. Acceptance also stops once a
    *    candidate's count is ≤ the running bound, because a freshly
    *    created pair could then outrank it in the next sequential round
    *    (ties must stop too: the new token's name could win the
    *    lexicographic tie-break);
    *  - if a fused string collides with an EXISTING symbol the bound
    *    argument breaks (that symbol's pairs can gain count), so the
    *    batch ends after that merge.
    *
    * Within a word the batch is applied by [[mergeOnce]] in accepted
    * order — bit-identical to the sequential rewrites. BpeSpec proves
    * list equality vs [[train]] at 256+ merges.
    */
  def trainBatched(docs: DataFrame, textCol: String, numMerges: Int,
                   maxCandidates: Int = 4096): Seq[(String, String)] =
    trainBatchedWithStats(docs, textCol, numMerges, maxCandidates)._1

  /** [[trainBatched]] plus the number of Spark rounds it took. */
  def trainBatchedWithStats(docs: DataFrame, textCol: String, numMerges: Int,
                            maxCandidates: Int = 4096): (Seq[(String, String)], Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var state: Dataset[(Seq[String], Long)] =
      initTokens(wordFreq(docs, textCol)).as[(Seq[String], Long)]
        .localCheckpoint()
    var rounds = 0
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val pc = pairCounts(state.toDF("toks", "freq")).persist()
      val cands = pc.orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(maxCandidates).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // per-symbol maxima of the stale table — vocab-sized, not corpus-sized
      val maxLeft = pc.groupBy(col("l")).agg(max(col("n")).as("m"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val maxRight = pc.groupBy(col("r")).agg(max(col("n")).as("m"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      pc.unpersist()
      if (cands.isEmpty) exhausted = true
      else {
        val symbols = maxLeft.keySet ++ maxRight.keySet
        val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val blocked = scala.collection.mutable.HashSet.empty[String]
        var ub = 0L
        var stop = false
        val want = numMerges - merges.length
        var i = 0
        while (!stop && i < cands.length && batch.length < want) {
          val (l, r, n) = cands(i)
          if (blocked.contains(l) || blocked.contains(r)) stop = true
          else if (batch.nonEmpty && n <= ub) stop = true
          else {
            batch += ((l, r))
            blocked += l; blocked += r; blocked += (l + r)
            ub = math.max(ub, math.max(maxRight.getOrElse(l, 0L), maxLeft.getOrElse(r, 0L)))
            if (symbols.contains(l + r)) stop = true // fused-name collision: bound invalid past here
            i += 1
          }
        }
        merges ++= batch
        val b = batch.toSeq
        state = state.map { case (toks, freq) =>
          var t = toks
          b.foreach { case (l, r) => t = mergeOnce(t, l, r) }
          (t, freq)
        }.localCheckpoint()
        rounds += 1
      }
    }
    (merges.toSeq, rounds)
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
