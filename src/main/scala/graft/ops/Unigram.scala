package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece unigram
  * model) in its HARD-EM (Viterbi) form: the E-step assigns every unique
  * word its single best segmentation under the current piece
  * log-probabilities, the M-step re-estimates probabilities from the
  * EXACT INTEGER piece counts that segmentation produces (weighted by
  * word frequency), and pruning keeps the top pieces by count while
  * never dropping single characters (coverage). Hard EM trades the
  * lattice forward-backward of soft EM for fully deterministic integer
  * sufficient statistics — the property that makes distributed training
  * reproducible bit-for-bit regardless of partitioning or row order
  * (soft-EM expected counts are float sums whose value depends on
  * reduction order).
  *
  * Scale shape (the [[Bpe]] doctrine): the corpus collapses once to the
  * unique-word frequency table; each EM iteration is ONE map-only pass
  * over that table with a broadcast vocab (Viterbi per word is O(|w|·L))
  * plus ONE vocab-sized aggregation; the M-step state is a codebook-sized
  * driver map. Nothing iterates over raw rows.
  */
object Unigram {

  /** Log-prob assigned to characters absent from the vocab (unknown-char
    * fallback keeps encoding total; far below any trained piece). */
  val UnkLogp: Double = -1e3

  /** Viterbi best segmentation of `w` under `logp`. Deterministic
    * tie-break: higher score (exact double compare), then FEWER tokens,
    * then the LONGER final piece at the decision point — no float
    * accumulation ambiguity beyond the defined left-to-right dp order. */
  def viterbi(w: String, logp: Map[String, Double], maxPieceLen: Int): Seq[String] = {
    val n = w.length
    // dp(i) = (score, ntok, lastPieceLen) for prefix of length i
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val ntok = Array.fill(n + 1)(Int.MaxValue)
    val lastLen = Array.fill(n + 1)(0)
    score(0) = 0.0; ntok(0) = 0
    var i = 1
    while (i <= n) {
      var len = math.min(maxPieceLen, i)
      while (len >= 1) {
        val piece = w.substring(i - len, i)
        val lp = logp.getOrElse(piece,
          if (len == 1) UnkLogp else Double.NegativeInfinity)
        if (lp != Double.NegativeInfinity && score(i - len) != Double.NegativeInfinity) {
          val s = score(i - len) + lp
          val t = ntok(i - len) + 1
          val better = s > score(i) ||
            (s == score(i) && (t < ntok(i) || (t == ntok(i) && len > lastLen(i))))
          if (better) { score(i) = s; ntok(i) = t; lastLen(i) = len }
        }
        len -= 1
      }
      i += 1
    }
    // reconstruct
    var out = List.empty[String]
    var pos = n
    while (pos > 0) {
      val l = lastLen(pos)
      out = w.substring(pos - l, pos) :: out
      pos -= l
    }
    out
  }

  /** Corpus Viterbi log-likelihood under `logp` (spec-grade: words fold in
    * SORTED order so the float sum has one defined association). */
  def corpusLl(words: Seq[(String, Long)], logp: Map[String, Double],
      maxPieceLen: Int): Double =
    words.sortBy(_._1).foldLeft(0.0) { case (acc, (w, f)) =>
      val s = viterbi(w, logp, maxPieceLen).map(p =>
        logp.getOrElse(p, UnkLogp)).sum
      acc + f * s
    }

  final case class Trained(
      logp: Map[String, Double],
      counts: Map[String, Long],
      iterations: Int)

  /** Train by hard EM over the unique-word table. `vocabSize` bounds the
    * NON-CHARACTER piece budget after each prune (single chars always
    * survive). Probabilities are add-one-smoothed exact ratios of integer
    * counts — identical on every rerun and partitioning. */
  def trainHardEm(words: DataFrame, seedTopK: Int, maxPieceLen: Int,
      vocabSize: Int, iters: Int): Trained = {
    val spark = words.sparkSession
    import spark.implicits._
    val typed = words.select(col("w"), col("freq").cast("long")).as[(String, Long)]

    // seed: exact substring-occurrence scores (Subword.seedVocab)
    val seed = Subword.seedVocab(words, maxPieceLen, seedTopK)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var counts: Map[String, Long] = seed
    var logp: Map[String, Double] = mStep(seed)
    var it = 0
    while (it < iters) {
      val bc = spark.sparkContext.broadcast(logp)
      // E-step: Viterbi counts, exact integers — order-independent sum
      val stepCounts = typed.mapPartitions { rows =>
        val lp = bc.value
        rows.flatMap { case (w, f) =>
          viterbi(w, lp, maxPieceLen).map(p => (p, f))
        }
      }.rdd.reduceByKey(_ + _).collect().toMap
      // prune: top vocabSize multi-char pieces by (count desc, piece asc);
      // EVERY single char survives (coverage floor)
      val (chars, multi) = stepCounts.partition(_._1.length == 1)
      val kept = multi.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      counts = (chars ++ kept).toMap
      logp = mStep(counts)
      it += 1
    }
    Trained(logp, counts, iters)
  }

  /** Add-one-smoothed log-probabilities from integer counts — exact
    * ratios, so the map is a pure function of the counts. */
  def mStep(counts: Map[String, Long]): Map[String, Double] = {
    val total = counts.values.sum.toDouble
    val v = counts.size.toDouble
    counts.map { case (p, c) => p -> math.log((c + 1).toDouble / (total + v)) }
  }

  /** Encode the corpus under a trained model: unique-word trick, map-only
    * with broadcast logp. Returns (piece, n) exact token totals. */
  def encodeCorpus(docs: DataFrame, textCol: String, logp: Map[String, Double],
      maxPieceLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(logp)
    Bpe.wordFreq(docs, textCol).as[(String, Long)]
      .mapPartitions { it =>
        val lp = bc.value
        it.flatMap { case (w, f) => viterbi(w, lp, maxPieceLen).map(p => (p, f)) }
      }
      .toDF("piece", "freq")
      .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("n"))
  }
}
