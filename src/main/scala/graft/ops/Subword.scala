package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subword vocabulary seeding + WordPiece-style greedy tokenization — the
  * runtime half of the BERT tokenizer family (Schuster & Nakajima 2012;
  * Devlin et al. 2019 use exactly this greedy longest-match-first
  * algorithm), complementing [[Bpe]] (merge-list apply) and [[Unigram]]
  * (Viterbi under a probabilistic vocab).
  *
  * Everything here is EXACT integer/string computation — substring
  * occurrence counts, longest-match selection with lexicographic
  * tie-break — so the declared query's DuckDB oracle replicates the whole
  * pipeline verbatim (a recursive CTE walks the same greedy matches).
  *
  * Scale shape: the corpus collapses to the unique-word frequency table in
  * ONE shuffle ([[Bpe.wordFreq]]); vocab seeding explodes bounded
  * substring sets per word (≤ maxPieceLen·|w| pieces); encoding is
  * map-only over unique words with a broadcast vocab set. Nothing is
  * driver-looped and no stage grows faster than the corpus scan.
  */
object Subword {

  /** All substrings of length 1..maxPieceLen of every unique word, scored
    * by TOTAL corpus occurrences (positions × word frequency — exact
    * integers). The vocabulary is the top-`topK` pieces by
    * (score desc, piece asc) UNION all single characters (coverage: greedy
    * matching can always fall back to a char piece). */
  def seedVocab(words: DataFrame, maxPieceLen: Int, topK: Int): DataFrame = {
    val pieces = words.select(col("freq"), explode(
      flatten(expr(
        s"""transform(sequence(1, length(w)), s ->
           |  transform(sequence(s, least(s + ${maxPieceLen - 1}, length(w))), e ->
           |    substring(w, s, e - s + 1)))""".stripMargin))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("score"))
    val top = pieces.orderBy(col("score").desc, col("piece").asc).limit(topK)
    val chars = pieces.filter(length(col("piece")) === 1)
    top.unionByName(chars).distinct()
  }

  /** Greedy longest-match-first segmentation (ties: lexicographically
    * smallest piece — matches the oracle's ORDER BY len DESC, piece ASC,
    * though equal-length matches at one position are the same string, so
    * the tie-break is only load-bearing across engines, not semantics).
    * Characters absent from the vocab become single-char pieces (loud
    * coverage is [[seedVocab]]'s job; the fallback keeps encode total). */
  def greedyEncode(w: String, vocab: Set[String], maxPieceLen: Int): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(maxPieceLen, w.length - pos)
      var matched: String = null
      while (matched == null && len > 1) {
        val cand = w.substring(pos, pos + len)
        if (vocab.contains(cand)) matched = cand else len -= 1
      }
      if (matched == null) matched = w.substring(pos, pos + 1)
      out += matched
      pos += matched.length
    }
    out.result()
  }

  /** Encode the corpus under `vocab`: unique-word trick (each distinct word
    * encodes ONCE; token statistics weight by word frequency). Returns
    * (piece, n) — total token occurrences. */
  def encodeCorpusGreedy(docs: DataFrame, textCol: String,
      vocab: Set[String], maxPieceLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    Bpe.wordFreq(docs, textCol).as[(String, Long)]
      .mapPartitions { it =>
        val v = bc.value
        it.flatMap { case (w, freq) =>
          greedyEncode(w, v, maxPieceLen).map(p => (p, freq))
        }
      }
      .toDF("piece", "freq")
      .groupBy(col("piece")).agg(sum(col("freq")).cast("long").as("n"))
  }
}
