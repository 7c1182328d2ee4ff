package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

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
    *  - merging (a,b) changes the count of EXACTLY the pairs (x,a) — the
    *    'a' can be consumed as a left part — and (b,y) — the 'b' consumed
    *    as a right part — plus pairs naming the fused token ab. Pairs
    *    (a,y≠b) and (x≠a,b) are provably unchanged (their 'a'/'b' is never
    *    adjacent to the merge partner at that occurrence). So a candidate
    *    (l,r) conflicts iff l ∈ {accepted rights ∪ fused names} or
    *    r ∈ {accepted lefts ∪ fused names};
    *  - merging (a,b) creates only pairs involving the fused token. A
    *    created pair's count is EXACTLY a neighbor-triple count: each
    *    (x, ab) instance is a triple (x, a, b) occurrence, each (ab, y) a
    *    triple (a, b, y) — and every creation instance maps to a distinct
    *    original neighbor token, so per created NAME the count is one
    *    single-neighbor triple count (earlier batch merges only rename
    *    neighbors bijectively: batch symbols are pairwise consumable-
    *    disjoint). One tiny extra job per round computes, per tentative
    *    merge, max(single-neighbor triple counts) over the round-start
    *    frame — the exact ceiling on anything that merge can create. The
    *    batch is trimmed where a candidate's count is ≤ the running
    *    creation ceiling plus the truncation cutoff (an unseen
    *    below-cutoff pair could carry stale mass on top of created mass),
    *    because such a pair could outrank it in the next sequential round
    *    (ties must trim too: the new token's name could win the
    *    lexicographic tie-break);
    *  - if a fused string collides with an EXISTING symbol the bound
    *    argument breaks (that symbol's pairs can gain count and a
    *    non-accepted candidate naming it could overtake), so the batch
    *    ends after that merge.
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
      // ONE job per round: the sorted top-K of the pair table. Per-symbol
      // maxima are derived from the collected rows; symbols only seen
      // below the cutoff are bounded by the cutoff count itself.
      val cands = pairCounts(state.toDF("toks", "freq"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(maxCandidates).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (cands.isEmpty) exhausted = true
      else {
        val cutoff = if (cands.length == maxCandidates) cands.last._3 else 0L
        val symbols = scala.collection.mutable.HashSet.empty[String]
        val maxLeft = scala.collection.mutable.HashMap.empty[String, Long]
        val maxRight = scala.collection.mutable.HashMap.empty[String, Long]
        cands.foreach { case (l, r, n) =>
          if (!maxLeft.contains(l)) maxLeft(l) = n // first hit is the max (sorted desc)
          if (!maxRight.contains(r)) maxRight(r) = n
          symbols += l; symbols += r
        }
        // tentative batch: blocking + fused-collision rules only
        val tentative = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val blockedLeft = scala.collection.mutable.HashSet.empty[String]
        val blockedRight = scala.collection.mutable.HashSet.empty[String]
        var stop = false
        val want = numMerges - merges.length
        var i = 0
        while (!stop && i < cands.length && tentative.length < want) {
          val (l, r, n) = cands(i)
          if (blockedLeft.contains(l) || blockedRight.contains(r)) stop = true
          else {
            tentative += ((l, r, n))
            val fused = l + r
            blockedLeft += r; blockedLeft += fused
            blockedRight += l; blockedRight += fused
            if (symbols.contains(fused)) stop = true // fused-name collision: bound invalid past here
            i += 1
          }
        }
        // Trim the tentative prefix where a created pair could outrank the
        // next candidate. Two sound ceilings, cheapest first: the free
        // per-symbol adjacency bound min(n, max(maxRight(l), maxLeft(r)));
        // if that leaves a small batch while more was tentatively
        // available, pay ONE tiny extra job for the exact neighbor-triple
        // ceiling and keep the longer prefix (both are valid sequential
        // prefixes of the same candidate order).
        def trim(ceil: ((String, String, Long)) => Long): Seq[(String, String)] = {
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          var runMax = 0L
          var trimmed = false
          tentative.foreach { case t @ (l, r, n) =>
            if (!trimmed) {
              if (out.nonEmpty && n <= runMax + cutoff) trimmed = true
              else { out += ((l, r)); runMax = math.max(runMax, ceil(t)) }
            }
          }
          out.toSeq
        }
        val cheap = trim { case (l, r, n) =>
          math.min(n, math.max(maxRight.getOrElse(l, cutoff), maxLeft.getOrElse(r, cutoff)))
        }
        val batch: Seq[(String, String)] =
          if (cheap.length >= tentative.length || cheap.length >= 8) cheap
          else {
            val exact = tripleMaxima(state, tentative.map(t => (t._1, t._2)).toSet)
            val tight = trim { case (l, r, _) => exact.getOrElse((l, r), 0L) }
            if (tight.length > cheap.length) tight else cheap
          }
        merges ++= batch
        val b = batch
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

  /** In-memory trainer over a collected (word, freq) table — incremental
    * pair-count maintenance (the classic Sennrich trainer shape): a
    * pair→word inverted index limits each merge's work to the words that
    * contain it, and a lazy-deletion priority queue makes argmax O(log P)
    * amortized. Bit-identical merge lists to [[train]] (same adjacency
    * counts, same (count desc, l, r) tie-break); 30k+ merges run in
    * seconds with ZERO Spark jobs. */
  def trainLocal(wordFreqs: Iterable[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    val pairsIn = wordFreqs.toArray
    val words = pairsIn.map { case (w, _) =>
      val b = mutable.ArrayBuffer.empty[String]
      w.foreach(c => b += c.toString); b += Eow; b
    }
    val freqs = pairsIn.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    // max-heap: highest count first, lex-SMALLEST (l, r) on ties
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2) // reversed: smaller l = higher priority
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val pq = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    def scan(i: Int, sign: Long, touched: mutable.HashSet[(String, String)]): Unit = {
      val t = words(i); val f = freqs(i) * sign
      var j = 0
      while (j + 1 < t.length) {
        val p = (t(j), t(j + 1))
        val c = counts.getOrElse(p, 0L) + f
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0L) where.getOrElseUpdate(p, mutable.HashSet.empty) += i
        touched += p
        j += 1
      }
    }

    val initTouched = mutable.HashSet.empty[(String, String)]
    words.indices.foreach(scan(_, 1L, initTouched))
    counts.foreach { case ((l, r), c) => pq.enqueue((c, l, r)) }

    val merges = mutable.ArrayBuffer.empty[(String, String)]
    while (merges.length < numMerges && pq.nonEmpty) {
      val (c, l, r) = pq.dequeue()
      if (counts.get((l, r)).contains(c)) { // fresh entry (lazy deletion)
        merges += ((l, r))
        val touched = mutable.HashSet.empty[(String, String)]
        where.getOrElse((l, r), mutable.HashSet.empty).toArray.foreach { i =>
          val merged = mergeOnce(words(i).toSeq, l, r)
          if (merged.length != words(i).length) { // stale index entries skip
            scan(i, -1L, touched)
            words(i) = mutable.ArrayBuffer.from(merged)
            scan(i, 1L, touched)
          }
        }
        where.remove((l, r)); counts.remove((l, r))
        touched.foreach { p =>
          counts.get(p).foreach(cc => pq.enqueue((cc, p._1, p._2)))
        }
      }
    }
    merges.toSeq
  }

  /** Production entry point: the corpus-scale half (explode + word count)
    * is the ONE distributed shuffle; the vocab-scale half (the merge loop)
    * runs wherever it fits. Under `maxDriverWords` unique words (default
    * 20M ≈ ~2 GB of driver strings — real corpora: CCNet-scale English is
    * tens of millions) the word table is collected ONCE and
    * [[trainLocal]] finishes any vocab size with zero further jobs; over
    * budget it falls back to [[trainBatched]], which never driver-collects
    * more than the candidate top-K per round. Both paths are bit-identical
    * to [[train]]. */
  def trainAuto(docs: DataFrame, textCol: String, numMerges: Int,
                maxDriverWords: Long = 20000000L): Seq[(String, String)] = {
    val wf = wordFreq(docs, textCol).persist()
    try {
      if (wf.count() <= maxDriverWords)
        trainLocal(
          wf.collect().map(r => (r.getString(0), r.getLong(1))).toIndexedSeq,
          numMerges)
      else trainBatched(docs, textCol, numMerges)
    } finally { wf.unpersist(); () }
  }

  /** For each pair in `pairs`, the max single-neighbor triple count over
    * the token frame: max over x of Σfreq{(x,l,r)} and max over y of
    * Σfreq{(l,r,y)} — the exact ceiling on the count of any pair that
    * merging (l,r) can create. Output is small (≤ |pairs| rows after the
    * final aggregate); the scan is the unique-word frame, not the corpus. */
  private def tripleMaxima(state: Dataset[(Seq[String], Long)],
                           pairs: Set[(String, String)]): Map[(String, String), Long] = {
    val spark = state.sparkSession
    import spark.implicits._
    state.flatMap { case (toks, freq) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, String, Long)]
      var i = 0
      while (i + 2 < toks.length + 1) { // i, i+1 valid; i+2 may not be
        val a = toks(i); val b = toks(i + 1)
        if (pairs.contains((a, b))) {
          if (i > 0) out += ((a, b, "L:" + toks(i - 1), freq))
          if (i + 2 < toks.length) out += ((a, b, "R:" + toks(i + 2), freq))
        }
        i += 1
      }
      out
    }.toDF("l", "r", "nk", "f")
      .groupBy(col("l"), col("r"), col("nk")).agg(sum(col("f")).as("c"))
      .groupBy(col("l"), col("r")).agg(max(col("c")).as("m"))
      .collect().map(row => (row.getString(0), row.getString(1)) -> row.getLong(2)).toMap
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

  /** Apply a learned merge list to one token array (greedy left-to-right
    * per merge, merges in learned priority order — standard BPE apply). */
  def applyMerges(toks: Seq[String], merges: Seq[(String, String)]): Seq[String] = {
    var t = toks
    merges.foreach { case (l, r) => t = mergeOnce(t, l, r) }
    t
  }

  /** Encode a word with a learned merge list (merges applied in learned
    * priority order — standard BPE apply). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    applyMerges(word.map(_.toString) :+ Eow, merges)

  /** Distributed corpus encode — the tokenize-the-training-set half of the
    * pipeline. The corpus collapses to the unique-word frequency table in
    * ONE shuffle (same trick as [[train]]); each unique word is encoded
    * exactly once with the closure-shipped merge list. Returns
    * (toks: array&lt;string&gt;, freq: bigint) — at 100 TB the encode cost
    * is |unique words|, not |corpus|, and token-frequency aggregates
    * weight by `freq` instead of re-touching raw text. */
  def encodeCorpus(docs: DataFrame, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges
    initTokens(wordFreq(docs, textCol)).as[(Seq[String], Long)]
      .map { case (t, f) => (applyMerges(t, ms), f) }
      .toDF("toks", "freq")
  }

  /** [[encodeCorpus]] keeping the WORD alongside its encoding — the
    * unique-word lookup table `(w, toks, freq)` a per-document pass joins
    * against (token-aware packing, per-doc token budgets). */
  def encodeVocab(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ms = merges
    wordFreq(docs, textCol)
      .select(col("w"),
        concat(
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"),
          array(lit(Eow))).as("toks"),
        col("freq"))
      .as[(String, Seq[String], Long)]
      .map { case (w, t, f) => (w, applyMerges(t, ms), f) }
      .toDF("w", "toks", "freq")
  }
}
