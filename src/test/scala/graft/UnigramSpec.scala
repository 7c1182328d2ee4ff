package graft

import graft.ops.Unigram

/** Unigram-LM hard-EM tokenizer: planted segmentation truths, bit-exact
  * rebuild determinism under shuffling/partitioning (the integer
  * sufficient-statistics claim), EM likelihood monotonicity without
  * pruning, char-coverage floor, and unknown-char totality. */
class UnigramSpec extends GraftSuite {

  import spark.implicits._

  private def wordsDf(ws: Seq[(String, Long)]) = ws.toDF("w", "freq")

  test("viterbi picks the higher-probability split; ties prefer fewer tokens") {
    val logp = Map("table" -> -1.0, "scan" -> -1.0, "tab" -> -2.0, "le" -> -2.0,
      "t" -> -5.0, "a" -> -5.0, "b" -> -5.0, "l" -> -5.0, "e" -> -5.0,
      "s" -> -5.0, "c" -> -5.0, "n" -> -5.0)
    assert(Unigram.viterbi("tablescan", logp, 6) === Seq("table", "scan"))
    // "tab"+"le" (-4) loses to "table" (-1)
    assert(Unigram.viterbi("table", logp, 6) === Seq("table"))
    // exact tie between one -2.0 piece and ... fewer tokens wins
    val tie = Map("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0)
    assert(Unigram.viterbi("ab", tie, 6) === Seq("ab"))
  }

  test("unknown characters stay encodable via the UNK char fallback") {
    val logp = Map("a" -> -1.0)
    assert(Unigram.viterbi("axa", logp, 6) === Seq("a", "x", "a"))
  }

  test("training converges on planted compound words and is rebuild-deterministic") {
    val ws = Seq(("tablescan", 50L), ("scantable", 40L), ("table", 30L),
      ("scan", 30L), ("lescan", 2L))
    val t1 = Unigram.trainHardEm(wordsDf(ws), seedTopK = 60, maxPieceLen = 6,
      vocabSize = 8, iters = 3)
    // the dominant compounds must segment into the two true morphemes
    assert(Unigram.viterbi("tablescan", t1.logp, 6) === Seq("table", "scan"))
    assert(Unigram.viterbi("scantable", t1.logp, 6) === Seq("scan", "table"))
    // rebuild on a shuffled, repartitioned copy: identical model
    val shuffled = wordsDf(scala.util.Random.shuffle(ws)).repartition(7)
    val t2 = Unigram.trainHardEm(shuffled, seedTopK = 60, maxPieceLen = 6,
      vocabSize = 8, iters = 3)
    assert(t1.counts === t2.counts)
    assert(t1.logp === t2.logp)
  }

  test("hard-EM likelihood is non-decreasing without pruning") {
    val ws = Seq(("tablescan", 20L), ("tabletable", 10L), ("scanscan", 10L),
      ("able", 5L), ("cans", 5L))
    val df = wordsDf(ws)
    // vocabSize large enough that pruning never bites -> pure hard EM
    var prev = Double.NegativeInfinity
    (0 to 3).foreach { it =>
      val t = Unigram.trainHardEm(df, seedTopK = 200, maxPieceLen = 6,
        vocabSize = 1000, iters = it)
      val ll = Unigram.corpusLl(ws, t.logp, 6)
      assert(ll >= prev - 1e-9, s"LL decreased at iter $it: $prev -> $ll")
      prev = ll
    }
  }

  test("pruning keeps every character and bounds the multi-char budget") {
    val ws = Seq(("abcdefgh", 10L), ("hgfedcba", 10L), ("aabbccdd", 10L))
    val t = Unigram.trainHardEm(wordsDf(ws), seedTopK = 500, maxPieceLen = 4,
      vocabSize = 3, iters = 2)
    val chars = ws.flatMap(_._1.toSeq).map(_.toString).toSet
    val (cs, multi) = t.counts.keySet.partition(_.length == 1)
    assert(multi.size <= 3, s"multi-char budget exceeded: $multi")
    // every char that appears in SOME final segmentation is present; the
    // coverage floor means encode stays total either way
    assert(cs.subsetOf(chars))
    ws.foreach { case (w, _) =>
      val toks = Unigram.viterbi(w, t.logp, 4)
      assert(toks.mkString === w, s"encode must partition $w, got $toks")
    }
  }

  test("encodeCorpus totals partition the corpus exactly (sum len*count == total chars)") {
    val docs = graft.sources.Tables.t(spark, sfDir, "documents").limit(200)
    val words = graft.ops.Bpe.wordFreq(docs, "text")
    val t = Unigram.trainHardEm(words, seedTopK = 150, maxPieceLen = 6,
      vocabSize = 60, iters = 2)
    val enc = Unigram.encodeCorpus(docs, "text", t.logp, 6)
    val pieceChars = enc.selectExpr("CAST(sum(length(piece) * n) AS LONG)")
      .collect()(0).getLong(0)
    val corpusChars = words.selectExpr("CAST(sum(length(w) * freq) AS LONG)")
      .collect()(0).getLong(0)
    assert(pieceChars === corpusChars)
  }
}
