package graft

import graft.ops.Bpe
import graft.sources.Tables

/** Distributed BPE trainer (ops/Bpe): planted-corpus merge truth,
  * determinism across runs, lossless word reconstruction, and token-count
  * reduction on the documents fixture.
  */
class BpeSpec extends GraftSuite {

  test("planted corpus learns the hand-computed merges in order") {
    import spark.implicits._
    // "low low low lower" — pair stats over (unique word, freq):
    //   low(3):   l-o 3, o-w 3, w-</w> 3
    //   lower(1): l-o 1, o-w 1, w-e 1, e-r 1, r-</w> 1
    // round 1: l-o (4) ties o-w (4) → lex: ("l","o") wins
    // round 2: lo-w (4) vs w-</w> 3 … → ("lo","w")
    // round 3: low-</w> (3) vs w-e/e-r/r-</w> 1 → ("low", "</w>")
    val docs = Seq("low low low lower").toDF("text")
    val merges = Bpe.train(docs, "text", 3)
    assert(merges === Seq(("l", "o"), ("lo", "w"), ("low", Bpe.Eow)))
    assert(Bpe.encodeWord("low", merges) === Seq("low" + Bpe.Eow))
    assert(Bpe.encodeWord("lower", merges) === Seq("low", "e", "r", Bpe.Eow))
  }

  test("training is deterministic across runs") {
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    val a = Bpe.train(docs, "text", 8)
    val b = Bpe.train(docs, "text", 8)
    assert(a === b)
    assert(a.length === 8)
  }

  test("batched trainer matches the sequential merge list at 256+ merges") {
    import spark.implicits._
    // The fixture documents table has a tiny word vocabulary (exhausts at
    // ~105 merges), so build a seeded corpus with enough lexical diversity
    // to sustain 256 merge rounds: 600 distinct words, Zipf-ish repeats.
    val rnd = new scala.util.Random(42)
    val vocab = Seq.fill(600)((3 + rnd.nextInt(10), rnd.nextLong())).map {
      case (len, seed) =>
        val r = new scala.util.Random(seed)
        Seq.fill(len)(('a' + r.nextInt(26)).toChar).mkString
    }
    val words = (0 until 8000).map(i => vocab(math.min(rnd.nextInt(rnd.nextInt(600) + 1), 599)))
    val docs = words.grouped(40).map(_.mkString(" ")).toSeq.toDF("text")
    val t0 = System.nanoTime()
    val seqMerges = Bpe.train(docs, "text", 256)
    val t1 = System.nanoTime()
    val (batMerges, rounds) = Bpe.trainBatchedWithStats(docs, "text", 256)
    val t2 = System.nanoTime()
    assert(batMerges === seqMerges)
    assert(seqMerges.length === 256)
    // the whole point: far fewer driver rounds than merges
    assert(rounds < 256, s"expected batching to compress rounds, got $rounds")
    info(f"sequential: ${(t1 - t0) / 1e9}%.1f s (256 rounds); " +
      f"batched: ${(t2 - t1) / 1e9}%.1f s ($rounds rounds)")
  }

  test("batched trainer parity holds on randomized corpora (seeded fuzz)") {
    import spark.implicits._
    // small alphabets maximize symbol collisions — the adversarial case
    // for batch selection (created pairs dominate); parity must hold on
    // every corpus, not just the showcase one
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed * 7919L)
      val alpha = 3 + rnd.nextInt(5)
      val vocab = Seq.fill(40 + rnd.nextInt(80)) {
        val len = 1 + rnd.nextInt(7)
        Seq.fill(len)(('a' + rnd.nextInt(alpha)).toChar).mkString
      }
      val words = Seq.fill(500)(vocab(rnd.nextInt(vocab.length)))
      val docs = words.grouped(25).map(_.mkString(" ")).toSeq.toDF("text")
      val n = 10 + rnd.nextInt(30)
      val seqM = Bpe.train(docs, "text", n)
      val batM = Bpe.trainBatched(docs, "text", n)
      assert(batM === seqM, s"seed $seed, alpha $alpha, merges $n")
    }
  }

  test("in-memory trainer (trainLocal/trainAuto) is bit-identical to the distributed one") {
    import spark.implicits._
    // fixture corpus to full exhaustion (105 merges)
    val docs = Tables.t(spark, sfDir, "documents").limit(150)
    val dist = Bpe.train(docs, "text", 120)
    val wf = Bpe.wordFreq(docs, "text").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val local = Bpe.trainLocal(wf, 120)
    assert(local === dist)
    assert(Bpe.trainAuto(docs, "text", 120) === dist)
    // over-budget route falls back to the batched trainer (same list)
    assert(Bpe.trainAuto(docs, "text", 24, maxDriverWords = 1L) === dist.take(24))
    // randomized corpora: the incremental maintenance must agree everywhere
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed * 104729L)
      val vocab = Seq.fill(60)(Seq.fill(1 + rnd.nextInt(6))(('a' + rnd.nextInt(4)).toChar).mkString)
      val words = Seq.fill(400)(vocab(rnd.nextInt(vocab.length)))
      val d = words.grouped(20).map(_.mkString(" ")).toSeq.toDF("text")
      val n = 15 + rnd.nextInt(25)
      val w = Bpe.wordFreq(d, "text").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(Bpe.trainLocal(w, n) === Bpe.train(d, "text", n), s"seed $seed")
    }
  }

  test("trainLocal runs a production-scale merge count in driver time") {
    // the 30k-merges posture: vocab-scale training is driver-side once the
    // unique-word table is collected — zero Spark jobs in the loop
    val rnd = new scala.util.Random(31L)
    val vocab = Seq.fill(30000)(Seq.fill(3 + rnd.nextInt(12))(('a' + rnd.nextInt(26)).toChar).mkString)
    val wf = vocab.distinct.map(w => (w, 1L + rnd.nextInt(1000).toLong))
    val t0 = System.nanoTime()
    val merges = Bpe.trainLocal(wf, 8000)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.length === 8000)
    info(f"8000 merges over ${wf.size} unique words in $secs%.1f s (driver-side)")
    assert(secs < 120.0, f"in-memory trainer too slow: $secs%.1f s")
  }

  test("batched trainer matches on the planted corpus and tiny vocab") {
    import spark.implicits._
    val docs = Seq("low low low lower").toDF("text")
    assert(Bpe.trainBatched(docs, "text", 3) === Bpe.train(docs, "text", 3))
    // over-asking merges exhausts pairs identically on both paths
    assert(Bpe.trainBatched(docs, "text", 50) === Bpe.train(docs, "text", 50))
  }

  test("encodeCorpus matches the driver-side encodeWord on every unique word") {
    val docs = Tables.t(spark, sfDir, "documents").limit(100)
    val merges = Bpe.train(docs, "text", 10)
    val enc = Bpe.encodeCorpus(docs, "text", merges).collect()
    assert(enc.nonEmpty)
    enc.take(300).foreach { row =>
      val toks = row.getSeq[String](0)
      // reconstruct the word and re-encode on the driver: bit parity
      val word = toks.mkString("").stripSuffix(Bpe.Eow)
      assert(Bpe.encodeWord(word, merges) === toks, s"word '$word'")
    }
    // frequencies conserved: sum of freqs = corpus word count
    val total = enc.map(_.getLong(1)).sum
    val words = Bpe.wordFreq(docs, "text")
      .agg(org.apache.spark.sql.functions.sum("freq")).collect()(0).getLong(0)
    assert(total === words)
  }

  test("encode is lossless and strictly compresses the fixture corpus") {
    val docs = Tables.t(spark, sfDir, "documents").limit(200)
    val merges = Bpe.train(docs, "text", 12)
    val words = docs.select(
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), "\\s+")).as("w"))
      .filter(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) > 0)
      .limit(500).collect().map(_.getString(0))
    assert(words.nonEmpty)
    var before = 0L
    var after = 0L
    words.foreach { w =>
      val enc = Bpe.encodeWord(w, merges)
      // lossless: concatenating tokens (marker stripped) restores the word
      assert(enc.mkString("").stripSuffix(Bpe.Eow) === w, s"word '$w'")
      before += w.length + 1
      after += enc.length
    }
    assert(after < before, s"BPE should compress: $after vs $before")
  }
}
