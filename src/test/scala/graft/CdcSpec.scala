package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Content-defined chunking (Dedup.cdcChunkHashes): boundary correctness,
  * determinism, and the RESYNC property that justifies CDC over fixed
  * windows — an insertion perturbs only the chunk it lands in. */
class CdcSpec extends GraftSuite {

  private def chunksOf(texts: Seq[String], maskBits: Int = 4): Seq[Seq[Long]] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Dedup.cdcChunkHashes(col("text"), maskBits).as("ch"))
      .orderBy(col("id"))
      .collect().map(_.getSeq[Long](1)).toSeq
  }

  private def randText(n: Int, seed: Long): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => "w" + r.nextInt(5000)).mkString(" ")
  }

  test("chunk count and coverage: every token lands in exactly one chunk") {
    val text = randText(400, 7)
    val n = text.split(" ").length
    val ch = chunksOf(Seq(text)).head
    assert(ch.nonEmpty)
    // expected chunk length 2^4 = 16 -> ~25 chunks over 400 tokens
    assert(ch.size > 5 && ch.size < n, s"got ${ch.size} chunks")
  }

  test("resync: one inserted token perturbs at most two chunks") {
    val base = randText(600, 13)
    val edited = "zzz_inserted " + base
    val Seq(a, b) = chunksOf(Seq(base, edited))
    val shared = a.toSet & b.toSet
    // the insertion sits before the first boundary: only the first chunk
    // hash changes; every later chunk re-syncs to identical boundaries
    assert(shared.size >= a.size - 2,
      s"insertion must not cascade: ${a.size} base chunks, ${shared.size} shared")
    // a mid-document edit likewise only perturbs its own chunk
    val toks = base.split(" ").toVector
    val mid = (toks.take(300) ++ Vector("edited_token") ++ toks.drop(300)).mkString(" ")
    val Seq(a2, m2) = chunksOf(Seq(base, mid))
    assert((a2.toSet & m2.toSet).size >= a2.size - 2)
  }

  test("identical fragments share chunk hashes across documents") {
    val shared = randText(200, 21)
    val d1 = randText(50, 22) + " " + shared
    val d2 = randText(80, 23) + " " + shared
    val Seq(c1, c2) = chunksOf(Seq(d1, d2))
    // interior chunks of the shared tail are content-identical
    assert((c1.toSet & c2.toSet).nonEmpty,
      "documents sharing a long fragment must share CDC chunks")
  }

  test("chunking is map-side: no shuffle below the chunk-hash explode") {
    import spark.implicits._
    val df = Seq((1L, randText(100, 31)), (2L, randText(80, 32)))
      .toDF("doc_id", "text")
      .select(col("doc_id"), explode(Dedup.cdcChunkHashes(col("text"), 4)).as("ch"))
    df.collect()
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case q: QueryStageExec => unwrap(q.plan)
      case other => other
    }
    def hasShuffle(p: SparkPlan): Boolean = {
      val u = unwrap(p)
      u.isInstanceOf[ShuffleExchangeLike] || u.children.exists(hasShuffle)
    }
    assert(!hasShuffle(df.queryExecution.executedPlan),
      "chunk-hash generation must not shuffle the corpus")
  }

  test("10 seeded fuzz rounds: chunk hashes match the JVM kernel reference") {
    import graft.expressions.{FoldHashOps, TextOps}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def refChunks(text: String, maskBits: Int): Seq[Long] = {
      val th = text.split(" ").map(t => TextOps.hash64(UTF8String.fromString(t), 0L))
      val mask = (1L << maskBits) - 1
      val ends = th.zipWithIndex.collect { case (h, i) if (h & mask) == 0L => i + 1 }.toSeq
      val starts = 0 +: ends
      val allEnds = ends :+ th.length
      starts.zip(allEnds).collect { case (s, e) if e > s =>
        FoldHashOps.foldHash64(new GenericArrayData(th.slice(s, e)))
      }
    }
    import spark.implicits._
    for (round <- 0 until 10) {
      val r = new scala.util.Random(400 + round)
      val maskBits = 1 + r.nextInt(6) // small masks -> many boundaries
      val texts = (0 until 20).map { _ =>
        val len = 1 + r.nextInt(60)
        (0 until len).map(_ => "w" + r.nextInt(300)).mkString(" ")
      } :+ "solo" // single-token edge
      val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
        .select(col("id"), Dedup.cdcChunkHashes(col("text"), maskBits).as("ch"))
        .collect().map(x => x.getLong(0) -> x.getSeq[Long](1)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) === refChunks(t, maskBits),
          s"round $round maskBits $maskBits doc $i")
      }
    }
  }

  test("deterministic and partition-invariant through the declared query") {
    val run = () => SparkEntry.queries("q_dedup_cdc")(spark, sfDir).collect()
    assert(run().map(_.toSeq).toSeq === run().map(_.toSeq).toSeq)
  }
}
