package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._

/** Seeded fuzz: duplicateSpans / removeDuplicateSpans against a direct
  * Scala reference over random small-vocab corpora (high dup density).
  * The reference works on gram STRINGS; the engine works in 64-bit hash
  * space — agreement across every round is also a collision check. */
class DedupFuzzSpec extends GraftSuite {

  private val N = 3

  private def refSpans(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val occ = for {
      (id, text) <- docs
      toks = text.split(" ")
      if toks.length >= N
      p <- 0 to toks.length - N
    } yield (id, p, toks.slice(p, p + N).mkString("|"))
    val dupGrams = occ.groupBy(_._3).filter(_._2.size > 1).keySet
    occ.filter(o => dupGrams.contains(o._3))
      .groupBy(_._1)
      .map { case (id, os) =>
        val ps = os.map(_._2).distinct.sorted
        // island merge: break when gap > N
        val islands = ps.foldLeft(List.empty[(Int, Int)]) {
          case (Nil, p) => List((p, p))
          case ((s, e) :: rest, p) =>
            if (p - e > N) (p, p) :: (s, e) :: rest else (s, p) :: rest
        }
        id -> ((islands.size.toLong,
          islands.map { case (s, e) => e + N - s }.sum.toLong))
      }
  }

  private def refRemove(docs: Seq[(Long, String)]): Map[Long, String] = {
    val occ = for {
      (id, text) <- docs
      toks = text.split(" ")
      if toks.length >= N
      p <- 0 to toks.length - N
    } yield (id, p, toks.slice(p, p + N).mkString("|"))
    val byGram = occ.groupBy(_._3).filter(_._2.size > 1)
    val removable = byGram.values.flatMap { os =>
      val keeper = os.map(o => (o._1, o._2)).min
      os.map(o => (o._1, o._2)).filterNot(_ == keeper)
    }.toSet
    val covered = removable.flatMap { case (id, p) => (p until p + N).map((id, _)) }
    docs.map { case (id, text) =>
      val toks = text.split(" ")
      id -> toks.zipWithIndex.collect {
        case (t, i) if !covered.contains((id, i)) => t
      }.mkString(" ")
    }.toMap
  }

  test("8 seeded rounds: spans and removal match the string-space reference") {
    import spark.implicits._
    for (round <- 0 until 8) {
      val r = new scala.util.Random(100 + round)
      val vocabSize = 6 + r.nextInt(10) // tiny vocab -> dense duplication
      val docs = (0L until 25L).map { id =>
        val len = 2 + r.nextInt(40)
        (id, (0 until len).map(_ => "t" + r.nextInt(vocabSize)).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text").repartition(1 + round % 5)

      val gotSpans = Dedup.duplicateSpans(df, "doc_id", "text", N)
        .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      assert(gotSpans === refSpans(docs), s"spans diverged in round $round")

      val gotClean = Dedup.removeDuplicateSpans(df, "doc_id", "text", N)
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      assert(gotClean === refRemove(docs), s"removal diverged in round $round")
    }
  }
}
