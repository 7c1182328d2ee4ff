package graft

import graft.ops.Chunker
import org.apache.spark.sql.functions._

/** Planted-input semantics for the overlapping token-window chunker:
  * boundaries, overlap, trailing short chunk, single-chunk short docs. */
class ChunkerSpec extends GraftSuite {

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Int, String, Int)] = {
    import spark.implicits._
    Chunker.chunks(Seq(text).toDF("text"), col("text"), size, stride)
      .select("chunk_start", "chunk_text", "chunk_tokens")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2)))
      .sortBy(_._1)
      .toSeq
  }

  test("10 tokens, size 4, stride 3: three chunks, 1-token overlap, short tail") {
    val text = "a b c d e f g h i j"
    assert(chunksOf(text, 4, 3) === Seq(
      (0, "a b c d", 4),
      (3, "d e f g", 4),
      (6, "g h i j", 4)))
  }

  test("trailing partial chunk is emitted once and only once") {
    // 5 tokens, size 4, stride 3 → starts 0 and 3; second chunk has 2 tokens
    assert(chunksOf("a b c d e", 4, 3) === Seq(
      (0, "a b c d", 4),
      (3, "d e", 2)))
  }

  test("doc shorter than the window yields exactly one full-doc chunk") {
    assert(chunksOf("a b", 4, 3) === Seq((0, "a b", 2)))
    assert(chunksOf("a b c d", 4, 3) === Seq((0, "a b c d", 4)))
  }

  test("every token is covered and consecutive chunks overlap by size-stride") {
    val toks = (1 to 97).map(i => s"t$i")
    val got = chunksOf(toks.mkString(" "), 32, 24)
    // starts advance by exactly the stride, first 0, last covers the tail
    val starts = got.map(_._1)
    assert(starts === starts.indices.map(_ * 24))
    assert(starts.last + got.last._3 === 97, "tail chunk must end at the last token")
    // overlap: each chunk's first 8 tokens (after the first chunk) repeat the
    // previous chunk's last 8
    got.sliding(2).foreach {
      case Seq((s1, t1, _), (s2, t2, _)) =>
        val prev = t1.split(" ").drop(s2 - s1)
        assert(t2.split(" ").take(prev.length).sameElements(prev))
      case _ =>
    }
  }

  test("invalid parameters are rejected") {
    import spark.implicits._
    val df = Seq("x").toDF("text")
    intercept[IllegalArgumentException](Chunker.chunks(df, col("text"), 4, 5))
    intercept[IllegalArgumentException](Chunker.chunks(df, col("text"), 0, 1))
  }
}
