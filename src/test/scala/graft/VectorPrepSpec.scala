package graft

import graft.ops.{Dedup, VectorPrep}
import org.apache.spark.sql.functions._

/** Planted-value checks for the embedding-prep and token-gram kernels
  * behind q_embed_* and q_dedup_substring (the oracle gate proves fixture
  * parity; these prove hand-computable semantics). */
class VectorPrepSpec extends GraftSuite {
  import spark.implicits._

  test("l2Norm and l2Normalize on a planted 3-4-5 vector") {
    val df = Seq(Tuple1(Array(3.0f, 4.0f, 0.0f))).toDF("v")
    val r = df.select(
      VectorPrep.l2Norm($"v").as("n"),
      element_at(VectorPrep.l2Normalize($"v"), 1).as("x1")).head()
    assert(r.getDouble(0) === 5.0)
    assert(r.getDouble(1) === 0.6)
  }

  test("int8 quantization: exact scale and floor reconstruction error") {
    // max|x| = 127 → scale exactly 1.0; floor errors are then the planted
    // fractional parts: 0 + 0.5 + 0.75 + 0 over dim 4 → mean 0.3125 (all
    // binary-exact doubles, so equality is safe)
    val df = Seq(Tuple1(Array(127.0f, 3.5f, -2.25f, 0.0f))).toDF("v")
    val r = df.select(
      VectorPrep.int8Scale($"v").as("s"),
      VectorPrep.quantError($"v", VectorPrep.int8Scale($"v"), dim = 4).as("e")).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 0.3125)
  }

  test("quantization error is strictly below the scale for every vector") {
    val e = sources.Tables.t(spark, sfDir, "embeddings")
    val bad = e.select(
        VectorPrep.int8Scale($"embedding").as("s"),
        VectorPrep.quantError($"embedding", VectorPrep.int8Scale($"embedding"), 64).as("err"))
      .filter($"err" >= $"s").count()
    assert(bad === 0L)
  }

  test("tokenGramHashes: shared 5-grams hash identically, count is len-4") {
    val df = Seq(
      (1L, "a b c d e f"),          // grams: "a b c d e", "b c d e f"
      (2L, "z z a b c d e f"),      // contains both of doc 1's grams
      (3L, "q r s t u v w")         // disjoint
    ).toDF("id", "text")
    val grams = df.select($"id", Dedup.tokenGramHashes($"text", 5).as("gs"))
      .as[(Long, Array[Long])].collect().map(t => t._1 -> t._2.toSet).toMap
    assert(grams(1L).size === 2)
    assert(grams(2L).size === 4)
    assert(grams(3L).size === 3)
    assert(grams(1L).subsetOf(grams(2L)), "doc 2 must contain doc 1's grams")
    assert(grams(1L).intersect(grams(3L)).isEmpty)
  }

  test("tokenGramHashes: short docs yield one whole-text gram, not [1,0] junk") {
    val df = Seq((1L, "a b"), (2L, "a b")).toDF("id", "text")
    val gs = df.select(Dedup.tokenGramHashes($"text", 5).as("gs"))
      .as[Array[Long]].collect()
    assert(gs.forall(_.length === 1))
    assert(gs(0).toSeq === gs(1).toSeq)
  }
}
