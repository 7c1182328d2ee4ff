package graft

import graft.ops.Pq
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Product quantization: trainer quality, encode correctness against the
  * plain-Scala reference, and ADC retrieval recall vs exact ranking. */
class PqSpec extends GraftSuite {

  private lazy val vecs: Array[Array[Float]] =
    Tables.t(spark, sfDir, "embeddings")
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(_.getSeq[Float](1).toArray)

  test("k-means trainer: quantization error does not increase over iterations and beats the raw sample") {
    val sample = vecs.take(256).toSeq
    val e0 = Pq.quantizationError(sample, Pq.train(sample, m = 4, k = 16, iters = 0))
    val e2 = Pq.quantizationError(sample, Pq.train(sample, m = 4, k = 16, iters = 2))
    val e8 = Pq.quantizationError(sample, Pq.train(sample, m = 4, k = 16, iters = 8))
    assert(e2 <= e0, s"2 iters $e2 vs init $e0")
    assert(e8 <= e2, s"8 iters $e8 vs 2 iters $e2")
    assert(e8 < e0 * 0.9, s"training barely moved: $e0 -> $e8")
  }

  test("distributed trainer is bit-identical to the driver-side trainer") {
    // same sample, same id order, same init, same iteration count → the
    // deterministic ordered-fold update must reproduce Pq.train EXACTLY
    // (not approximately): float64 sums in id order, /count, cast float32.
    val sampleDf = Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select(col("vec_id"), col("embedding"))
    val driverSample = vecs.take(256).toSeq
    for (iters <- Seq(0, 1, 3)) {
      val d = Pq.train(driverSample, m = 4, k = 16, iters = iters)
      val dist = Pq.trainDistributed(sampleDf, "vec_id", "embedding",
        m = 4, k = 16, iters = iters)
      assert(dist.m === d.m && dist.dim === d.dim)
      (0 until d.m).foreach { b =>
        (0 until d.k).foreach { j =>
          assert(java.util.Arrays.equals(dist.cents(b)(j), d.cents(b)(j)),
            s"iters=$iters block=$b centroid=$j diverged: " +
              s"${dist.cents(b)(j).take(4).mkString(",")} vs ${d.cents(b)(j).take(4).mkString(",")}")
        }
      }
    }
  }

  test("distributed trainer improves quantization error like the driver trainer") {
    val sampleDf = Tables.t(spark, sfDir, "embeddings")
      .filter(col("vec_id") < 256)
      .select(col("vec_id"), col("embedding"))
    val sample = vecs.take(256).toSeq
    val e0 = Pq.quantizationError(sample,
      Pq.trainDistributed(sampleDf, "vec_id", "embedding", m = 4, k = 16, iters = 0))
    val e3 = Pq.quantizationError(sample,
      Pq.trainDistributed(sampleDf, "vec_id", "embedding", m = 4, k = 16, iters = 3))
    assert(e3 < e0, s"distributed training must reduce error: $e0 -> $e3")
  }

  test("encodeCol matches the Scala nearest-centroid reference per block") {
    val cb = Pq.sampleCodebooks(vecs.take(16).toSeq, m = 4)
    val got = Tables.t(spark, sfDir, "embeddings")
      .orderBy(col("vec_id"))
      .select(Pq.encodeCol(col("embedding"), cb).as("codes"))
      .collect()
      .map(_.getSeq[Int](0).toArray)
    vecs.zip(got).zipWithIndex.foreach { case ((v, codes), vi) =>
      (0 until cb.m).foreach { b =>
        val p = v.slice(b * cb.sub, (b + 1) * cb.sub)
        assert(codes(b) === Pq.nearest(p, cb.cents(b)), s"vec $vi block $b")
      }
    }
  }

  // The fixture embeddings are isotropic random vectors — there is no
  // cluster structure, so nearest-neighbor contrast is tiny and ADC top-3
  // ≈ random for ANY 4×16 PQ (verified against a NumPy reference too).
  // The production PQ contract is shortlist-then-exact-rerank (the
  // q_sim_ann_quantized two-stage shape): what must hold is (a) ADC
  // approximates true squared L2 with bounded relative error, and (b) the
  // exact top-3 lands in a modest ADC shortlist.
  test("ADC approximates exact L2² and its shortlist contains the exact top-3") {
    def l2sq(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
    def evalCb(cb: Pq.Codebooks): (Double, Double) = {
      def adc(q: Array[Float], codes: Array[Int]): Double =
        (0 until cb.m).map { b =>
          l2sq(q.slice(b * cb.sub, (b + 1) * cb.sub), cb.cents(b)(codes(b)))
        }.sum
      val codes = vecs.map { v =>
        (0 until cb.m).map(b =>
          Pq.nearest(v.slice(b * cb.sub, (b + 1) * cb.sub), cb.cents(b))).toArray
      }
      val queries = (20 until 40).filter(_ < vecs.length)
      val perQ = queries.map { qi =>
        val q = vecs(qi)
        val others = vecs.indices.filter(_ != qi)
        val exactD = others.map(i => i -> l2sq(q, vecs(i)))
        val approxD = others.map(i => i -> adc(q, codes(i)))
        val relErr = exactD.zip(approxD)
          .map { case ((_, e), (_, a)) => math.abs(a - e) }.sum / exactD.map(_._2).sum
        val top3 = exactD.sortBy { case (i, d) => (d, i) }.take(3).map(_._1).toSet
        val short50 = approxD.sortBy { case (i, d) => (d, i) }.take(50).map(_._1).toSet
        (relErr, top3.intersect(short50).size / 3.0)
      }
      (perQ.map(_._1).sum / perQ.length, perQ.map(_._2).sum / perQ.length)
    }
    val (errSample, recSample) = evalCb(Pq.sampleCodebooks(vecs.take(16).toSeq, m = 4))
    assert(errSample <= 0.2, s"sample-codebook ADC mean relative error $errSample")
    assert(recSample >= 0.3, s"sample-codebook top3-in-ADC50 recall $recSample")
    val (_, recTrained) = evalCb(Pq.train(vecs.take(256).toSeq, m = 4, k = 16, iters = 8))
    assert(recTrained >= 0.4, s"trained-codebook top3-in-ADC50 recall $recTrained")
  }

  test("declared q_sim_ann_pq returns 3 ranked neighbors per query, ADC ascending") {
    val rows = SparkEntry.queries("q_sim_ann_pq")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rs) =>
      assert(rs.length === 3, s"query $qid")
      val adcs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(adcs.sorted.sameElements(adcs), s"query $qid ADC not ascending")
      assert(!rs.exists(_.getLong(2) == qid), s"query $qid returned itself")
    }
  }
}
