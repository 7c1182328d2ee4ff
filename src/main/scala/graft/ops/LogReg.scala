package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed logistic regression over hashed text features — the
  * fastText-class quality/domain classifier every pretraining pipeline
  * trains (e.g. the CCNet/GPT-3 "quality filter": score documents by a
  * linear model over hashed n-grams, keep the high-scoring tail).
  *
  * Training is full-batch gradient descent as distributed passes, with one
  * deliberate determinism device: gradient contributions are QUANTIZED to
  * DECIMAL (scale 18) before accumulation. Decimal addition is exact,
  * associative and commutative, so the aggregated gradient — and
  * therefore the whole training trajectory — is bit-identical under any
  * partitioning or row order, unlike a float sum whose value depends on
  * reduction order (the q_events_anomaly exact-moments doctrine applied
  * to learning). The quantization error (≤1e-18 per row) is far below any
  * learning-relevant scale; reproducibility is worth infinitely more in a
  * data pipeline than the 18th decimal of a gradient.
  *
  * Scale shape: features are SPARSE hashed bucket-id arrays (one entry per
  * n-gram occurrence — map-only to build); each GD iteration is one
  * map-only pass scoring rows against a broadcast D-double weight vector,
  * accumulating into ONE dense decimal accumulator per partition, reduced
  * across partitions (D decimals per partition on the wire — never per
  * row). Driver state is the weight vector; iterations loop over
  * codebook-sized state only — the classic distributed-GD topology.
  */
object LogReg {

  final case class Model(weights: Array[Double], bias: Double, dim: Int,
      losses: Seq[Double])

  /** Sparse hashed features: unigram+bigram PRESENCE bucket ids (mod
    * `dim`, power of two) of `textCol` — `array_distinct` binarizes, which
    * both matches the fastText presence convention and keeps |z| bounded
    * by the distinct-bucket count instead of document length (raw counts
    * made full-batch GD diverge at any useful learning rate). Map-only. */
  def hashedFeatures(textCol: Column, dim: Int, seed: Long = 17L): Column = {
    require((dim & (dim - 1)) == 0, s"dim must be a power of two, got $dim")
    val toks = split(textCol, " ")
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    array_distinct(transform(concat(toks, bigrams),
      g => graft.functions.stable_hash64(g, seed).bitwiseAND(lit(dim - 1L)).cast("int")))
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  private val Scale = 18

  /** Exact signed-128-bit gradient accumulator (round 12, guide §4 /
    * the PageRank never-decimal-per-edge doctrine applied to GD): the
    * per-feature update adds the SAME scale-18 quantized `err` to every
    * bucket of a row, and |err| < 1 guarantees its unscaled value fits a
    * long — so accumulation can run as two-limb integer adds (~5 ALU ops)
    * instead of a BigDecimal (BigInteger alloc + add) per feature. Integer
    * addition is exact and order-free in any representation, and the
    * per-bucket totals stay well under 2^127, so the reconstructed
    * scale-18 BigDecimal — and the whole training trajectory — is BIT
    * IDENTICAL to the former per-feature BigDecimal fold (LogRegSpec's
    * local-vs-distributed parity plus the Acc128 property spec). */
  private[graft] final class Acc128(n: Int) {
    val hi = new Array[Long](n)
    val lo = new Array[Long](n)
    def add(i: Int, v: Long): Unit = {
      val l = lo(i)
      val r = l + v
      lo(i) = r
      // unsigned carry-out of the low limb; v sign-extends into the high
      val carry = ((l & v) | ((l | v) & ~r)) >>> 63
      hi(i) += (v >> 63) + carry
    }
    /** the accumulated exact value as a scale-18 BigDecimal */
    def toBigDecimal(i: Int): BigDecimal = {
      val bi = java.math.BigInteger.valueOf(hi(i)).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo(i))))
      BigDecimal(new java.math.BigDecimal(bi, Scale))
    }
  }

  /** scale-18 HALF_EVEN quantization of `err` as its unscaled long —
    * exact while |v| ≤ 9.2 (callers pass |err| < 1) */
  private def quantErr(v: Double): Long =
    BigDecimal(v).setScale(Scale, BigDecimal.RoundingMode.HALF_EVEN)
      .underlying.unscaledValue.longValueExact

  /** Train by full-batch GD. `df` must carry `features` (array<int> of
    * bucket ids < `dim`) and `label` (0/1). Returns the model plus the
    * per-iteration mean log-loss trajectory (decimal-summed too — the
    * trajectory is part of the reproducibility contract). */
  def train(df: DataFrame, dim: Int, iters: Int, lr: Double): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(col("features"), col("label").cast("double").as("y"))
      .as[(Seq[Int], Double)]
      .persist()
    val nRows = data.count().toDouble
    require(nRows > 0, "logreg: empty training frame")
    var w = new Array[Double](dim)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    val zero = BigDecimal(0).setScale(Scale)
    var it = 0
    while (it < iters) {
      val bw = spark.sparkContext.broadcast(w)
      val bb = b
      // one dense decimal accumulator PER PARTITION; per-row updates are
      // sparse; decimal addition is exact+commutative, so any row order or
      // partitioning yields the same sums bit for bit
      val (gw, gb, lsum) = data.rdd.mapPartitions { rows =>
        val wv = bw.value
        // per-feature adds run on the exact 128-bit limbs (see Acc128);
        // only the loss (magnitude can exceed a long at scale 18) stays a
        // per-row BigDecimal add. Same sums bit for bit.
        val acc = new Acc128(wv.length + 1) // slot dim = the bias
        var accL = zero
        rows.foreach { case (x, y) =>
          var z = bb
          x.foreach(bkt => z += wv(bkt))
          val p = sigmoid(z)
          val err = p - y
          val loss = -(y * math.log(math.max(p, 1e-300)) +
            (1 - y) * math.log(math.max(1 - p, 1e-300)))
          val errQ = quantErr(err)
          x.foreach(bkt => acc.add(bkt, errQ))
          acc.add(wv.length, errQ)
          accL += BigDecimal(loss).setScale(Scale, BigDecimal.RoundingMode.HALF_EVEN)
        }
        Iterator.single((Array.tabulate(wv.length)(acc.toBigDecimal),
          acc.toBigDecimal(wv.length), accL))
      }.reduce { (a, c) =>
        (a._1.lazyZip(c._1).map(_ + _).toArray, a._2 + c._2, a._3 + c._3)
      }
      val nw = new Array[Double](dim)
      var i = 0
      while (i < dim) { nw(i) = w(i) - lr * (gw(i).toDouble / nRows); i += 1 }
      w = nw
      b -= lr * (gb.toDouble / nRows)
      losses += lsum.toDouble / nRows
      it += 1
    }
    data.unpersist()
    Model(w, b, dim, losses.result())
  }

  /** [[train]] with the Bpe.trainAuto cost model: when the training frame
    * fits `budgetRows`, collect it ONCE and loop gradient descent locally —
    * zero Spark jobs per iteration, which at small scale is the entire
    * cost (each distributed iteration pays a job's fixed overhead for
    * microseconds of math). Because gradient accumulation is quantized
    * decimal — exact, associative, commutative — the local loop produces
    * the distributed path's weights BIT FOR BIT (LogRegSpec proves it), so
    * the switch is invisible to callers. Past the budget the distributed
    * passes engage; at 100 TB that is the only path that runs. */
  def trainAuto(df: DataFrame, dim: Int, iters: Int, lr: Double,
      budgetRows: Long = 2000000L): Model = {
    val data = df.select(col("features"), col("label").cast("double").as("y"))
    val n = data.count()
    if (n > budgetRows) return train(df, dim, iters, lr)
    import df.sparkSession.implicits._
    val rows = data.as[(Seq[Int], Double)].collect()
    val nRows = rows.length.toDouble
    require(nRows > 0, "logreg: empty training frame")
    val zero = BigDecimal(0).setScale(Scale)
    var w = new Array[Double](dim)
    var b = 0.0
    val losses = Seq.newBuilder[Double]
    var it = 0
    while (it < iters) {
      // same Acc128 exact accumulation as the distributed path — the
      // local/distributed bit-parity contract is preserved by sharing it
      val acc = new Acc128(dim + 1) // slot dim = the bias
      var accL = zero
      rows.foreach { case (x, y) =>
        var z = b
        x.foreach(bkt => z += w(bkt))
        val p = sigmoid(z)
        val err = p - y
        val loss = -(y * math.log(math.max(p, 1e-300)) +
          (1 - y) * math.log(math.max(1 - p, 1e-300)))
        val errQ = quantErr(err)
        x.foreach(bkt => acc.add(bkt, errQ))
        acc.add(dim, errQ)
        accL += BigDecimal(loss).setScale(Scale, BigDecimal.RoundingMode.HALF_EVEN)
      }
      val nw = new Array[Double](dim)
      var i = 0
      while (i < dim) { nw(i) = w(i) - lr * (acc.toBigDecimal(i).toDouble / nRows); i += 1 }
      w = nw
      b -= lr * (acc.toBigDecimal(dim).toDouble / nRows)
      losses += accL.toDouble / nRows
      it += 1
    }
    Model(w, b, dim, losses.result())
  }

  /** Score a sparse feature column under a trained model (map-only,
    * broadcast weights). */
  def score(df: DataFrame, featCol: String, m: Model): DataFrame = {
    val spark = df.sparkSession
    val bw = spark.sparkContext.broadcast(m.weights)
    val bb = m.bias
    val f = udf { x: Seq[Int] =>
      val wv = bw.value
      var z = bb
      x.foreach { bkt =>
        // fail loudly at the boundary: featCol hashed with a different dim
        // than the model would otherwise surface as an opaque AIOOBE
        require(bkt >= 0 && bkt < wv.length,
          s"feature bucket $bkt outside model dim ${wv.length} — " +
            "featCol must be hashed with the model's dim")
        z += wv(bkt)
      }
      sigmoid(z)
    }
    df.withColumn("score", f(col(featCol)))
  }
}
