package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for embedding columns — the compression half
  * of the canonical large-scale ANN index (FAISS-style IVF-PQ): split each
  * d-dim vector into `m` sub-blocks, quantize every block to one of `k`
  * per-block centroids, and answer queries with asymmetric distance
  * computation (ADC) — the query stays exact, each candidate costs `m`
  * table lookups instead of `d` multiplies, and the corpus shrinks from
  * d×4 bytes to m codes per vector (64× at d=64, m=4, k≤256).
  *
  * 100 TB posture: codebooks are tiny (m×k×d/m floats) and train on a
  * driver-side SAMPLE (the broadcast-a-tiny-dim pattern, same class as the
  * IVF centroid collect in q_sim_ann_ivf); encoding is a map-only pass;
  * ADC is a per-pair expression over broadcast LUT columns. Nothing here
  * grows with corpus size except the map passes.
  *
  * All distance folds are float32-widened-to-float64 SEQUENTIAL sums (the
  * `VectorOps` convention), so a DuckDB `list_reduce` oracle reproduces
  * every distance bit-exactly.
  */
object Pq {

  /** Per-block codebooks: `cents(b)(j)` is the j-th centroid of block b,
    * a d/m-length float array. */
  final case class Codebooks(m: Int, dim: Int, cents: Array[Array[Array[Float]]]) {
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    def sub: Int = dim / m
    def k: Int = cents(0).length
  }

  /** Deterministic sample codebooks: block b of sample vector j becomes
    * centroid (b, j). The declared query uses this (exactly the
    * q_sim_ann_ivf precedent — SQL-oracle-replicable); production runs
    * [[train]] on a corpus sample instead. */
  def sampleCodebooks(samples: Seq[Array[Float]], m: Int): Codebooks = {
    val dim = samples.head.length
    val sub = dim / m
    Codebooks(m, dim,
      Array.tabulate(m)(b => samples.map(_.slice(b * sub, (b + 1) * sub)).toArray))
  }

  /** Lloyd's k-means per block over a driver-side sample (deterministic:
    * first-k init, stable argmin tiebreak). The sample is bounded by the
    * caller — at 100 TB a few thousand vectors train codebooks that serve
    * the whole corpus. */
  def train(samples: Seq[Array[Float]], m: Int, k: Int, iters: Int): Codebooks = {
    val dim = samples.head.length
    val sub = dim / m
    val cents = Array.tabulate(m) { b =>
      val pts = samples.map(_.slice(b * sub, (b + 1) * sub)).toArray
      var cb = pts.take(k).map(_.clone())
      var it = 0
      while (it < iters) {
        val sums = Array.fill(k)(new Array[Double](sub))
        val counts = new Array[Int](k)
        pts.foreach { p =>
          val j = nearest(p, cb)
          counts(j) += 1
          var i = 0
          while (i < sub) { sums(j)(i) += p(i); i += 1 }
        }
        cb = Array.tabulate(k) { j =>
          if (counts(j) == 0) cb(j)
          else Array.tabulate(sub)(i => (sums(j)(i) / counts(j)).toFloat)
        }
        it += 1
      }
      cb
    }
    Codebooks(m, dim, cents)
  }

  /** Raw sequential-float64 squared-L2 fold between a float-array column
    * and a literal centroid — the EXACT composition of [[nearest]]'s inner
    * loop (no sqrt-square detour: that differs by a ulp and could flip a
    * near-tie argmin vs the driver trainer). Interpreted HOF is fine here:
    * training touches only the sample, never the corpus. */
  private def rawL2sq(blk: Column, cent: Array[Float]): Column = {
    val centLit = array(cent.map(v => lit(v)): _*)
    aggregate(
      zip_with(blk, centLit, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Distributed Lloyd's k-means per block — the 100 TB training path: the
    * driver-side [[train]] collects the whole sample; this runs every pass
    * as DataFrame operators, so the training sample can be as large as the
    * cluster, not the driver. Per iteration: (1) assignment is a map-only
    * pass (current centroids ride along as literals — the broadcast-tiny
    * pattern, m×k×sub floats); (2) the centroid update aggregates per
    * (block, code, dim) — m×k×sub groups total, so the shuffle after
    * map-side partial collapse is tiny regardless of sample size; (3) only
    * the m×k×sub new centroid VALUES are collected (never data rows). No
    * lineage growth across iterations: each pass re-plans from the
    * persisted sample with fresh literals, so no checkpoint discipline is
    * needed (unlike Components, nothing iterates over its own output).
    *
    * BIT-IDENTICAL to [[train]] on the same sample in `idCol` order: the
    * update folds each group's values in id order (sort_array(collect_list
    * (struct(id, v)))) then sums sequentially in float64, divides by the
    * count, casts to float32 — exactly the driver trainer's
    * `(sums/counts).toFloat` with the same addition order, so floating-
    * point non-associativity never diverges the two. Empty clusters keep
    * their previous centroid, ties go to the lowest code — both as in
    * [[train]]. PqSpec asserts the equality exactly, not approximately. */
  def trainDistributed(
      sample: org.apache.spark.sql.DataFrame,
      idCol: String,
      embCol: String,
      m: Int,
      k: Int,
      iters: Int): Codebooks = {
    val dim = sample.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m blocks")
    val sub = dim / m
    val s = sample
      .select(col(idCol).cast("long").as("__sid"), col(embCol).as("__emb"))
      .persist()
    try {
      // init = first k sample vectors in id order (train's pts.take(k))
      var cents: Array[Array[Array[Float]]] = {
        val first = s.orderBy(col("__sid")).limit(k).collect()
          .map(_.getSeq[Float](1).toArray)
        Array.tabulate(m)(b => first.map(_.slice(b * sub, (b + 1) * sub)))
      }
      var it = 0
      while (it < iters) {
        val perBlock = (0 until m).map { b =>
          val blk = slice(col("__emb"), b * sub + 1, sub)
          // two-step select: a lambda-HOF column loses its alias inside
          // struct() (fields degrade to colN), so name the distances first
          val distCols = cents(b).zipWithIndex.map { case (c, j) =>
            rawL2sq(blk, c).as(s"__d$j")
          }
          val withD = s.select(
            (Seq(col("__sid"), blk.as("__blk")) ++ distCols).toIndexedSeq: _*)
          val scored = cents(b).indices.map(j =>
            struct(col(s"__d$j").as("d"), lit(j).as("j")))
          withD.select(lit(b).as("b"), col("__sid"),
            sort_array(array(scored.toIndexedSeq: _*))(0).getField("j").as("code"),
            posexplode(col("__blk")).as(Seq("pos", "v")))
        }
        val updated = perBlock.reduce(_ union _)
          .groupBy(col("b"), col("code"), col("pos"))
          .agg(sort_array(collect_list(struct(col("__sid"), col("v")))).as("lst"))
          .select(col("b"), col("code"), col("pos"),
            (aggregate(col("lst"), lit(0.0),
              (acc, x) => acc + x.getField("v").cast("double"))
              / size(col("lst"))).cast("float").as("c"))
          .collect()
        val next = Array.tabulate(m)(b => cents(b).map(_.clone()))
        updated.foreach { r =>
          next(r.getAs[Int]("b"))(r.getAs[Int]("code"))(r.getAs[Int]("pos")) =
            r.getAs[Float]("c")
        }
        cents = next
        it += 1
      }
      Codebooks(m, dim, cents)
    } finally { s.unpersist(); () }
  }

  /** Index of the nearest centroid (squared L2, ties to the lowest index). */
  def nearest(p: Array[Float], cb: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < cb.length) {
      var d = 0.0
      var i = 0
      while (i < p.length) {
        val diff = p(i).toDouble - cb(j)(i).toDouble
        d += diff * diff
        i += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** Mean squared quantization error of the sample under the codebooks
    * (trainer-quality metric for specs). */
  def quantizationError(samples: Seq[Array[Float]], cb: Codebooks): Double = {
    val sub = cb.sub
    val errs = samples.map { v =>
      (0 until cb.m).map { b =>
        val p = v.slice(b * sub, (b + 1) * sub)
        val c = cb.cents(b)(nearest(p, cb.cents(b)))
        p.zip(c).map { case (x, y) => val d = x.toDouble - y.toDouble; d * d }.sum
      }.sum
    }
    errs.sum / samples.length
  }

  /** Sequential float64 squared-L2 between a block slice of `emb` and a
    * literal centroid block. Computed as the square of the codegen'd
    * [[graft.expressions.MinkowskiDistance]] L2 kernel rather than an
    * `aggregate(zip_with(...))` fold: Spark's higher-order functions
    * evaluate their lambdas interpreted per element, and with m×k folds
    * per row the HOF path measured ~2× slower. sqrt-then-square costs a
    * ulp vs the raw fold but stays bit-replicable (the oracle applies the
    * identical sqrt·square composition to the identical sequential fold —
    * |x−y|² == (x−y)², so the kernel's abs changes nothing). */
  private def l2sqBlock(emb: Column, off: Int, cent: Array[Float]): Column = {
    import org.apache.spark.sql.graft.GraftBridge
    val centLit = array(cent.map(v => lit(v)): _*)
    val l2 = GraftBridge.column(graft.expressions.MinkowskiDistance(
      GraftBridge.expression(slice(emb, off + 1, cent.length)),
      GraftBridge.expression(centLit), 2))
    l2 * l2
  }

  /** PQ codes for an embedding column: array<int> of length m, code b =
    * argmin_j l2sq(block_b, centroid(b, j)) with ties to the lowest j.
    * Map-only; the codebooks ride along as literals (broadcast-tiny). */
  def encodeCol(emb: Column, cb: Codebooks): Column = {
    val codes = (0 until cb.m).map { b =>
      val scored = cb.cents(b).zipWithIndex.map { case (c, j) =>
        struct(l2sqBlock(emb, b * cb.sub, c).as("d"), lit(j).as("j"))
      }
      sort_array(array(scored: _*))(0).getField("j")
    }
    array(codes: _*)
  }

  /** Per-block ADC lookup table for a query embedding column:
    * array<array<double>> where lut\[b\]\[j\] = l2sq(query block b,
    * centroid(b, j)). Computed once per query row. */
  def lutCol(emb: Column, cb: Codebooks): Column =
    array((0 until cb.m).map { b =>
      array(cb.cents(b).map(c => l2sqBlock(emb, b * cb.sub, c)): _*)
    }: _*)

  /** ADC distance: sum_b lut\[b\]\[codes\[b\]\] — sequential over blocks
    * (b = 1..m), so the oracle's ordered-list fold matches bit-for-bit. */
  def adcCol(codes: Column, lut: Column, m: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(m)).cast("array<int>"),
        b => element_at(element_at(lut, b), element_at(codes, b) + 1)),
      lit(0.0),
      (acc, v) => acc + v)
}
