package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a naive interval-containment theta-join
  *
  *   left ⋈ right ON p >= lo AND p <= hi        (p from left; lo,hi right)
  *
  * into the binned equi-join graft.ops.RangeJoin implements by hand —
  * Spark would otherwise plan BroadcastNestedLoopJoin (quadratic, and a
  * driver-memory bomb when neither side is small). The rewrite:
  *
  *   left'  = left  + __bin  = floor(p / w)
  *   right' = right + explode(sequence(floor(lo/w), floor(hi/w))) AS __bin
  *   join ON __bin = __bin AND <original predicate>, then project the
  *   original output.
  *
  * Guarded by `spark.graft.rangeJoin.binWidth` (unset/0 = off). Set it to a
  * number to pin the width, or to `auto` to DERIVE it: one cheap stats
  * pre-pass over the interval side computes the approx-median interval
  * width (the `RangeJoin.deriveBinWidth` heuristic — bins-per-interval
  * ≈ 1–2, candidates-per-point O(local density), median robust to width
  * skew), cached per canonicalized (plan, lo, hi) so optimizer fixed-point
  * iterations and repeated queries don't re-scan. Fires only on INNER joins
  * whose condition is exactly the two double-typed bounds; the rewritten
  * join's condition has an equality conjunct at the top, so the rule cannot
  * re-fire on its own output. Null bounds produce a null sequence, which
  * `explode` drops — matching BETWEEN's null-is-false semantics.
  */
object RangeJoinBinningRule extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binWidth"

  /** Re-entrancy guard: the `auto` pre-pass executes a sub-query on this
    * thread; the rule must not fire inside its own derivation. */
  private val deriving = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = false
  }

  /** Derived widths keyed by canonicalized (interval plan, lo, hi) —
    * bounded; survives across queries in a session (same table+bounds =
    * same width). */
  private val widthCache =
    new java.util.concurrent.ConcurrentHashMap[(LogicalPlan, Expression, Expression), java.lang.Double]()

  private def derivedWidth(right: LogicalPlan, lo: Expression, hi: Expression): Double = {
    val key = (right.canonicalized, lo.canonicalized, hi.canonicalized)
    val cached = widthCache.get(key)
    if (cached != null) return cached.doubleValue()
    deriving.set(true)
    val w = try {
      val df = org.apache.spark.sql.graft.GraftBridge.ofRows(
        org.apache.spark.sql.SparkSession.active, right)
      val wcol = org.apache.spark.sql.graft.GraftBridge.column(Subtract(hi, lo))
      val row = df.select(
        org.apache.spark.sql.functions.percentile_approx(
          wcol, org.apache.spark.sql.functions.lit(0.5),
          org.apache.spark.sql.functions.lit(100)).as("med"),
        org.apache.spark.sql.functions.avg(wcol).as("mean")).first()
      val med = if (row.isNullAt(0)) 0.0 else row.getDouble(0)
      val mean = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      if (med > 0) med else if (mean > 0) mean else 1.0
    } finally deriving.set(false)
    if (widthCache.size() > 100) widthCache.clear()
    widthCache.put(key, w)
    w
  }

  /** Normalize one conjunct to (point, bound, boundIsLower) if it is a
    * double comparison between a left-side point and a right-side bound. */
  private def bound(
      e: Expression,
      left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Boolean)] = {
    def sides(a: Expression, b: Expression): Boolean =
      a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
        a.dataType == DoubleType && b.dataType == DoubleType
    e match {
      case GreaterThanOrEqual(p, lo) if sides(p, lo) => Some((p, lo, true))   // p >= lo
      case LessThanOrEqual(lo, p) if sides(p, lo)    => Some((p, lo, true))   // lo <= p
      case LessThanOrEqual(p, hi) if sides(p, hi)    => Some((p, hi, false))  // p <= hi
      case GreaterThanOrEqual(hi, p) if sides(p, hi) => Some((p, hi, false))  // hi >= p
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confVal = conf.getConfString(ConfKey, "0").trim
    val auto = confVal.equalsIgnoreCase("auto")
    val pinned = if (auto) 0.0 else confVal.toDouble
    if (!auto && pinned <= 0) return plan
    if (deriving.get()) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(And(c1, c2)), hint) =>
        // accept the bounds in either conjunct order: `p >= lo AND p <= hi`
        // and `p <= hi AND p >= lo` both fire (Catalyst is free to reorder
        // the conjuncts before this rule runs)
        val rewritten = for {
          b1 <- bound(c1, left, right)
          b2 <- bound(c2, left, right)
          if b1._3 != b2._3 && b1._1.semanticEquals(b2._1)
          (p1, lo, _) = if (b1._3) b1 else b2
          (_, hi, _) = if (b1._3) b2 else b1
        } yield {
          val w = if (auto) derivedWidth(right, lo, hi) else pinned
          val binAlias = Alias(Floor(Divide(p1, Literal(w))), "__graft_bin")()
          val newLeft = Project(left.output :+ binAlias, left)
          // Sequence is TimeZoneAwareExpression: unresolved until a zone is
          // pinned, even for integral sequences
          val rBins = new Sequence(
            Floor(Divide(lo, Literal(w))), Floor(Divide(hi, Literal(w))), None)
            .withTimeZone(conf.sessionLocalTimeZone)
          val binAttr = AttributeReference("__graft_bin_r", LongType, nullable = false)()
          val newRight = Generate(Explode(rBins), Nil, outer = false, None, Seq(binAttr), right)
          val cond = And(EqualTo(binAlias.toAttribute, binAttr), And(c1, c2))
          Project(j.output, Join(newLeft, newRight, Inner, Some(cond), hint))
        }
        rewritten.getOrElse(j)
    }
  }
}
