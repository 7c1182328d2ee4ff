package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._

/** Pinot's DEFAULT null semantics, as an opt-in compat rule (SURVEY.md §2.2
  * F6 divergence): a stock Pinot table without `enableNullHandling`
  * substitutes per-type default values for missing fields AT INGEST —
  * `Integer.MIN_VALUE` / `Long.MIN_VALUE` for ints, negative infinity for
  * floating point, the literal string `"null"`, `false`, epoch 0, empty
  * bytes — so console queries never see SQL NULL: `WHERE x < 5` matches
  * null rows (as MIN_VALUE), `count(x)` counts them, and `x IS NULL` is
  * never true. This engine is ANSI (SQL nulls) by default; with
  * `graft.pinot.nullDefaults=true` on a Pinot-mode session, every file-scan
  * column gets `coalesce(col, typeDefault)` — reproducing what a reference
  * user's verbatim console query returns.
  *
  * The substitution happens at the SCAN (as Pinot's does, at segment
  * build), projecting only the columns the plan actually references, so
  * column pruning survives. Predicate pushdown on substituted columns is
  * deliberately forfeited: a parquet-pushed `x < 5` would drop null rows
  * that Pinot-mode must keep as MIN_VALUE matches — correctness over scan
  * stats, and only in this opt-in mode. Off by default: presence changes
  * nothing (same contract as PinotImplicitLimitRule).
  */
object PinotNullDefaultsRule extends Rule[LogicalPlan] {
  val confKey = "graft.pinot.nullDefaults"

  private val wrappedTag = TreeNodeTag[Boolean]("graft.pinot.nullDefaults.wrapped")

  /** Pinot's per-type default null value (dimension-field defaults — the
    * ones console SELECTs surface). Types Pinot has no scalar default for
    * (arrays, maps, structs) keep SQL null. */
  private[graft] def defaultFor(dt: DataType): Option[Literal] = dt match {
    case IntegerType | ShortType | ByteType => Some(Literal(Int.MinValue, IntegerType))
    case LongType => Some(Literal(Long.MinValue))
    case FloatType => Some(Literal(Float.NegativeInfinity))
    case DoubleType => Some(Literal(Double.NegativeInfinity))
    case StringType => Some(Literal("null"))
    case BooleanType => Some(Literal(false))
    case TimestampType => Some(Literal(0L, TimestampType))
    case BinaryType => Some(Literal(Array.emptyByteArray, BinaryType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    if (plan.isInstanceOf[Command] || plan.isInstanceOf[CommandResult]) return plan
    // columns the plan consumes: every non-leaf node's expression
    // references, plus the root output (a bare SELECT * has no referencing
    // expression). Leaves are excluded — a LogicalRelation's `expressions`
    // list IS its output schema, which would mark every column needed and
    // defeat column pruning.
    val needed = AttributeSet(plan.output) ++
      AttributeSet(plan.collect {
        case n if n.children.nonEmpty => n.expressions.flatMap(_.references)
      }.flatten)
    plan.transformUp {
      case rel: LogicalRelation if rel.getTagValue(wrappedTag).isEmpty &&
          rel.output.exists(a => needed.contains(a) && a.nullable &&
            defaultFor(a.dataType).isDefined) =>
        rel.setTagValue(wrappedTag, true) // idempotent under fixed-point reruns
        val projs = rel.output.filter(needed.contains).map { a =>
          defaultFor(a.dataType).filter(_ => a.nullable) match {
            // reuse the attribute's exprId so every consumer above resolves
            // unchanged against the substituted column
            case Some(d) => Alias(Coalesce(Seq(a, d)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
            case None => a
          }
        }
        Project(projs, rel)
    }
  }
}
