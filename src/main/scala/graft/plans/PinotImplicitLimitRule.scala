package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Pinot's implicit result limit, as an opt-in compat rule (SURVEY.md §2.6
  * O2 divergence): a Pinot broker applies `LIMIT 10` to every query that
  * does not state a limit (selection AND group-by alike), where Spark
  * returns the full result. With `graft.pinot.implicitLimit=true` on a
  * Pinot-mode session, a top-level plan with no limit of its own is wrapped
  * in `LIMIT 10` — closing the last documented semantic divergence for
  * users replaying reference-console queries verbatim.
  *
  * Guards: only the ROOT of a user execution is wrapped — subquery
  * optimization passes (root wrapped in [[Subquery]]), commands, streaming
  * plans, and plans already limited are left untouched, and the rewrite is
  * idempotent (the wrapped plan's root IS a GlobalLimit), so it is safe
  * under a fixed-point rule batch. Off by default: presence changes
  * nothing (same contract as RangeJoinBinningRule).
  */
object PinotImplicitLimitRule extends Rule[LogicalPlan] {
  val confKey = "graft.pinot.implicitLimit"
  val defaultLimit = 10

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(confKey, "false").toBoolean) return plan
    plan match {
      case _: Subquery => plan      // a subquery optimization pass, not a root query
      case _: Command => plan
      case _: CommandResult => plan
      case _ if plan.isStreaming => plan
      case GlobalLimit(_, _) => plan
      case _ => Limit(Literal(defaultLimit), plan)
    }
  }
}
