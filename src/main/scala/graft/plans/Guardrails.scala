package graft.plans

import org.apache.spark.SparkException
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Session-level plan guardrails — the library's PlanInvariantSpec checks
  * productionized as a Catalyst extension (`SparkSessionExtensions`), so a
  * pipeline can refuse scale-killer plans at PLAN time instead of
  * discovering them as a 10-hour straggler stage at 100 TB.
  *
  * Flagged shapes (the two that are never survivable on unbounded data):
  *  - a join with NO condition where BOTH sides can be large — the n×m
  *    cartesian. Sides the planner can PROVE small (`maxRows` ≤
  *    [[Guardrails.SmallSide]]: scalar aggregates, limits, tiny ranges)
  *    are exempt, which is exactly the deliberate one-row-broadcast
  *    pattern the engine's own queries use for ppm denominators.
  *  - a window function with an EMPTY partition spec over a possibly
  *    large child — every row shuffles to one reducer and sorts there.
  *    (Dimension-bounded frames — a per-day carry, a vocab rank — are
  *    unprovable to the planner and legitimately global; run those
  *    pipelines in `warn`, not `fail`.)
  *
  * Modes via the `spark.graft.guardrails` session conf, settable per
  * query at runtime: `off` (default — zero behavior change), `warn`
  * (log and continue), `fail` (raise at plan time with the violation
  * named). The rule only inspects — it never rewrites the plan.
  *
  * Registered by [[GraftExtensions]]; [[graft.GraftSession]] wires it
  * into every builder, and `spark.sql.extensions=graft.plans.GraftExtensions`
  * does the same for sessions built elsewhere.
  */
object Guardrails {

  val ConfKey = "spark.graft.guardrails"

  /** A side whose planner-proven row bound is at or under this is never a
    * cartesian risk: scalar aggregates (maxRows = 1), small limits, tiny
    * literal ranges.
    */
  val SmallSide = 1000L

  private[plans] def provablySmall(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= SmallSide)

  private[plans] case class GuardrailRule() extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = {
      val mode = conf.getConfString(ConfKey, "off")
      if (mode != "off") {
        plan.foreach {
          case j: Join if j.condition.isEmpty
              && !provablySmall(j.left) && !provablySmall(j.right) =>
            report(mode, "unbounded cross join (no join condition, neither side " +
              s"provably <= $SmallSide rows): n*m pairs at scale. Add an equi " +
              "condition, broadcast a provably small side, or pre-aggregate.")
          case w: Window if w.partitionSpec.isEmpty && !provablySmall(w.child) =>
            report(mode, "window without partitionBy over a possibly large input: " +
              "one reducer sorts every row at scale. Partition the window, or use " +
              "a bounded aggregate (TopKOrdered) / two-level prefix scheme.")
          case _ =>
        }
      }
      plan
    }

    private def report(mode: String, msg: String): Unit =
      if (mode == "fail") throw new SparkException(s"[graft.guardrails] $msg")
      else logWarning(s"[graft.guardrails] $msg")
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => Guardrails.GuardrailRule())
}
