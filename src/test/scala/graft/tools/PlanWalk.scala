package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Physical-tree walking shared by PlanAudit (diagnostic) and
  * PlanInvariantSpec (enforcement) — counting by WALKING the plan,
  * crossing AQE wrappers and subqueries, instead of regexing the
  * rendering (which misses unordered global windows and shifts with
  * print-format changes).
  */
object PlanWalk {

  /** Every node in the tree, descending through AQE wrappers, query
    * stages, and subqueries.
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.initialPlan)
      case qs: QueryStageExec => Seq(qs.plan)
      case other => other.children
    }
    p +: (kids.flatMap(allNodes) ++ p.subqueries.flatMap(allNodes))
  }

  /** Unpartitioned WindowExec/WindowGroupLimitExec nodes — the ones that
    * log Spark's `WindowExec: No Partition Defined` warning.
    */
  def unpartitionedWindows(p: SparkPlan): Int = allNodes(p).count {
    case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.isEmpty
    case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec =>
      w.partitionSpec.isEmpty
    case _ => false
  }
}
