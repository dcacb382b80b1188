package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The ONE place that knows how to find `FileSourceScanExec` nodes in
  * an executed (possibly AQE) plan — shared by the pruning probe and
  * the specs so the descent rules can't drift apart (review find).
  * Descends materialized `QueryStageExec` subtrees (the DV anti-join
  * nests its scans there); `ReusedExchangeExec` is NOT descended — its
  * subtree executes once under the original exchange, and re-counting
  * would inflate `numFiles`. */
object PlanScans {

  def scans(p: SparkPlan): Seq[FileSourceScanExec] = (p match {
    case s: FileSourceScanExec => Seq(s)
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case _ => Seq.empty
  }) ++ p.children.flatMap(scans)

  /** Sum of the `numFiles` metric across an EXECUTED frame's scans —
    * call after an action has run the plan. */
  def filesOpened(df: DataFrame): Long =
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
}
