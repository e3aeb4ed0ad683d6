package graft.spark

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.{ProjectExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/**
 * Plan lint: the engine's own checklist of 100 TB-scale antipatterns,
 * applied to a query's physical plan. Each finding is a plan shape that is
 * survivable at test SF and catastrophic at three orders of magnitude
 * more data — the same checks the round audits run by hand, executable so
 * specs (and users) can assert "this pipeline plans clean":
 *
 *  - CARTESIAN / broadcast-nested-loop joins: O(|L|·|R|) pair volume; at
 *    scale only acceptable for documented tiny-side baselines.
 *  - GLOBAL WINDOW (empty PARTITION BY): every row in one task's sort
 *    buffer — the single-task straggler ([[graft.ops.Corpus.packChunks]]'s
 *    plan assert exists precisely to avoid this).
 *  - GLOBAL SORT not feeding a limit: a full range-partitioned sort of the
 *    whole dataset; fine for final small outputs, a red flag mid-pipeline.
 *
 * Checks run on the pre-AQE physical plan (`sparkPlan`) — the shapes
 * above are decided before adaptive re-planning.
 */
object PlanLint {

  final case class Finding(rule: String, node: String)

  def check(df: Dataset[_]): Seq[Finding] = lint(df.queryExecution.sparkPlan)

  def lint(plan: SparkPlan): Seq[Finding] = {
    val findings = Seq.newBuilder[Finding]
    // global sort directly under a limit-style parent is fine (TakeOrdered
    // replaces it in practice); anything else with global=true is a full
    // dataset range-sort
    plan.foreach {
      case j: CartesianProductExec =>
        findings += Finding("cartesian-join", j.nodeName)
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("nested-loop-join", j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("global-window", w.nodeName)
      case s: SortExec if s.global =>
        findings += Finding("global-sort", s.nodeName)
      case _ =>
    }
    findings.result()
  }

  /** Assert-style helper: findings filtered by an allowlist of rules the
    * caller has consciously accepted (e.g. the final ORDER BY's
    * global-sort on a KB-sized result). */
  def violations(df: Dataset[_], accepted: Set[String] = Set.empty): Seq[Finding] =
    check(df).filterNot(f => accepted.contains(f.rule))

  /**
   * Gate-query variant: like [[check]], but the one global sort sitting on
   * the plan's ROOT SPINE (walking down through projections) is NOT
   * flagged — that is the query's presentation `ORDER BY`, required for
   * deterministic oracle output, sorting the already-reduced result.
   * Global sorts anywhere DEEPER in the plan (a mid-pipeline range sort
   * of the full dataset) still flag. Identity (`eq`) matching, so a
   * structurally identical sort below the spine is not masked.
   */
  def checkGate(df: Dataset[_]): Seq[Finding] = {
    val plan = df.queryExecution.sparkPlan
    @annotation.tailrec
    def presentationSort(p: SparkPlan): Option[SparkPlan] = p match {
      case s: SortExec if s.global => Some(s)
      case pr: ProjectExec => presentationSort(pr.child)
      case _ => None
    }
    val skip = presentationSort(plan)
    val findings = Seq.newBuilder[Finding]
    plan.foreach {
      case s: SortExec if skip.exists(_ eq s) => // presentation ORDER BY
      case j: CartesianProductExec =>
        findings += Finding("cartesian-join", j.nodeName)
      case j: BroadcastNestedLoopJoinExec =>
        findings += Finding("nested-loop-join", j.nodeName)
      case w: WindowExec if w.partitionSpec.isEmpty =>
        findings += Finding("global-window", w.nodeName)
      case s: SortExec if s.global =>
        findings += Finding("global-sort", s.nodeName)
      case _ =>
    }
    findings.result()
  }
}
