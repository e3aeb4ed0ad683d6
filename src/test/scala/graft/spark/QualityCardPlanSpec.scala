package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * The quality report card's whole value is scan-cost amortization: six
 * signal families in ONE projection over ONE pass of the corpus. This
 * pins that shape — exactly one file scan, no joins, and no exchanges
 * other than the single presentation sort.
 */
class QualityCardPlanSpec extends SparkSpec {

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      nodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      nodes(q.plan)
    case other => other +: other.children.flatMap(nodes)
  }

  test("t_quality_card: one scan, zero joins, only the presentation sort " +
    "shuffles") {
    val df = graft.SparkEntry.queries("t_quality_card")(
      spark, graft.TestSpark.sf0001)
    df.collect()
    val all = nodes(df.queryExecution.executedPlan)
    assert(all.count(_.isInstanceOf[FileSourceScanExec]) == 1,
      "all six signal families must ride one corpus scan")
    assert(!all.exists(_.nodeName.toLowerCase.contains("join")),
      s"no joins expected:\n${all.map(_.nodeName).distinct}")
    assert(all.count(_.isInstanceOf[ShuffleExchangeExec]) <= 1,
      "only the presentation orderBy may exchange")
    assert(!all.exists(_.nodeName.contains("HashAggregate")),
      "per-row signals must not aggregate")
  }
}
