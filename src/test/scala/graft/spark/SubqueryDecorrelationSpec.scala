package graft.spark

import graft.SparkSpec
import graft.queries.AnalyticsQueries
import graft.TestSpark

/**
 * Pins that Catalyst DECORRELATES the three subquery shapes gated by
 * `q4_exists` / `q17_correlated_scalar` / `q16_not_in` into joins — the
 * scale-critical property: a correlated subquery that survives to
 * execution re-runs the inner plan per outer row (a scan per row at
 * 100 TB); decorrelated, each is one join against one aggregate/scan.
 */
class SubqueryDecorrelationSpec extends SparkSpec {
  private val sf = TestSpark.sf0001

  test("EXISTS decorrelates to a left-semi join") {
    val df = AnalyticsQueries.all("q4_exists")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    assert(!plan.contains("exists#"), s"EXISTS predicate must be planned away:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("correlated scalar average decorrelates to an aggregate joined on the key") {
    val df = AnalyticsQueries.all("q17_correlated_scalar")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    // the per-part average appears as a standalone Aggregate under a join,
    // not as a scalar-subquery expression evaluated per row
    assert(!opt.contains("scalar-subquery"), s"expected decorrelation:\n$opt")
    assert(opt.contains("avg(l_quantity"), s"expected hoisted aggregate:\n$opt")
    assert(df.collect().length === 1)
  }

  test("double correlation (EXISTS + NOT EXISTS on the same table) plans as semi + anti join") {
    val df = AnalyticsQueries.all("q21_waiting")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected one semi and one anti join:\n$plan")
    assert(!plan.contains("exists#") || !plan.contains("Filter exists"),
      s"EXISTS predicates must be planned away:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("NOT IN decorrelates to a null-aware anti join") {
    val df = AnalyticsQueries.all("q16_not_in")(spark, sf)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(df.collect().nonEmpty)
  }
}
