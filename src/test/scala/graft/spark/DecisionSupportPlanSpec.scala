package graft.spark

import graft.SparkSpec
import graft.TestSpark
import graft.queries.DecisionSupportQueries

/**
 * Plan pins for the TPC-H completion set (Q6–Q9, Q11–Q15, Q18–Q20) —
 * each query's SCALE claim, asserted from the actual plan rather than
 * trusted from the code shape:
 *  - Q6: every predicate reaches the parquet scan as a pushed filter
 *    (the query is I/O-bound by construction or it is wrong);
 *  - Q7/Q8/Q9: the role-played nation dims broadcast, never shuffle;
 *  - Q11/Q15: the self-referencing scalar threshold plans ONE aggregate
 *    reused, not two scans of the fact;
 *  - Q18: the HAVING'd IN subquery becomes a semi join against aggregated
 *    keys;
 *  - Q19: the disjunction keeps a pushed dim-side component (partial
 *    pushdown) and plans NO cartesian product;
 *  - Q20: both IN rungs become semi joins.
 */
class DecisionSupportPlanSpec extends SparkSpec {
  private val sf = TestSpark.sf0001
  // the two nation-pair/dominant-share queries are too selective to return
  // rows at sf0.001; their plan pins run against sf0.01
  private val sf01 = "/root/testdata/sf0.01"

  private def q(name: String) = DecisionSupportQueries.all(name)(spark, sf)

  test("Q6: date, discount and quantity predicates are all pushed to the scan") {
    val df = q("q6_forecast")
    val scan = df.queryExecution.executedPlan.toString
    // the to_date rewrite turns the date bounds into l_shipdate timestamp
    // bounds; all three columns must appear in PushedFilters
    val pushed = scan.linesIterator.filter(_.contains("PushedFilters")).mkString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"expected $c pushed:\n$scan")
    assert(df.collect().length === 1)
  }

  test("Q7: both nation role joins broadcast; no cartesian") {
    val df = DecisionSupportQueries.all("q7_nation_volume")(spark, sf01)
    assert(df.collect().nonEmpty)
    // post-execution: the AQE-final plan, not the tentative initial one
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected the two nation attaches broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
  }

  test("Q8: region-gated customer nations and supplier nations broadcast") {
    val df = q("q8_market_share")
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected broadcast dim attaches:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("Q9: part name pattern prunes the dim scan (pushed string predicate)") {
    val df = q("q9_profit")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("StringContains(p_name,gear)") ||
      scan.linesIterator.exists(l => l.contains("PushedFilters") && l.contains("p_name")),
      s"expected the p_name contains-filter pushed:\n$scan")
    assert(df.collect().nonEmpty)
  }

  test("Q11: the 0.2% threshold reuses the main aggregate's exchange") {
    val df = q("q11_important_parts")
    assert(df.collect().nonEmpty)
    // AQE reuses the scalar-subquery side's shuffle against the main
    // aggregation's — visible only in the executed (final) plan
    val exec = df.queryExecution.executedPlan.toString
    assert(exec.contains("ReusedExchange"),
      s"expected exchange reuse for the self-threshold:\n$exec")
  }

  test("Q15: revenue argmax attaches the max as a broadcast one-row join") {
    val df = q("q15_top_supplier")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast scalar attach:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("Q18: the HAVING'd IN subquery plans as a semi join on aggregated keys") {
    val df = q("q18_large_orders")
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi"), s"expected semi join:\n$opt")
    assert(df.collect().nonEmpty)
  }

  test("Q19: the disjunction plans without a cartesian and keeps a pushed component") {
    val df = q("q19_disjunctive")
    val exec = df.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct"), s"no cartesian:\n$exec")
    // the partkey equi-key must survive as the join key despite the OR
    assert(exec.contains("BroadcastHashJoin") || exec.contains("SortMergeJoin") ||
      exec.contains("ShuffledHashJoin"), s"expected an equi join:\n$exec")
    assert(df.collect().length === 1)
  }

  test("Q20: the supplier IN decorrelates to a semi join; no cartesian") {
    val df = DecisionSupportQueries.all("q20_part_suppliers")(spark, sf01)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftSemi"),
      s"expected the supplier IN planned as a semi join:\n$opt")
    assert(df.collect().nonEmpty)
    val exec = df.queryExecution.executedPlan.toString
    assert(!exec.contains("CartesianProduct"), s"no cartesian:\n$exec")
  }

  test("Q13: zero-order customers survive the left join with count 0") {
    val rows = q("q13_custdist").collect()
    assert(rows.nonEmpty)
    // distribution must total the customer count exactly
    val total = rows.map(_.getLong(1)).sum
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(total === nCust, s"distribution covers every customer")
  }
}
