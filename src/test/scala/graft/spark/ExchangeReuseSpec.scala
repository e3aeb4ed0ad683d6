package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Exchange reuse: when one subplan feeds several consumers (a self-join of
 * an aggregate, a fact scanned by two branches of a union), Catalyst plans
 * the shuffle ONCE and the other consumers read the same shuffle files
 * (`ReusedExchange`). At 100 TB this halves (or better) the dominant cost
 * of diamond-shaped analytics — the engine's dedup/CC/statistics pipelines
 * lean on it implicitly, so a regression here is a silent 2× on every
 * self-referential plan.
 */
class ExchangeReuseSpec extends SparkSpec {
  import spark.implicits._

  test("self-join of an aggregate reuses the aggregation exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val base = spark.range(0, 100000)
        .select((col("id") % 1000).as("k"), (col("id") % 7).as("v"))
      val agg = base.groupBy("k").agg(sum("v").as("sv"))
      // diamond: the same aggregate joined to itself — both branches
      // canonicalize identically, so the shuffle is planned once
      val j = agg.join(agg.select(col("k"), col("sv").as("sv2")), Seq("k"))
      // execute j ITSELF (count() would plan a different query), then read
      // the finalized adaptive plan off the same QueryExecution
      assert(j.collect().length === 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      // reuse appears as a ReusedExchange node or as both join sides
      // reading the SAME shuffle query stage id
      val stageIds = """ShuffleQueryStage (\d+)""".r
        .findAllMatchIn(plan).map(_.group(1)).toSeq
      val reused = plan.contains("ReusedExchange") ||
        (stageIds.nonEmpty && stageIds.distinct.size < stageIds.size)
      assert(reused,
        s"expected the aggregate's exchange planned once and reused:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
