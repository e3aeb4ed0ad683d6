package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Approximate aggregates (HLL++ / t-digest style) — sketch-based
  * re-aggregation is the 100 TB shape for distincts and quantiles (exact
  * count distinct is a full shuffle of the key universe; the sketch is a
  * few KB per group). No cross-engine oracle (HLL implementations differ);
  * accuracy asserted against the exact answers instead.
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within its error bound vs exact") {
    val e = Tables.events(spark, graft.TestSpark.sf0001)
    val (approx, exact) = e.select(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("a"),
        countDistinct(col("user_id")).as("x"))
      .as[(Long, Long)].head()
    val relErr = math.abs(approx.toDouble - exact) / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("approx_percentile brackets the exact percentile") {
    val o = Tables.orders(spark, graft.TestSpark.sf0001)
    val row = o.select(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap"),
        expr("percentile(o_totalprice, 0.5)").as("ex"))
      .as[(Double, Double)].head()
    val (ap, ex) = row
    assert(math.abs(ap - ex) / ex < 0.01, s"approx=$ap exact=$ex")
  }
}
