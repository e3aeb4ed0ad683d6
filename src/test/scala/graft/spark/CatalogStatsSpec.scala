package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Cost-based planning from catalog statistics: without stats Spark sizes a
 * catalog table by file bytes; `ANALYZE TABLE ... COMPUTE STATISTICS`
 * records row/byte counts (and per-column stats `FOR COLUMNS`) that the
 * optimizer reads at plan time — the difference between a dim joining as a
 * broadcast vs both sides shuffling, decided from metadata alone. This is
 * the catalog-table counterpart of the connector-side
 * `SupportsReportStatistics` row (GraftDocsSourceSpec): the same planner
 * input, sourced from ANALYZE instead of the connector.
 */
class CatalogStatsSpec extends SparkSpec {

  test("ANALYZE TABLE statistics feed the optimizer's size estimates") {
    // row-count propagation through plan stats is the CBO estimator's job
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS graft_stats_dim")
    spark.range(0, 500).select(col("id").as("k"), (col("id") % 5).as("c"))
      .write.mode("overwrite").saveAsTable("graft_stats_dim")
    try {
      spark.sql("ANALYZE TABLE graft_stats_dim COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE graft_stats_dim COMPUTE STATISTICS FOR COLUMNS k, c")
      val described = spark.sql(
        "DESCRIBE EXTENDED graft_stats_dim").collect()
        .map(r => (r.getString(0), r.getString(1))).toMap
      val stats = described.getOrElse("Statistics", "")
      assert(stats.contains("500 rows"), s"expected row count in stats: $stats")

      // the optimizer's relation estimate now carries the analyzed rowCount
      val rel = spark.table("graft_stats_dim")
      val est = rel.queryExecution.optimizedPlan.stats
      assert(est.rowCount.contains(BigInt(500)), s"stats not used: $est")

      // and a filtered dim joins a large fact as a broadcast, chosen from
      // those estimates at plan time (no runtime sampling)
      val fact = spark.range(0, 500000).select((col("id") % 500).as("k"),
        col("id").as("v"))
      val j = fact.join(spark.table("graft_stats_dim").filter(col("c") === 1), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"expected broadcast:\n$plan")
      assert(j.count() === 100000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_stats_dim")
      spark.conf.unset("spark.sql.cbo.enabled")
    }
  }
}
