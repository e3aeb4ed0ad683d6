package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter): when a
 * selectively-filtered dim joins a large fact, the optimizer plants a
 * bloom-filter aggregate on the dim side and a `bloom_filter_might_contain`
 * predicate on the fact SCAN side, so fact rows that cannot join die at the
 * scan instead of riding the shuffle. At 100 TB this is the difference
 * between shuffling the whole fact table and shuffling the ~selectivity
 * fraction that survives — the same effect dynamic partition pruning has
 * for partition columns, extended to arbitrary join keys.
 *
 * The engine relies on Spark's built-in rule rather than re-implementing
 * it; this spec pins the conditions under which it actually fires (both
 * sides must be scans past the size thresholds, the join a shuffle join) so
 * a conf or plan-shape regression is caught.
 */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim join injects a bloom-filter runtime predicate on the fact side") {
    val dir = java.nio.file.Files.createTempDirectory("rtf").toString
    spark.range(0, 200000).select(
      col("id").as("fk"), (col("id") % 97).as("v")).write.parquet(s"$dir/fact")
    spark.range(0, 50000).select(
      col("id").as("pk"), (col("id") % 17).as("cat")).write.parquet(s"$dir/dim")

    def run(enabled: Boolean) = {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", enabled.toString)
      // local parquet is far below the 10 GiB production default; drop the
      // application-side threshold so the rule considers the toy fact table
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      try {
        val fact = spark.read.parquet(s"$dir/fact")
        val dim = spark.read.parquet(s"$dir/dim").filter(col("cat") === 3)
        val joined = fact.join(dim, col("fk") === col("pk"))
          .groupBy(col("cat")).agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
        (joined.collect().toSeq, joined.queryExecution.optimizedPlan.toString)
      } finally {
        spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
        spark.conf.unset(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }

    val (rowsOn, planOn) = run(enabled = true)
    val (rowsOff, planOff) = run(enabled = false)
    // the injected filter optimizes to might_contain(<bloom_filter_agg
    // scalar subquery over the filtered dim>, xxhash64(fk)) on the fact side
    assert(planOn.contains("might_contain") && planOn.contains("bloom_filter_agg"),
      s"expected an injected runtime bloom filter:\n$planOn")
    assert(!planOff.contains("might_contain"))
    assert(rowsOn === rowsOff)
    assert(rowsOn.nonEmpty)
  }
}
