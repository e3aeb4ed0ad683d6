package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * AQE skew-join handling — the runtime half of the engine's skew story
 * (the compile-time half is `ops/Skew.saltedJoin`): a viral join key makes
 * one shuffle partition ~300× its siblings, and AQE splits it into
 * advisory-sized slices joined independently (`SortMergeJoin(skew=true)`),
 * so no single task owns the hot key's entire partition.
 *
 * Also pins the real-world TRAP: a groupBy on the join key directly above
 * the join REUSES the join's partitioning, and AQE will NOT split the
 * skewed partition there (splitting would break the aggregation's
 * required distribution). That asymmetry is why the engine's dedup/top-k
 * paths aggregate FIRST (partial-agg collapses the hot key map-side)
 * instead of relying on AQE to save a join-then-group plan.
 */
class SkewJoinAqeSpec extends SparkSpec {

  private def withSkewConfs[T](f: => T): T = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  // one viral key (75% of rows) + 1000 cold keys
  private def skewedLeft = spark.range(0, 400000).select(
    when(col("id") < 300000, lit(7L)).otherwise(col("id") % 1000).as("k"),
    col("id").as("v"))
  private def smallRight = spark.range(0, 1000).select(
    col("id").as("k"), (col("id") * 2).as("w"))

  test("a viral key's partition is split at runtime (skew=true)") {
    withSkewConfs {
      val j = skewedLeft.join(smallRight, "k")
      assert(j.collect().length === 400000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the join skew-handled:\n$plan")
      assert(plan.contains("AQEShuffleRead"),
        s"expected a runtime-rewritten shuffle read:\n$plan")
    }
  }

  test("trap: groupBy on the join key above the join blocks the skew split") {
    withSkewConfs {
      val agg = skewedLeft.join(smallRight, "k").groupBy("k").count()
      val n = agg.collect().length
      assert(n === 1000)
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        "AQE must decline the split when the parent requires the join's " +
          s"partitioning — if this starts passing, the engine's " +
          s"aggregate-first guidance should be revisited:\n$plan")
    }
  }
}
