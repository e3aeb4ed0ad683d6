package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PlanLintSpec extends SparkSpec {
  import spark.implicits._

  private def base = spark.range(0, 1000)
    .select((col("id") % 10).as("k"), col("id").as("v"))

  test("cartesian and nested-loop joins are flagged") {
    val cross = base.crossJoin(spark.range(0, 10).select(col("id").as("j")))
    assert(PlanLint.check(cross).exists(f =>
      f.rule == "cartesian-join" || f.rule == "nested-loop-join"))
    val theta = base.join(spark.range(0, 10).select(col("id").as("j")),
      col("v") > col("j"))
    assert(PlanLint.check(theta).exists(_.rule == "nested-loop-join"))
  }

  test("global window and global sort are flagged; partitioned forms are clean") {
    val gw = base.withColumn("rn", row_number().over(Window.orderBy("v")))
    assert(PlanLint.check(gw).exists(_.rule == "global-window"))
    val gs = base.orderBy("v")
    assert(PlanLint.check(gs).exists(_.rule == "global-sort"))
    val pw = base.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("v")))
    assert(!PlanLint.check(pw).exists(_.rule == "global-window"))
  }

  test("a clean aggregation-join pipeline has no findings; allowlist filters accepted ones") {
    val dim = spark.range(0, 10).select(col("id").as("k"), (col("id") * 2).as("w"))
    val clean = base.join(dim, "k").groupBy("k")
      .agg(sum("v").as("sv"), max("w").as("mw"))
    assert(PlanLint.check(clean).isEmpty)
    val ordered = clean.orderBy("k") // final KB-sized output sort: accepted
    assert(PlanLint.violations(ordered, accepted = Set("global-sort")).isEmpty)
    assert(PlanLint.violations(ordered).nonEmpty)
  }

  test("the engine's own gated pipelines plan clean (spot check)") {
    // reservoir sampling + stratified sampling + bucket checksum: no
    // cartesian, no global window, no global sort besides their final
    // ordering
    val docs = graft.sources.Tables.documents(spark, graft.TestSpark.sf0001)
    val ops = Seq(
      graft.ops.Sampling.reservoirPerGroup(docs, "lang", "doc_id", 3),
      graft.ops.Sampling.stratifiedByHash(docs, "lang", "doc_id", Map.empty, "4"),
      graft.ops.Integrity.bucketSignature(docs, col("doc_id") % 8,
        graft.ops.Integrity.rowSignature(col("doc_id"), col("text"))))
    ops.foreach { df =>
      assert(PlanLint.violations(df, accepted = Set("global-sort")).isEmpty,
        s"unexpected plan finding in:\n${df.queryExecution.sparkPlan}")
    }
  }
}
