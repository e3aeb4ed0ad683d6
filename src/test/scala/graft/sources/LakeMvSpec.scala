package graft.sources

import graft.SparkSpec
import graft.ops.Mv
import graft.sources.lake.GraftLake
import org.apache.spark.sql.functions._

/**
 * The two round-8 storage pieces composed: a GraftLake fact table's
 * file-diff change feed IS the signed-delta stream incremental
 * materialized-view maintenance consumes — delete rows are -1
 * retractions, insert rows +1, an update nets out as both. No separate
 * changelog capture needed: the lake's log already knows. The refreshed
 * view must equal a from-scratch aggregate over the lake's live state.
 */
class LakeMvSpec extends SparkSpec {

  import spark.implicits._

  test("lake change feed drives incremental view maintenance exactly") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_mv").toString
    val tbl = s"$base/fact"; val mv = s"$base/mv"
    val fact = (0 until 500)
      .map(i => (i.toLong, s"g${i % 7}", (i % 50).toLong))
      .toDF("id", "grp", "v")
    GraftLake.create(fact.repartitionByRange(4, col("id")), tbl) // lake v0
    Mv.build(GraftLake.read(spark, tbl), mv, keys = Seq("grp"), sums = Seq("v"))

    // business as usual: a delete and an upsert land on the fact table
    GraftLake.delete(spark, tbl, col("id") < 100L) // lake v1
    GraftLake.merge(spark, tbl,
      Seq((150L, "g0", 999L), (9000L, "gNew", 42L)).toDF("id", "grp", "v"),
      "id") // lake v2: one update (150 moves groups), one insert

    // the lake's CDC between the MV's base version and now IS the delta
    val delta = GraftLake.changes(spark, tbl, 0L, 2L)
      .withColumn("sign",
        when(col("change_kind") === "insert", 1L).otherwise(-1L))
    Mv.refresh(spark, mv, delta, keys = Seq("grp"), sums = Seq("v"),
      version = 1L, signCol = Some("sign"))

    val got = Mv.read(spark, mv)
      .select(col("grp"), col("v_sum"), col("__cnt"))
      .as[(String, Long, Long)].collect().toSet
    val expected = GraftLake.read(spark, tbl)
      .groupBy("grp").agg(sum(col("v")).as("v_sum"), count(lit(1)).as("__cnt"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == expected,
      "incrementally maintained view diverged from the from-scratch aggregate")
    assert(got.exists(_._1 == "gNew"), "inserted group appears")
    // the update moved 150's value out of its old contribution exactly
    assert(got == expected)
  }
}
