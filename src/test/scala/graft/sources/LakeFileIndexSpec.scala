package graft.sources

import graft.SparkSpec
import graft.sources.lake.{GraftLake, LakeFileIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LakeFileIndexSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lakeidx").toString

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScan in plan"))

  test("planner-integrated pruning: a plain filter opens only overlapping files") {
    val dir = tmp()
    GraftLake.create(
      (0 until 1000).map(i => (i.toLong, s"t$i", i.toLong * 2)).toDF("id", "tag", "v")
        .repartitionByRange(8, col("id")), dir)

    val filtered = LakeFileIndex.readPruned(spark, dir)
      .filter(col("id") >= 100L && col("id") <= 149L)
    // execute THIS plan, then read ITS scan metric (a derived .select
    // would plan and meter a fresh query execution)
    assert(filtered.collect().map(_.getLong(0)).toSet ==
      (100L to 149L).toSet, "pruning is planning acceleration, rows stay exact")
    val nFiles = scanOf(filtered).metrics("numFiles").value
    assert(nFiles >= 1 && nFiles < 8,
      s"planner must open a strict subset of the 8 files, opened $nFiles")

    // no filter → the whole snapshot
    val all = LakeFileIndex.readPruned(spark, dir)
    assert(all.collect().length == 1000)
    assert(scanOf(all).metrics("numFiles").value == 8)

    // the filter ALSO reaches the parquet reader as a pushed row-group
    // predicate (two-level skipping: files here, row groups there)
    assert(scanOf(filtered).metadata("PushedFilters").contains("GreaterThanOrEqual"))
  }

  test("readPruned honors time travel and schema evolution") {
    val dir = tmp()
    GraftLake.create(
      (0 until 100).map(i => (i.toLong, i.toLong)).toDF("id", "v"), dir, numFiles = 2)
    GraftLake.delete(spark, dir, col("id") < 50L)
    GraftLake.append(
      (100 until 110).map(i => (i.toLong, i.toLong, "en")).toDF("id", "v", "lang"),
      dir, numFiles = 1)

    assert(LakeFileIndex.readPruned(spark, dir, asOf = Some(0L)).count() == 100)
    val now = LakeFileIndex.readPruned(spark, dir)
    assert(now.count() == 60)
    assert(now.columns.toSeq == Seq("id", "v", "lang"))
    assert(now.filter(col("lang").isNull).count() == 50, "old files null-fill")

    // snapshot isolation: an index built BEFORE a delete keeps reading it
    val pinned = LakeFileIndex.readPruned(spark, dir)
    GraftLake.delete(spark, dir, col("id") >= 100L)
    assert(pinned.count() == 60, "pinned index unaffected by later commits")
    assert(LakeFileIndex.readPruned(spark, dir).count() == 50)
  }
}
