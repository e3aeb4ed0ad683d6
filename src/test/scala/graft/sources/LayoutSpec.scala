package graft.sources

import graft.SparkSpec
import graft.TestSpark.sf0001
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScan in plan"))

  test("writePartitioned: one file per partition; maxRecordsPerFile re-splits") {
    val dir = java.nio.file.Files.createTempDirectory("layout1").toString
    val events = Tables.events(spark, sf0001)
    Layout.writePartitioned(events, dir, Seq("event_type"))
    val nTypes = events.select("event_type").distinct().count()
    // pre-shuffle routing: exactly one file per partition directory
    assert(Layout.dataFileCount(spark, dir) == nTypes)
    // roundtrip is lossless
    assert(Layout.readPartitioned(spark, dir).count() == events.count())

    val dir2 = java.nio.file.Files.createTempDirectory("layout2").toString
    Layout.writePartitioned(events, dir2, Seq("event_type"),
      maxRecordsPerFile = 100L)
    assert(Layout.dataFileCount(spark, dir2) > nTypes) // hot partitions split
    assert(Layout.readPartitioned(spark, dir2).count() == events.count())
  }

  test("partition filter prunes at planning time: one directory's files read") {
    val dir = java.nio.file.Files.createTempDirectory("layout3").toString
    val events = Tables.events(spark, sf0001)
    Layout.writePartitioned(events, dir, Seq("event_type"))
    val one = events.select("event_type").distinct()
      .orderBy("event_type").head().getString(0)
    val filtered = Layout.readPartitioned(spark, dir)
      .filter(col("event_type") === one)
    // the filter must land in PartitionFilters (pruning), not DataFilters
    assert(scanOf(filtered).partitionFilters.map(_.toString)
      .exists(_.contains("event_type")),
      s"partition filter missing: ${scanOf(filtered).partitionFilters}")
    val expected = events.filter(col("event_type") === one).count()
    // execute THIS Dataset's plan (count() would build a fresh one and
    // leave this scan's metrics untouched), then read the executed metric
    assert(filtered.collect().length.toLong == expected)
    val scan = scanOf(filtered)
    // only the matching directory's single file was opened
    assert(scan.metrics("numFiles").value == 1L,
      s"pruning read ${scan.metrics("numFiles").value} files")
  }

  test("schema evolution: a later batch's new column merges; old rows read null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout5").toString
    // batch 1: (doc_id, text); batch 2 adds a lang column (the crawl
    // pipeline grew a field) — the union scan must surface both
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("doc_id", "text", "lang", "batch"))
    val byId = merged.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(byId == Map(1L -> None, 2L -> None, 3L -> Some("en")))
  }

  test("compact: small-files layout collapses back to one file per partition") {
    val in = java.nio.file.Files.createTempDirectory("layout4in").toString
    val out = java.nio.file.Files.createTempDirectory("layout4out").toString
    val events = Tables.events(spark, sf0001)
    Layout.writePartitioned(events, in, Seq("event_type"), maxRecordsPerFile = 100L)
    val before = Layout.dataFileCount(spark, in)
    Layout.compact(spark, in, out, Seq("event_type"))
    val after = Layout.dataFileCount(spark, out)
    assert(after < before)
    assert(after == events.select("event_type").distinct().count())
    assert(Layout.readPartitioned(spark, out).count() == events.count())
  }
}
