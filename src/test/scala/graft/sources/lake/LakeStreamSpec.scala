package graft.sources.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * `readStream.format("graft-lake")` — the table as a version-offset
 * changelog: initial snapshot, append tailing, exactly-once resume from
 * the streaming checkpoint, fail-fast (or skip) on row-rewriting
 * commits, and `startingVersion` control.
 */
class LakeStreamSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def drain(dir: String, out: String, ckpt: String,
      extra: Map[String, String] = Map.empty): Unit = {
    var r = spark.readStream.format("graft-lake").option("path", dir)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("initial snapshot + append tailing, exactly-once across restarts") {
    val dir = tmp("lakestream") + "/t"
    val out = tmp("lakestream_out"); val ckpt = tmp("lakestream_ck")
    GraftLake.create((0 until 50).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 2)
    GraftLake.append((50 until 70).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 1)

    drain(dir, out, ckpt) // batch 0 = snapshot at stream start (v0+v1)
    assert(spark.read.parquet(out).count() == 70)

    // two more commits; a RESTARTED query reads exactly the new rows
    GraftLake.append((70 until 80).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 1)
    GraftLake.appendStreamBatch(
      (80 until 90).map(i => (i.toLong, s"v$i")).toDF("id", "s"), dir, "app", 0L, 1)
    drain(dir, out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.count() == 90, "resume must deliver each appended row exactly once")
    assert(all.select("id").as[Long].collect().sorted.toSeq == (0L until 90L))

    // nothing new -> nothing delivered
    drain(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == 90)
  }

  test("metadata-only commits (ADD COLUMN / SET TBLPROPERTIES) and " +
    "insert-only merges never kill a running stream") {
    val dir = tmp("lakestream_meta") + "/t"
    val out = tmp("lakestream_meta_out"); val ckpt = tmp("lakestream_meta_ck")
    GraftLake.create((0 until 20).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 1)
    drain(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == 20)
    // every metadata-only commit kind, then a data commit: the stream
    // (pinned to the start schema) must skip the former and deliver the
    // latter — pre-fix, add-column/set-properties killed the stream with
    // a misleading "row-rewriting commits cannot be streamed" error
    GraftLake.addColumn(spark, dir, "note",
      org.apache.spark.sql.types.StringType)
    GraftLake.setCheckpointEvery(spark, dir, 5)
    GraftLake.renameColumn(spark, dir, "s", "sv")
    // insert-only merge = adds-only commit: streamable as an append
    GraftLake.mergeInto(spark, dir,
      Seq((100L, "new", "n")).toDF("id", "sv", "note"),
      org.apache.spark.sql.functions.col("t.id") ===
        org.apache.spark.sql.functions.col("s.id"),
      matched = Nil,
      notMatched = Seq(GraftLake.NotMatchedInsert(None, Seq(
        "id" -> org.apache.spark.sql.functions.col("s.id"),
        "sv" -> org.apache.spark.sql.functions.col("s.sv"),
        "note" -> org.apache.spark.sql.functions.col("s.note")))))
    GraftLake.append(Seq((200L, "tail", "t")).toDF("id", "sv", "note"), dir, 1)
    drain(dir, out, ckpt)
    val all = spark.read.parquet(out)
    assert(all.count() == 22, "ALTERs skipped, merge-insert + append delivered")
    assert(all.select("id").as[Long].collect().sorted.toSeq ==
      ((0L until 20L) ++ Seq(100L, 200L)))
  }

  test("maxVersionsPerTrigger + native Trigger.AvailableNow: a catch-up " +
    "drain delivers the WHOLE backlog in N-commit batches, then stops " +
    "(not Spark's single-giant-batch fallback)") {
    val dir = tmp("lakestream_rate") + "/t"
    val out = tmp("lakestream_rate_out"); val ckpt = tmp("lakestream_rate_ck")
    GraftLake.create((0 until 10).map(i => (i.toLong, i.toLong)).toDF("id", "v"),
      dir, numFiles = 1)
    drain(dir, out, ckpt) // initial snapshot, checkpoint at v0
    assert(spark.read.parquet(out).count() == 10)
    // a 3-commit backlog; ONE AvailableNow run drains it all, but each
    // admitted batch advances a single commit (SupportsTriggerAvailableNow
    // + the version cap — before r13 this fell back to one giant batch)
    GraftLake.append(Seq((100L, 0L)).toDF("id", "v"), dir, 1)
    GraftLake.append(Seq((101L, 0L)).toDF("id", "v"), dir, 1)
    GraftLake.append(Seq((102L, 0L)).toDF("id", "v"), dir, 1)
    val opts = Map("maxVersionsPerTrigger" -> "1")
    var r = spark.readStream.format("graft-lake").option("path", dir)
    opts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"3 one-commit batches expected, got ${batches.length}")
    assert(batches.forall(_.numInputRows == 1))
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq ==
      ((0L until 10L) ++ Seq(100L, 101L, 102L)))
    // a version committed AFTER the trigger prepared would not have been
    // drained; a fresh AvailableNow run picks it up — and an empty
    // backlog run is a clean no-op
    GraftLake.append(Seq((103L, 0L)).toDF("id", "v"), dir, 1)
    drain(dir, out, ckpt, opts)
    assert(spark.read.parquet(out).count() == 14)
    drain(dir, out, ckpt, opts) // nothing left: no-op
    assert(spark.read.parquet(out).count() == 14)
  }

  test("readChangeFeed: a CDC stream survives OPTIMIZE and delete-mor " +
    "mid-feed, emitting exactly the net row-level deltas") {
    val dir = tmp("lakestream_cdf") + "/t"
    val out = tmp("lakestream_cdf_out"); val ckpt = tmp("lakestream_cdf_ck")
    GraftLake.create(
      (0 until 40).map(i => (i.toLong, i.toLong * 2)).toDF("id", "v"),
      dir, numFiles = 4)
    def drainCdf(): Unit =
      drain(dir, out, ckpt, Map("readChangeFeed" -> "true"))

    drainCdf() // initial snapshot as inserts
    val b0 = spark.read.parquet(out)
    assert(b0.count() == 40 &&
      b0.select("change_kind").distinct().as[String].collect().toSeq == Seq("insert"))

    // a PURE LAYOUT commit + a row-rewriting MoR delete + an append land
    // between drains: pre-CDF both rewrites would kill the stream; the
    // change feed must net them to exactly (2 deletes + 3 inserts)
    GraftLake.optimize(spark, dir, smallBytes = 1L << 30, targetBytes = 1L << 30)
    GraftLake.deleteMoR(spark, dir, col("id").isin(7L, 23L))
    GraftLake.append((100 until 103).map(i => (i.toLong, 0L)).toDF("id", "v"), dir, 1)
    drainCdf()
    val delta = spark.read.parquet(out).exceptAll(b0)
      .select("id", "change_kind").as[(Long, String)].collect().toSet
    assert(delta == Set((7L, "delete"), (23L, "delete"),
      (100L, "insert"), (101L, "insert"), (102L, "insert")),
      s"net CDC delta wrong: $delta")

    // a CoW update streams as delete(old)+insert(new)
    GraftLake.update(spark, dir, col("id") === 3L, Seq("v" -> lit(999L)))
    val before = spark.read.parquet(out)
    drainCdf()
    val delta2 = spark.read.parquet(out).exceptAll(before)
      .select("id", "v", "change_kind").as[(Long, Long, String)].collect().toSet
    assert(delta2 == Set((3L, 6L, "delete"), (3L, 999L, "insert")))
  }

  test("row-rewriting commits fail fast; skipChangeCommits skips them") {
    val dir = tmp("lakestream2") + "/t"
    val out = tmp("lakestream2_out"); val ckpt = tmp("lakestream2_ck")
    GraftLake.create((0 until 30).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 1)
    drain(dir, out, ckpt)
    assert(spark.read.parquet(out).count() == 30)

    GraftLake.delete(spark, dir, col("id") < 10L) // a change commit
    GraftLake.append((100 until 105).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      dir, numFiles = 1)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, out, ckpt)
    }
    assert((e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .contains("skipChangeCommits"), "change commit must fail with guidance")

    // with the option: the delete is skipped, the append flows through
    drain(dir, out, ckpt, Map("skipChangeCommits" -> "true"))
    val ids = spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq
    assert(ids == ((0L until 30L) ++ (100L until 105L)),
      s"skipChangeCommits must deliver only true appends, got ${ids.size} rows")
  }

  test("streaming sink: batches land as fenced commits; crash replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = tmp("lakesink") + "/t"
    val ckpt = tmp("lakesink_ck")
    val mem = MemoryStream[(Long, String)](spark)
    def sinkDrain(): Unit = {
      val q = mem.toDF().toDF("id", "s")
        .writeStream.format("graft-lake")
        .option("path", dir).option("appId", "sinkspec")
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    mem.addData((0L, "a"), (1L, "b"))
    sinkDrain()
    assert(GraftLake.read(spark, dir).count() == 2,
      "first batch creates the table and lands its rows")
    mem.addData((2L, "c"))
    sinkDrain()
    assert(GraftLake.read(spark, dir).count() == 3)
    val versionAfter = GraftLake.latestVersion(dir)

    // crash replay: drop the LAST streaming commit (and its crc) so the
    // engine re-runs the epoch — the (appId, batchId) fence must make the
    // replayed addBatch a no-op
    val commits = new java.io.File(ckpt, "commits").listFiles()
      .filter(_.getName.matches("\\d+")).sortBy(_.getName.toLong)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    assert(last.delete())
    sinkDrain()
    assert(GraftLake.read(spark, dir).count() == 3,
      "replayed epoch must commit nothing twice")
    assert(GraftLake.latestVersion(dir) == versionAfter,
      "replay must not even add an empty commit")

    // round trip: the sink's table serves the source
    assert(spark.read.format("graft-lake").load(dir)
      .select("id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("startingVersion: latest tails only post-start commits; N starts mid-log") {
    val dir = tmp("lakestream3") + "/t"
    GraftLake.create((0 until 10).map(i => (i.toLong, "a")).toDF("id", "s"),
      dir, numFiles = 1) // v0
    GraftLake.append((10 until 20).map(i => (i.toLong, "b")).toDF("id", "s"),
      dir, numFiles = 1) // v1

    // latest: the pre-existing 20 rows are NOT replayed
    val out = tmp("lakestream3_out"); val ckpt = tmp("lakestream3_ck")
    drain(dir, out, ckpt, Map("startingVersion" -> "latest"))
    assert(!new java.io.File(out).exists() || spark.read.parquet(out).count() == 0)
    GraftLake.append((20 until 25).map(i => (i.toLong, "c")).toDF("id", "s"),
      dir, numFiles = 1) // v2
    drain(dir, out, ckpt, Map("startingVersion" -> "latest"))
    assert(spark.read.parquet(out).select("id").as[Long].collect().sorted.toSeq ==
      (20L until 25L))

    // numeric: changelog from version 1 (the v1 append included)
    val out2 = tmp("lakestream3_out2"); val ckpt2 = tmp("lakestream3_ck2")
    drain(dir, out2, ckpt2, Map("startingVersion" -> "1"))
    assert(spark.read.parquet(out2).select("id").as[Long].collect().sorted.toSeq ==
      (10L until 25L))
  }
}
