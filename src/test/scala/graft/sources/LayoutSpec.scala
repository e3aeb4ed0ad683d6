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

  test("zValue2: bit interleave is exact on hand-computed points") {
    import spark.implicits._
    // z(1,0)=1·4⁰? no — x bits land at even positions: z(1,0)=1, z(0,1)=2,
    // z(3,5) = x bits {0,1} → 1+4=5; y bits {0,2} → 2+32=34; z=39
    val out = Seq((1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 2L, 39L, 4294967295L))
  }

  test("writeZOrdered: box predicate prunes row groups vs unclustered layout") {
    import spark.implicits._
    // a 256×256 grid; the box [0,31]² is 1/64 of the data and occupies ONE
    // contiguous Z-range (z < 2^10), so a Z-range-partitioned layout should
    // satisfy it from ~1 of 16 files' row groups
    val grid = spark.range(0, 65536L).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"))
    val zDir = java.nio.file.Files.createTempDirectory("layoutZ").toString
    val rrDir = java.nio.file.Files.createTempDirectory("layoutRR").toString
    Layout.writeZOrdered(grid, zDir, "x", "y", numFiles = 16)
    grid.repartition(16).write.mode("overwrite").parquet(rrDir)

    def scannedRows(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("x") <= 31 && col("y") <= 31)
      assert(df.collect().length == 1024)
      scanOf(df).metrics("numOutputRows").value
    }
    val zRows = scannedRows(zDir)
    val rrRows = scannedRows(rrDir)
    // round-robin files all span the full x/y range: nothing prunes and the
    // scan surfaces every row; the Z-clustered layout's row-group min/max
    // satisfy the box from a small fraction of the table
    assert(rrRows == 65536L, s"expected no pruning on round-robin, got $rrRows")
    // repartitionByRange samples its bounds, so the box may straddle a
    // couple of files — but it must never touch more than a quarter of them
    assert(zRows * 4 <= rrRows,
      s"Z-order layout should prune most row groups, got $zRows of $rrRows")
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

  test("statsManifest + skippingRead: range predicate served from file stats") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_skip").toString
    // 1000 rows range-clustered on k into 10 files: file i owns [100i, 100i+99]
    (0L until 1000L).map(k => (k, k * 7)).toDF("k", "v")
      .repartitionByRange(10, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(dir)
    val m = Layout.statsManifest(spark, dir, Seq("k"))
    assert(m.count() == 10)
    // envelopes are tight: per-file max-min spans exactly its slice
    assert(m.agg(sum(col("max_k") - col("min_k") + 1)).head.getLong(0) == 1000L)

    val (scan, kept, total) = Layout.skippingRead(
      spark, dir, m, "k", lit(250L), lit(449L))
    assert(total == 10 && kept <= 3 && kept >= 2) // 2 full slices + boundary
    val got = scan.as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (250L to 449L))
    assert(got.forall { case (k, v) => v == k * 7 })

    // empty intersection: zero files, empty (not failing) scan
    val (empty, kept0, _) = Layout.skippingRead(
      spark, dir, m, "k", lit(5000L), lit(6000L))
    assert(kept0 == 0 && empty.count() == 0)
  }

  test("bloomManifest + bloomSkippingRead: point lookup on an unsorted key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_bloom").toString
    // keys deliberately NOT clustered with the file layout: files are
    // range-split on a scrambled order column, so min/max on k is useless
    (0L until 1000L).map(k => (k, (k * 6364136223846793005L) % 1000))
      .toDF("k", "scramble")
      .repartitionByRange(10, col("scramble")).sortWithinPartitions("scramble")
      .write.mode("overwrite").parquet(dir)
    val m = Layout.bloomManifest(spark, dir, "k", nBits = 1 << 14).cache()
    assert(m.count() == 10)

    // a present key: found exactly, with most files pruned (the key lives
    // in one file; FP rate at this load is ~0)
    val (scan, kept, total) = Layout.bloomSkippingRead(
      spark, dir, m, "k", lit(777L), nBits = 1 << 14)
    assert(total == 10 && kept < 10 && kept >= 1)
    assert(scan.select("k").as[Long].collect().toSeq == Seq(777L))

    // an absent key: blooms have no false negatives, and at this load the
    // probe should miss everywhere -> empty scan either way
    val (miss, _, _) = Layout.bloomSkippingRead(
      spark, dir, m, "k", lit(123456789L), nBits = 1 << 14)
    assert(miss.count() == 0)
    m.unpersist()
  }

  test("denseIds: 0..n-1 in total order, parallel windows, no 1-task funnel") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val keys = rnd.shuffle((0L until 5000L).toList)
    val df = keys.map(k => (k, k % 7)).toDF("k", "payload").repartition(13)
    val out = Layout.denseIds(df, Seq("k"), nParts = 8)
    val got = out.select("k", "dense_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    // in a shuffled 0..4999 key space, dense_id must equal the key itself
    assert(got.map(_._1).toSeq == (0L until 5000L))
    assert(got.forall { case (k, id) => id == k })
    // the ranking windows are per-range-partition, never one global window
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), s"expected partitioned window:\n$plan")
    // invariant under input partitioning
    val again = Layout.denseIds(df.repartition(3), Seq("k"), nParts = 8)
      .select("k", "dense_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(again.toSeq == got.toSeq)
  }

  test("dynamic partition pruning: a dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_dpp").toString
    (0 until 10000).map(i => (i.toLong, (i % 10).toLong))
      .toDF("v", "p").write.partitionBy("p").mode("overwrite").parquet(dir)
    val fact = spark.read.parquet(dir)
    // partition-column discovery types p as INT — the dim side must match
    // exactly (a cast on the partition column defeats runtime pruning).
    // The dim is a real parquet table: DPP's benefit/reuse logic targets
    // scans, not LocalRelations.
    val dimDir = java.nio.file.Files.createTempDirectory("layout_dpp_dim").toString
    (0 until 10).map(p => (p, if (p < 2) "keep" else "drop"))
      .toDF("p", "attr").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // column-stat-free path: the benefit heuristic otherwise sees 10
    // distinct keys on both sides and predicts zero pruning
    val statsKey = "spark.sql.optimizer.dynamicPartitionPruning.useStats"
    val prev = spark.conf.get(statsKey)
    spark.conf.set(statsKey, "false")
    try {
      val q = fact.join(dim.filter($"attr" === "keep"), "p")
      // the fact scan carries a dynamicpruning subquery on its partition col
      val planned = q.queryExecution.executedPlan.toString
      assert(planned.toLowerCase.contains("dynamicpruning"),
        s"no runtime partition pruning in plan:\n$planned")
      assert(q.count() == 2000)
    } finally spark.conf.set(statsKey, prev)
  }

  test("dynamic partition overwrite rewrites only the touched partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_dyn").toString
    Seq(("a", 1L), ("a", 2L), ("b", 10L), ("c", 100L)).toDF("p", "v")
      .write.partitionBy("p").mode("overwrite").parquet(dir)
    def filesOf(part: String): Set[String] = {
      val d = new java.io.File(s"$dir/p=$part")
      d.listFiles().filter(f => !f.getName.startsWith("_") &&
        !f.getName.startsWith(".")).map(_.getName).toSet
    }
    val bBefore = filesOf("b"); val cBefore = filesOf("c")
    // dynamic mode: overwriting with only p=a data must leave b and c alone
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq(("a", 99L)).toDF("p", "v")
        .write.partitionBy("p").mode("overwrite").parquet(dir)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    assert(filesOf("b") == bBefore && filesOf("c") == cBefore,
      "untouched partitions were rewritten")
    val got = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(got == Set((99L, "a"), (10L, "b"), (100L, "c")))
  }

  test("hilbert clustering skips 2-D box queries at least as well as z-order") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val pts = (1 to 20000).map(_ =>
      (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    val df = pts.toDF("x", "y")
    def writeSorted(c: org.apache.spark.sql.Column, name: String): String = {
      val d = java.nio.file.Files.createTempDirectory(name).toString
      df.withColumn("__k", c).repartitionByRange(16, col("__k"))
        .sortWithinPartitions("__k").drop("__k")
        .write.mode("overwrite").parquet(d)
      d
    }
    val dirZ = writeSorted(Layout.zValue2(col("x"), col("y")), "lay_z")
    val dirH = writeSorted(
      graft.functions.HilbertKit.hilbert2(col("x"), col("y"), 12), "lay_h")
    val dirU = {
      val d = java.nio.file.Files.createTempDirectory("lay_u").toString
      df.repartition(16).write.mode("overwrite").parquet(d)
      d
    }
    // 2-D box: how many files' (x, y) envelopes intersect it?
    def kept(dir: String): Long = Layout.statsManifest(spark, dir, Seq("x", "y"))
      .filter(col("max_x") >= 1000L && col("min_x") <= 1300L &&
        col("max_y") >= 2000L && col("min_y") <= 2300L)
      .count()
    val (kZ, kH, kU) = (kept(dirZ), kept(dirH), kept(dirU))
    // random layout: every file spans the whole plane -> nothing skipped
    assert(kU == 16L, s"unsorted kept $kU")
    // space-filling-curve layouts prune most files on BOTH dimensions
    assert(kZ < 16L && kH < 16L, s"z=$kZ h=$kH")
    // the continuous walk is at least as tight as z-order's seamed one
    assert(kH <= kZ, s"hilbert kept $kH > zorder $kZ")
  }

  test("bloomManifest: bitwise-OR build is partitioning-invariant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout_bloom2").toString
    (0L until 500L).map(k => (k, k % 3)).toDF("k", "g")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("file"), explode(col("bloom")).as(Seq("w", "bits")))
      .orderBy("file", "w")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    val a = canon(Layout.bloomManifest(spark, dir, "k", nBits = 4096))
    val b = canon(Layout.bloomManifest(
      spark.newSession(), dir, "k", nBits = 4096))
    assert(a == b && a.nonEmpty)
  }
}
