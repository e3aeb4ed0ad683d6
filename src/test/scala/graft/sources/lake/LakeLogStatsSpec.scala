package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Lake CBO statistics straight from the transaction log: the log already
 * records every file's exact row count and every deletion vector's
 * cardinality, so catalog reads plan with TRUE sizes and cardinalities
 * WITHOUT an ANALYZE TABLE pass — at 100 TB, an ANALYZE scan is exactly
 * the kind of full-table read a lakehouse exists to avoid. Two planner
 * inputs are asserted here:
 *
 *  - sizeInBytes is DV-adjusted (live-row fraction of file bytes), so a
 *    mostly-deleted merge-on-read dim broadcasts where raw parquet bytes
 *    — which include the dead rows — would force a sort-merge join;
 *  - rowCount is log-exact and reaches the CBO estimator
 *    (`optimizedPlan.stats.rowCount`) with no ANALYZE, the input join
 *    reordering and estimation build on.
 */
class LakeLogStatsSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_stats").toString + "/t"

  test("a mostly-deleted MoR dim broadcasts from DV-adjusted log stats " +
    "where the same bytes as stats-less parquet sort-merge") {
    val dir = tmp()
    // payload of incompressible hex so raw parquet bytes stay well over
    // the broadcast threshold we pick below
    val dim = spark.range(0, 20000).select(
      col("id").as("k"),
      concat(sha2(col("id").cast("string"), 256),
        sha2(col("id").cast("string"), 512)).as("payload"))
      .repartitionByRange(4, col("id"))

    val pqDir = tmp() + "_pq"
    dim.write.parquet(pqDir)

    spark.sql("DROP TABLE IF EXISTS lake_stats_dim")
    dim.createOrReplaceTempView("lake_stats_dim_src")
    spark.sql(
      s"""CREATE TABLE lake_stats_dim USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_stats_dim_src""".stripMargin)

    // MoR-delete 99.5% of the dim: bytes on disk unchanged, live rows 100
    GraftLake.deleteMoR(spark, dir, col("k") % 200 =!= 0)
    val idx = new LakeFileIndex(spark, dir)
    val rawBytes = GraftLake.snapshot(spark, dir).files.map(_.bytes).sum
    assert(idx.liveRows == 100L)
    assert(idx.sizeInBytes < rawBytes / 50,
      s"DV-adjusted size ${idx.sizeInBytes} should be ~0.5% of $rawBytes")

    val threshold = 128 * 1024
    assert(rawBytes > threshold * 2, s"test needs raw bytes > 2x threshold, got $rawBytes")
    assert(idx.sizeInBytes < threshold / 2,
      s"test needs adjusted bytes < threshold/2, got ${idx.sizeInBytes}")

    val fact = spark.range(0, 200000)
      .select(((col("id") % 100) * 200).as("k"), col("id").as("m"))
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)
    try {
      // lake dim: planner sees the DV-adjusted live bytes -> broadcast
      val lakeJoin = fact.join(spark.table("lake_stats_dim"), "k")
      val lakePlan = lakeJoin.queryExecution.executedPlan.toString
      assert(lakePlan.contains("BroadcastHashJoin"),
        s"lake dim must broadcast from log stats:\n$lakePlan")
      // every fact key is a surviving dim key -> all fact rows match
      assert(lakeJoin.count() == 200000L)

      // the SAME rows as stats-less parquet: sized by raw file bytes,
      // over the threshold -> sort-merge
      val pqJoin = fact.join(
        spark.read.parquet(pqDir).where(col("k") % 200 === 0), "k")
      val pqPlan = pqJoin.queryExecution.executedPlan.toString
      assert(pqPlan.contains("SortMergeJoin"),
        s"stats-less parquet copy must sort-merge:\n$pqPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE lake_stats_dim")
    }
  }

  test("log-exact rowCount reaches the CBO estimator with no ANALYZE") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_stats_rc")
    spark.range(0, 1234).select(col("id"), (col("id") * 3).as("v"))
      .createOrReplaceTempView("lake_stats_rc_src")
    spark.sql(
      s"""CREATE TABLE lake_stats_rc USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_stats_rc_src""".stripMargin)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table("lake_stats_rc").queryExecution.optimizedPlan.stats
      assert(est.rowCount.contains(BigInt(1234)),
        s"log rowCount must feed plan stats without ANALYZE: $est")

      // appends move the estimate with the log, still no ANALYZE
      spark.range(5000, 5100).select(col("id"), (col("id") * 3).as("v"))
        .write.format("graft-lake").mode("append").save(dir)
      spark.catalog.refreshTable("lake_stats_rc")
      val est2 = spark.table("lake_stats_rc").queryExecution.optimizedPlan.stats
      assert(est2.rowCount.contains(BigInt(1334)), s"stats must track the log: $est2")

      // column-level stats: footer min/max reach FilterEstimation, so a
      // range predicate's cardinality estimate shrinks BELOW the table's
      // row count from metadata alone (id spans [0,1233]∪[5000,5099];
      // id < 100 covers <10% of the range)
      val filtered = spark.table("lake_stats_rc").where("id < 100")
        .queryExecution.optimizedPlan.stats
      assert(filtered.rowCount.isDefined && filtered.rowCount.get < BigInt(300),
        s"range filter must estimate from footer min/max: $filtered")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE lake_stats_rc")
    }
  }

  test("clustered column gets an ANALYZE-free histogram from file " +
    "envelopes: skewed-range estimates follow row DENSITY, not linear " +
    "interpolation") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_stats_hist")
    // 90% of rows in id [0, 1000), 10% stretched over [1000, 100000) —
    // range-partitioned so file envelopes are disjoint (clustered)
    val dense = spark.range(0, 9000).select((col("id") % 1000).as("id"))
    val sparse = spark.range(0, 1000).select((col("id") * 99 + 1000).as("id"))
    dense.unionAll(sparse).repartitionByRange(8, col("id"))
      .createOrReplaceTempView("lake_stats_hist_src")
    spark.sql(
      s"""CREATE TABLE lake_stats_hist USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_stats_hist_src""".stripMargin)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      // true selectivity of id >= 1000 is 10%; linear interpolation over
      // [0, 99901] would claim ~99%. The histogram must keep the
      // estimate density-faithful (allow 3x slack for bin edges).
      val est = spark.table("lake_stats_hist").where("id >= 1000")
        .queryExecution.optimizedPlan.stats
      assert(est.rowCount.isDefined, s"no estimate: $est")
      assert(est.rowCount.get <= BigInt(3000),
        s"histogram must beat linear interpolation (true 1000): $est")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE lake_stats_hist")
    }
  }

  test("LakeFileIndex size is DV-adjusted per file, never below 1 byte " +
    "per live file, and exact again after the DVs purge") {
    val dir = tmp()
    GraftLake.create(
      spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
        .repartitionByRange(4, col("id")),
      dir, numFiles = 0)
    val full = new LakeFileIndex(spark, dir)
    val rawBytes = full.sizeInBytes
    assert(full.liveRows == 1000L)

    GraftLake.deleteMoR(spark, dir, col("id") % 2 === 0)
    val half = new LakeFileIndex(spark, dir)
    assert(half.liveRows == 500L)
    assert(half.sizeInBytes > rawBytes / 3 && half.sizeInBytes < 2 * rawBytes / 3,
      s"half-deleted table should size ~raw/2: ${half.sizeInBytes} vs $rawBytes")

    // OPTIMIZE purges the vectors into rewritten files: size is raw again
    GraftLake.optimize(spark, dir)
    val opt = new LakeFileIndex(spark, dir)
    assert(opt.liveRows == 500L)
    assert(opt.snap.files.forall(_.dv.isEmpty))
    assert(opt.sizeInBytes == opt.snap.files.map(_.bytes).sum)
  }

  test("split-scan branch column stats fold over the branch SUBSET: " +
    "nullCount never exceeds the branch's rowCount") {
    val dir = tmp()
    // nulls live ONLY in the file that will stay clean; the other file
    // gets a DV. Folding the FULL snapshot on the DV branch would then
    // report nullCount (600) > branch rowCount, and CBO's IsNotNull
    // selectivity (1 - nullCount/rowCount) would go negative.
    val withNulls = spark.range(0, 600).select(col("id"),
      lit(null).cast("long").as("v"))
    val noNulls = spark.range(1000, 1600).select(col("id"),
      (col("id") * 2).as("v"))
    GraftLake.create(withNulls.coalesce(1), dir, numFiles = 0)
    noNulls.coalesce(1).write.format("graft-lake").mode("append").save(dir)
    GraftLake.deleteMoR(spark, dir, col("id") >= 1200) // DV on the v-carrying file
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.files.count(_.dv.isDefined) == 1, s"need exactly one DV'd file")

    Seq(Some(true), Some(false)).foreach { sub =>
      val idx = new LakeFileIndex(spark, dir, None, Some(snap), sub)
      GraftLake.tableColStats(idx.subsetSnap).foreach { case (c, (_, _, _, nulls)) =>
        nulls.foreach(n => assert(n <= idx.liveRows,
          s"branch dvSubset=$sub column $c: nullCount $n > rowCount ${idx.liveRows}"))
      }
    }
    // and the end-to-end plan over the split scan still estimates sanely
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.sql("DROP TABLE IF EXISTS lake_stats_subset")
    try {
      spark.sql(s"CREATE TABLE lake_stats_subset USING `graft-lake` " +
        s"OPTIONS (path '$dir')")
      val est = spark.table("lake_stats_subset").where("v IS NOT NULL")
        .queryExecution.optimizedPlan.stats
      assert(est.rowCount.forall(rc => rc >= 0 && rc <= BigInt(800)),
        s"IS NOT NULL estimate must stay within [0, live rows]: $est")
      assert(spark.table("lake_stats_subset").where("v IS NOT NULL").count() == 200L)
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE IF EXISTS lake_stats_subset")
    }
  }

  test("a 90%-deleted file's stale range envelope cannot poison a " +
    "join-side choice: past 50% deleted, min/max detach and estimates " +
    "fall back to the DV-exact rowCount") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_stats_stale")
    spark.range(0, 10000).select(col("id"), (col("id") * 7).as("v"))
      .coalesce(1).createOrReplaceTempView("lake_stats_stale_src")
    spark.sql(
      s"""CREATE TABLE lake_stats_stale USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_stats_stale_src""".stripMargin)
    // MoR-delete 90%: live rows concentrate in [0, 1000) but the footer
    // envelope stays [0, 9999]. Uniformity over the stale envelope would
    // estimate `id < 1000` at ~10% of 1000 live = ~100 rows — a 10×
    // under-estimate, in the direction that wrongly broadcasts a big side.
    GraftLake.deleteMoR(spark, dir, col("id") >= 1000)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val all = spark.table("lake_stats_stale")
        .queryExecution.optimizedPlan.stats
      assert(all.rowCount.contains(BigInt(1000)),
        s"rowCount must stay DV-exact: $all")
      val est = spark.table("lake_stats_stale").where("id < 1000")
        .queryExecution.optimizedPlan.stats
      assert(est.rowCount.isDefined && est.rowCount.get >= BigInt(250),
        s"stale envelope must not collapse the estimate (true 1000): $est")

      // compaction purges the vectors; full column stats come back
      GraftLake.optimize(spark, dir)
      spark.catalog.refreshTable("lake_stats_stale")
      val fresh = spark.table("lake_stats_stale").where("id < 500")
        .queryExecution.optimizedPlan.stats
      assert(fresh.rowCount.isDefined && fresh.rowCount.get < BigInt(900),
        s"after OPTIMIZE the tight envelope must estimate again: $fresh")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE lake_stats_stale")
    }
  }

  test("DV'd file nullCount discounts by the vector cardinality: the " +
    "provable lower bound on live nulls, never above the live row count") {
    val dir = tmp()
    // one file: ids 0..999, v null for id < 600
    GraftLake.create(spark.range(0, 1000).select(col("id"),
      when(col("id") < 600, lit(null).cast("long"))
        .otherwise(col("id")).as("v")).coalesce(1), dir)
    GraftLake.deleteMoR(spark, dir, col("id") % 2 === 0) // 500 deleted
    val snap = GraftLake.snapshot(spark, dir)
    val live = snap.files.map(f => f.rows - f.dv.map(_.cardinality).getOrElse(0L)).sum
    assert(live == 500L)
    val (_, _, _, nulls) = GraftLake.tableColStats(snap)("v")
    // footer nulls = 600, DV cardinality = 500 -> lower bound 100; the
    // true live null count is 300 (odd ids < 600), and the bound must
    // never exceed the live row count
    assert(nulls.contains(100L), s"expected max(0, 600-500)=100, got $nulls")
    assert(nulls.get <= live)
  }

  test("integer ndv upper bound survives extreme ranges (BigInt, no Long " +
    "overflow collapsing the estimate to 1)") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_stats_ndv")
    // min near Long.MinValue, max near Long.MaxValue: (max - min + 1)
    // overflows a Long (wraps negative -> .max(1) -> ndv = 1, a severe
    // CBO underestimate); BigInt arithmetic keeps the bound, capped by
    // the non-null row count (= 2 here)
    spark.createDataFrame(Seq(
      Tuple1(Long.MinValue + 2), Tuple1(Long.MaxValue - 2)))
      .toDF("k").createOrReplaceTempView("lake_stats_ndv_src")
    spark.sql(
      s"""CREATE TABLE lake_stats_ndv USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_stats_ndv_src""".stripMargin)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val est = spark.table("lake_stats_ndv")
        .queryExecution.optimizedPlan.stats
      val ndvs = est.attributeStats.toSeq.collect {
        case (a, s) if a.name == "k" => s.distinctCount
      }.flatten
      assert(ndvs.nonEmpty, s"k must carry log-fed column stats: $est")
      assert(ndvs.forall(_ == BigInt(2)),
        s"extreme range must cap ndv at non-null rows (2), not wrap to 1: $ndvs")
    } finally {
      spark.conf.unset("spark.sql.cbo.enabled")
      spark.sql("DROP TABLE lake_stats_ndv")
    }
  }
}
