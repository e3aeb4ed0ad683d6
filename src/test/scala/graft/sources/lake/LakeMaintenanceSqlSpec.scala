package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * The maintenance SQL grammar ([[graft.spark.GraftSqlParser]]): VACUUM,
 * OPTIMIZE [ZORDER BY], RESTORE ... VERSION AS OF, DESCRIBE HISTORY —
 * Delta's statement family, parsed by the injected delegating parser and
 * executed as lake commits. Standard SQL must keep parsing untouched.
 */
class LakeMaintenanceSqlSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_maint").toString + "/t"

  test("OPTIMIZE bin-packs, RESTORE rolls back, DESCRIBE HISTORY lists, " +
    "VACUUM reclaims — all through SQL, on a catalog table") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_maint_t")
    spark.range(0, 400).select(col("id"), (col("id") * 2).as("v"))
      .repartition(8) // 8 small files → OPTIMIZE has work
      .createOrReplaceTempView("lake_maint_src")
    spark.sql(
      s"""CREATE TABLE lake_maint_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_maint_src""".stripMargin)

    // OPTIMIZE: pure layout change, same rows, fewer files
    val v1 = spark.sql("OPTIMIZE lake_maint_t").head().getLong(0)
    assert(v1 == 1L)
    assert(spark.table("lake_maint_t").count() == 400)
    assert(GraftLake.snapshot(spark, dir).files.size < 8)

    // DELETE then RESTORE: the table reads as before the delete
    spark.sql("DELETE FROM lake_maint_t WHERE id < 100")
    assert(spark.table("lake_maint_t").count() == 300)
    val v3 = spark.sql("RESTORE TABLE lake_maint_t TO VERSION AS OF 1")
      .head().getLong(0)
    assert(v3 == 3L)
    assert(spark.table("lake_maint_t").count() == 400)

    // DESCRIBE HISTORY: newest first, full op trail
    val hist = spark.sql("DESCRIBE HISTORY lake_maint_t")
      .select("version", "operation").as[(Long, String)].collect().toSeq
    assert(hist == Seq((3L, "restore"), (2L, "delete"), (1L, "optimize"),
      (0L, "create")))

    // VACUUM RETAIN 0 HOURS: the optimize-replaced originals (referenced
    // only by v0) are reclaimable; the live snapshot is untouched
    val deleted = spark.sql("VACUUM lake_maint_t RETAIN 0 HOURS")
      .head().getInt(0)
    assert(deleted >= 8, s"expected the 8 packed-away originals, got $deleted")
    assert(spark.table("lake_maint_t").count() == 400)

    spark.sql("DROP TABLE lake_maint_t")
  }

  test("OPTIMIZE ZORDER BY through SQL clusters on the Morton interleave " +
    "and a quoted-path target works") {
    val dir = tmp()
    spark.range(0, 4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"),
        col("id").as("payload"))
      .repartition(4)
      .write.format("graft-lake").save(dir)

    val v = spark.sql(s"OPTIMIZE '$dir' ZORDER BY (x, y) INTO 16 FILES")
      .head().getLong(0)
    assert(v == 1L)
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.files.size == 16)
    assert(spark.read.format("graft-lake").load(dir).count() == 4096)

    // clustering proof: a box predicate stats-prunes to a strict subset
    val box = col("x") >= 0L && col("x") <= 7L && col("y") >= 0L && col("y") <= 7L
    val (_, scanned, total) = GraftLake.scanFiltered(spark, dir, box)
    assert(scanned < total, s"z-order box scan must prune, got $scanned/$total")
  }

  test("OPTIMIZE ... WHERE compacts only stat-overlapping files; " +
    "DESCRIBE DETAIL reports log-exact facts incl. the DV census") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lake_optw").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS lake_maint_w")
    spark.range(0, 800).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(8, col("id"))
      .createOrReplaceTempView("lake_maint_w_src")
    spark.sql(
      s"""CREATE TABLE lake_maint_w USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_maint_w_src""".stripMargin)
    assert(GraftLake.snapshot(spark, dir).files.size == 8)

    // targeted compaction: only the files overlapping id < 200 (2 of 8
    // range files) may rewrite — the other 6 AddFiles stay IDENTICAL
    val before = GraftLake.snapshot(spark, dir).files.map(_.path).toSet
    spark.sql("OPTIMIZE lake_maint_w WHERE id < 200")
    val after = GraftLake.snapshot(spark, dir)
    val untouched = after.files.map(_.path).toSet.intersect(before)
    assert(untouched.size == 6,
      s"exactly the 2 overlapping files compact, ${8 - untouched.size} rewrote")
    assert(spark.table("lake_maint_w").count() == 800, "layout-only")

    // DESCRIBE DETAIL: version/files/rows from the log alone; a MoR
    // delete shows up in the vector census and the DV-exact row count
    GraftLake.deleteMoR(spark, dir, col("id") % 100 === 7)
    val d = spark.sql("DESCRIBE DETAIL lake_maint_w").head()
    assert(d.getString(0) == "graft-lake")
    assert(d.getLong(2) == 2L, "version: create + optimize + delete-mor")
    assert(d.getLong(3) == after.files.size.toLong, "num_files unchanged by MoR")
    assert(d.getLong(5) == 792L, "num_rows must be DV-exact")
    assert(d.getLong(6) >= 1L && d.getLong(7) == 8L,
      s"DV census wrong: ${d.getLong(6)} vectors / ${d.getLong(7)} rows")
    spark.sql("DROP TABLE lake_maint_w")
  }

  test("standard SQL statements pass through the delegating parser untouched") {
    assert(spark.sql("SELECT 1 + 1 AS two").head().getInt(0) == 2)
    assert(spark.range(3).count() == 3)
    // a parse ERROR still surfaces as one
    intercept[Exception](spark.sql("SELEKT banana"))
  }

  test("OPTIMIZE ... WHERE on a CLUSTERED table keeps the compacted " +
    "slice z-aligned (persisted bounds, no quantile pass) and tags it " +
    "as the current generation") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_opt_where_z").toString + "/t"
    GraftLake.create(spark.range(0, 8192).select((col("id") % 64).as("x"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .repartition(4), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    GraftLake.optimize(spark, dir) // cluster + persist bounds
    // many tiny appends inside one x-slice -> scoped compaction target
    (1 to 6).foreach { i =>
      spark.range(i * 1000, i * 1000 + 64).select(lit(3L).as("x"),
        (col("id") % 64).as("y"), col("id").as("p")).coalesce(1)
        .write.format("graft-lake").mode("append").save(dir)
    }
    val before = GraftLake.snapshot(spark, dir)
    val beforeUncl = GraftLake.unclusteredFiles(before).map(_.path).toSet
    assert(beforeUncl.size >= 6)
    GraftLake.optimize(spark, dir, where = Some(col("x") === 3L),
      smallBytes = 1L << 20)
    val after = GraftLake.snapshot(spark, dir)
    assert(after.files.size < before.files.size, "the slice must compact")
    // the compacted outputs count as CLUSTERED (tagged with the current
    // generation): staleness shrinks instead of staying flat
    val afterUncl = GraftLake.unclusteredFiles(after).map(_.path).toSet
    assert(afterUncl.size < beforeUncl.size,
      s"z-aligned scoped compaction must reduce staleness: " +
        s"${afterUncl.size} vs ${beforeUncl.size}")
    assert(GraftLake.read(spark, dir).count() == 8192 + 6 * 64)
  }

  test("RESTORE ... TIMESTAMP AS OF resolves the instant to the latest " +
    "commit at or before it, then restores") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_restore_ts").toString + "/t"
    GraftLake.create(spark.range(0, 100).toDF("id"), dir)       // v0
    Thread.sleep(5)
    val tsAfterV0 = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(5)
    spark.range(100, 150).toDF("id")
      .write.format("graft-lake").mode("append").save(dir)      // v1
    val v = spark.sql(s"RESTORE '$dir' TO TIMESTAMP AS OF '$tsAfterV0'")
      .head().getLong(0)
    assert(v == 2L, s"restore must commit a new version, got $v")
    assert(GraftLake.read(spark, dir).count() == 100L,
      "the instant between v0 and v1 must resolve to v0")
  }

  test("VACUUM ... DRY RUN lists the would-be-deleted paths and touches " +
    "nothing; the real VACUUM then deletes exactly that list") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_vacuum_dry").toString + "/t"
    GraftLake.create(spark.range(0, 400).select(col("id"),
      (col("id") * 2).as("v")).repartitionByRange(4, col("id")), dir)
    GraftLake.delete(spark, dir, col("id") < 200) // tombstones ~2 files
    val planned = spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS DRY RUN")
      .collect().map(_.getString(0)).toSet
    assert(planned.nonEmpty, "CoW victims must be reclaimable at RETAIN 0")
    planned.foreach(rel => assert(new java.io.File(dir, rel).exists(),
      s"DRY RUN must not delete: $rel"))
    assert(GraftLake.read(spark, dir).count() == 200L)

    val n = spark.sql(s"VACUUM '$dir' RETAIN 0 HOURS").head().getInt(0)
    assert(n == planned.size, s"real vacuum must delete the dry-run list: " +
      s"$n vs ${planned.size}")
    planned.foreach(rel => assert(!new java.io.File(dir, rel).exists()))
    assert(GraftLake.read(spark, dir).count() == 200L)
  }
}
