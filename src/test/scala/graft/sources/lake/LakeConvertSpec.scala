package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CONVERT TO LAKE: adopt an existing parquet directory as a lake table
 * IN PLACE — footer-only v0 commit, zero data rewrite (the CONVERT TO
 * DELTA migration shape). At 100 TB the cost is ∝ file count (one
 * footer read each, distributed), never data volume; the adopted files
 * keep serving reads from where they are, and every lake capability
 * (pruning, DML, OPTIMIZE, time travel, CDC, vacuum) applies from
 * version 0.
 */
class LakeConvertSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_convert").toString + "/t"

  private def writeParquet(dir: String): Unit =
    spark.range(0, 4000).select(col("id"), (col("id") % 97).as("v"),
      concat(lit("row-"), col("id")).as("s"))
      .repartitionByRange(8, col("id"))
      .write.parquet(dir)

  test("convert adopts the files in place: same bytes on disk, reads " +
    "equal the original, footer stats prune from v0") {
    val dir = tmp()
    writeParquet(dir)
    val before = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap

    GraftLake.convert(spark, dir)
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.version == 0L && snap.files.size == before.size)
    assert(snap.files.map(_.rows).sum == 4000L)
    // zero rewrite: the parquet set is byte-identical
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    assert(after == before, "convert must not touch the data files")

    assert(GraftLake.read(spark, dir).count() == 4000L)
    assert(GraftLake.read(spark, dir).select(sum("id")).as[Long].head() ==
      (0L until 4000L).sum)
    // footer min/max landed in the log: a range predicate file-prunes
    val (df, kept, total) = GraftLake.scanFiltered(spark, dir, col("id") < 500)
    assert(total == 8 && kept <= 2, s"range-written files must prune: $kept/$total")
    assert(df.count() == 500L)
  }

  test("full lifecycle on a converted table: evolving append, CoW delete " +
    "leaves out-of-range adopted files untouched, OPTIMIZE, time travel, " +
    "CDC, MoR delete") {
    val dir = tmp()
    writeParquet(dir)
    GraftLake.convert(spark, dir)
    val adopted = GraftLake.snapshot(spark, dir).files.map(_.path).toSet

    // evolving append: new column gets a fresh field id; the adopted
    // (id-less) columns keep resolving by name
    spark.range(10000, 10100).select(col("id"), (col("id") % 97).as("v"),
      concat(lit("row-"), col("id")).as("s"), lit(7L).as("extra"))
      .write.format("graft-lake").mode("append").save(dir)
    assert(GraftLake.read(spark, dir).count() == 4100L)
    assert(GraftLake.read(spark, dir).filter(col("extra").isNull).count() == 4000L)

    // CoW delete: stats-disjoint adopted files keep their physical place
    GraftLake.delete(spark, dir, col("id") < 500)
    val snap = GraftLake.snapshot(spark, dir)
    assert(GraftLake.read(spark, dir).count() == 3600L)
    val survivingAdopted = snap.files.map(_.path).toSet.intersect(adopted)
    assert(survivingAdopted.size >= 6,
      s"CoW must rewrite only overlapping adopted files: $survivingAdopted")

    // time travel to the adoption state
    assert(GraftLake.read(spark, dir, asOf = Some(0L)).count() == 4000L)
    // CDC from v0: net delta = +100 appended, -500 deleted
    val ch = GraftLake.changes(spark, dir, 0L, GraftLake.latestVersion(dir))
    assert(ch.filter(col("change_kind") === "insert").count() == 100L)
    assert(ch.filter(col("change_kind") === "delete").count() === 500L)

    // MoR delete + OPTIMIZE purge work over the adopted layout
    GraftLake.deleteMoR(spark, dir, col("id") === 600L)
    assert(GraftLake.read(spark, dir).count() == 3599L)
    GraftLake.optimize(spark, dir)
    assert(GraftLake.snapshot(spark, dir).files.forall(_.dv.isEmpty))
    assert(GraftLake.read(spark, dir).count() == 3599L)
  }

  test("hive-partitioned layouts are refused (partition values live in " +
    "the path); lake tables and empty dirs are refused") {
    val hive = tmp()
    spark.range(0, 100).select(col("id"), (col("id") % 3).as("p"))
      .write.partitionBy("p").parquet(hive)
    val e = intercept[IllegalArgumentException] { GraftLake.convert(spark, hive) }
    assert(e.getMessage.contains("hive-partitioned"))

    val lake = tmp()
    GraftLake.create(spark.range(0, 10).toDF("id"), lake)
    intercept[IllegalArgumentException] { GraftLake.convert(spark, lake) }

    val empty = tmp()
    new java.io.File(empty).mkdirs()
    intercept[IllegalArgumentException] { GraftLake.convert(spark, empty) }
  }

  test("vacuum reclaims TOMBSTONED adopted files (they live outside " +
    "data/) and never live ones") {
    val dir = tmp()
    writeParquet(dir)
    GraftLake.convert(spark, dir)
    val adopted = GraftLake.snapshot(spark, dir).files.map(_.path)
    // rewrite everything out of the adopted generation
    GraftLake.optimizeZOrder(spark, dir, "id", "v", 4)
    assert(GraftLake.read(spark, dir).count() == 4000L)
    // age the tombstones out with the injectable clock
    val n = GraftLake.vacuumAt(spark, dir, keepHistory = false,
      minAgeMillis = 0L, now = System.currentTimeMillis() + 1000L)
    assert(n >= adopted.size,
      s"tombstoned adopted files must reclaim: got $n of ${adopted.size}")
    adopted.foreach(rel => assert(!new java.io.File(dir, rel).exists(),
      s"tombstoned adopted file must be gone: $rel"))
    assert(GraftLake.read(spark, dir).count() == 4000L)
  }

  test("SQL end to end: CONVERT TO LAKE '<path>', then CREATE TABLE " +
    "registration adopts the log; DESCRIBE HISTORY shows the convert") {
    val dir = tmp()
    writeParquet(dir)
    spark.sql("DROP TABLE IF EXISTS converted_t")
    val v = spark.sql(s"CONVERT TO LAKE '$dir'").head().getLong(0)
    assert(v == 0L)
    spark.sql(s"CREATE TABLE converted_t USING `graft-lake` OPTIONS (path '$dir')")
    assert(spark.table("converted_t").count() == 4000L)
    spark.sql("INSERT INTO converted_t SELECT id, id % 97, 'x' FROM range(5)")
    assert(spark.table("converted_t").count() == 4005L)
    val ops = spark.sql(s"DESCRIBE HISTORY converted_t").collect()
      .map(_.getAs[String]("operation"))
    assert(ops.contains("convert"))
    spark.sql("DROP TABLE converted_t")
  }
}
