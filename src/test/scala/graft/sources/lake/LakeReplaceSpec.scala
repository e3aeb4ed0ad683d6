package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * CREATE OR REPLACE TABLE ... USING graft-lake (parser-intercepted into
 * ONE atomic `replace` commit — files + schema reset with fresh field
 * ids) and reader-option time travel
 * (`spark.read.option("versionAsOf"/"timestampAsOf", ...).table(...)`).
 */
class LakeReplaceSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_repl").toString + "/t"

  test("CREATE OR REPLACE TABLE: one atomic replace commit, schema reset, " +
    "old snapshot time-travelable under its own schema") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_repl_t")
    spark.sql(
      s"""CREATE TABLE lake_repl_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS old_v FROM range(100)""".stripMargin)
    spark.sql(
      s"""CREATE OR REPLACE TABLE lake_repl_t USING `graft-lake`
         |OPTIONS (path '$dir')
         |AS SELECT id, CAST(id AS STRING) AS tag FROM range(7)""".stripMargin)

    // exactly one replace commit; definition fully reset
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "replace"))
    assert(spark.table("lake_repl_t").columns.toSeq == Seq("id", "tag"))
    assert(spark.table("lake_repl_t").count() == 7)
    // DESCRIBE mirrors the new schema
    val cols = spark.sql("DESCRIBE TABLE lake_repl_t")
      .select("col_name").as[String].collect().toSet
    assert(cols.contains("tag") && !cols.contains("old_v"))
    // the pre-replace snapshot reads under its OWN schema
    val v0 = GraftLake.read(spark, dir, asOf = Some(0L))
    assert(v0.columns.toSeq == Seq("id", "old_v") && v0.count() == 100)
    // field ids were reset fresh (never reused): id column got a new id
    assert(GraftLake.snapshot(spark, dir).maxColId == 4)
    spark.sql("DROP TABLE lake_repl_t")
  }

  test("CREATE OR REPLACE creates when absent and derives the warehouse " +
    "path; plain REPLACE of a missing table errors") {
    spark.sql("DROP TABLE IF EXISTS lake_repl_new")
    // DROP TABLE keeps lake data (external semantics) and the derived
    // warehouse path is stable — wipe it so this run starts fresh
    val wh = new java.io.File(new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("lake_repl_new"))).toUri.getPath)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(wh)
    spark.sql(
      """CREATE OR REPLACE TABLE lake_repl_new USING `graft-lake`
        |AS SELECT id FROM range(5)""".stripMargin)
    assert(spark.table("lake_repl_new").count() == 5)
    assert(spark.sql("DESCRIBE HISTORY lake_repl_new").count() == 1)
    spark.sql("DROP TABLE lake_repl_new")

    val err = intercept[Exception](spark.sql(
      "REPLACE TABLE lake_repl_missing USING `graft-lake` AS SELECT 1 AS x"))
    assert(err.getMessage.contains("does not exist"))
  }

  test("DataFrameWriterV2: writeTo(...).create() / .createOrReplace() / " +
    ".replace() land as atomic lake commits (the v2 RTAS route)") {
    spark.sql("DROP TABLE IF EXISTS lake_wt2")
    val wh = new java.io.File(new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier("lake_wt2"))).toUri.getPath)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(wh)

    spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
      .writeTo("lake_wt2").using("graft-lake").create()
    assert(spark.table("lake_wt2").count() == 10)
    val dir = GraftLakeSource.lakeDirOf(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier("lake_wt2"))).get
    assert(GraftLake.history(dir).map(_._2) == Seq("create"))

    // createOrReplace on an existing table: ONE atomic replace commit,
    // schema reset — history is kept (the replaced snapshot time-travels)
    spark.range(0, 4).select(col("id"), lit("x").as("tag"))
      .writeTo("lake_wt2").using("graft-lake").createOrReplace()
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "replace"))
    assert(spark.table("lake_wt2").columns.toSeq == Seq("id", "tag"))
    assert(spark.table("lake_wt2").count() == 4)
    assert(GraftLake.read(spark, dir, asOf = Some(0L)).count() == 10)

    // .replace() (must exist), then .append() keeps riding the log
    spark.range(0, 6).select(col("id"), lit("y").as("tag"))
      .writeTo("lake_wt2").using("graft-lake").replace()
    spark.range(100, 102).select(col("id"), lit("z").as("tag"))
      .writeTo("lake_wt2").append()
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "replace", "replace", "append"))
    assert(spark.table("lake_wt2").count() == 8)

    // .create() on an existing table errors; DESCRIBE mirrors the schema
    val err = intercept[Exception] {
      spark.range(1).writeTo("lake_wt2").using("graft-lake").create()
    }
    assert(err.getMessage.toLowerCase.contains("exists"))
    spark.sql("DROP TABLE lake_wt2")
  }

  test("reader-option time travel on a catalog table resolves under the " +
    "PINNED snapshot's schema, so a later rename cannot misbind it") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_repl_tt")
    spark.sql(
      s"""CREATE TABLE lake_repl_tt USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 3 AS v FROM range(50)""".stripMargin)
    spark.sql("INSERT INTO lake_repl_tt SELECT id, id * 3 FROM range(50, 80)")

    assert(spark.read.option("versionAsOf", "0").table("lake_repl_tt")
      .count() == 50)
    assert(spark.read.table("lake_repl_tt").count() == 80)

    // the option rides Spark's TimeTravelSpec → the catalog's time-travel
    // loadTable → the v0 SNAPSHOT schema, so after a rename the pinned
    // read still resolves under the old name with the old values
    spark.sql("ALTER TABLE lake_repl_tt RENAME COLUMN v TO val")
    val pinned = spark.read.option("versionAsOf", "0").table("lake_repl_tt")
    assert(pinned.columns.toSeq == Seq("id", "v") && pinned.count() == 50)
    assert(pinned.select(sum("v")).head().getLong(0) ==
      (0L until 50L).map(_ * 3).sum)
    assert(spark.read.table("lake_repl_tt").columns.toSeq == Seq("id", "val"))
    spark.sql("DROP TABLE lake_repl_tt")
  }
}
