package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/**
 * Catalog/DDL addressing: the lake reached purely through SQL —
 * CREATE TABLE ... USING graft-lake (CTAS + external), INSERT
 * INTO/OVERWRITE, UPDATE, DELETE FROM, SELECT/spark.table — with every
 * DML riding the transaction log (history proves it) and SELECT planning
 * the stats-pruned FileSourceScan.
 */
class LakeSqlDdlSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_sql").toString + "/t"

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScan in plan"))

  test("CTAS + INSERT INTO + UPDATE + DELETE + SELECT, all through SQL") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_ddl_t")
    spark.range(0, 100)
      .select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("lake_ddl_src")

    spark.sql(
      s"""CREATE TABLE lake_ddl_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_ddl_src WHERE id < 50""".stripMargin)
    assert(spark.table("lake_ddl_t").count() == 50)

    spark.sql("INSERT INTO lake_ddl_t SELECT * FROM lake_ddl_src WHERE id >= 50")
    assert(spark.table("lake_ddl_t").count() == 100)

    spark.sql("UPDATE lake_ddl_t SET v = v + 1000 WHERE id < 10")
    assert(spark.sql(
      "SELECT sum(v) FROM lake_ddl_t WHERE id < 10").head().getLong(0) ==
      (0 until 10).map(i => i * 2 + 1000).sum)
    assert(spark.sql(
      "SELECT count(*) FROM lake_ddl_t WHERE v >= 1000").head().getLong(0) == 10)

    spark.sql("DELETE FROM lake_ddl_t WHERE id % 2 = 1")
    assert(spark.table("lake_ddl_t").count() == 50)
    assert(spark.sql(
      "SELECT count(*) FROM lake_ddl_t WHERE id % 2 = 1").head().getLong(0) == 0)

    // every DML above is a LOG commit (nothing bypassed the lake)
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "append", "update", "delete"))
    // and time travel still reaches the pre-DELETE state through the API
    assert(GraftLake.read(spark, dir, asOf = Some(2L)).count() == 100)

    spark.sql("DROP TABLE lake_ddl_t")
  }

  test("INSERT OVERWRITE replaces contents as one auditable commit") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_ow_t")
    spark.sql(
      s"""CREATE TABLE lake_ow_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(100)""".stripMargin)
    spark.sql(
      "INSERT OVERWRITE TABLE lake_ow_t SELECT id, id * 3 AS v FROM range(10)")
    val got = spark.table("lake_ow_t").select("id", "v").as[(Long, Long)]
      .collect().toSet
    assert(got == (0L until 10L).map(i => (i, i * 3)).toSet)
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "overwrite"))
    assert(GraftLake.read(spark, dir, asOf = Some(0L)).count() == 100,
      "overwritten snapshot stays time-travelable")
    spark.sql("DROP TABLE lake_ow_t")
  }

  test("SELECT plans the stats-pruned FileSourceScan; versionAsOf time-travels") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_scan_t")
    GraftLake.create(
      (0 until 1000).map(i => (i.toLong, i.toLong * 2)).toDF("id", "v")
        .repartitionByRange(8, col("id")), dir)
    spark.sql(
      s"CREATE TABLE lake_scan_t USING `graft-lake` OPTIONS (path '$dir')")

    val filtered = spark.sql(
      "SELECT id FROM lake_scan_t WHERE id BETWEEN 100 AND 149")
    assert(filtered.collect().map(_.getLong(0)).toSet == (100L to 149L).toSet)
    val nFiles = scanOf(filtered).metrics("numFiles").value
    assert(nFiles >= 1 && nFiles < 8,
      s"catalog SELECT must plan the pruned lake scan, opened $nFiles/8")

    GraftLake.delete(spark, dir, col("id") < 500L)
    // versionAsOf pins the pre-delete snapshot through the read API
    val pinned = spark.read.format("graft-lake")
      .option("path", dir).option("versionAsOf", "0").load()
    assert(pinned.count() == 1000)
    spark.sql("DROP TABLE lake_scan_t")
  }

  test("df.write.format(graft-lake): modes map onto the log; saveAsTable works") {
    val dir = tmp()
    val d1 = spark.range(0, 20).select(col("id"), lit("a").as("tag"))
    d1.write.format("graft-lake").option("path", dir).save() // ErrorIfExists -> create
    intercept[Exception] {
      d1.write.format("graft-lake").option("path", dir).save() // exists -> error
    }
    spark.range(20, 30).select(col("id"), lit("b").as("tag"))
      .write.format("graft-lake").mode("append").option("path", dir).save()
    assert(spark.read.format("graft-lake").load(dir).count() == 30)
    spark.range(0, 5).select(col("id"), lit("c").as("tag"))
      .write.format("graft-lake").mode("overwrite").option("path", dir).save()
    assert(spark.read.format("graft-lake").load(dir).count() == 5)
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "append", "overwrite"))

    // managed table via saveAsTable + INSERT through the catalog name
    spark.sql("DROP TABLE IF EXISTS lake_managed_t")
    spark.range(0, 7).select(col("id"), (col("id") * 10).as("v"))
      .write.format("graft-lake").saveAsTable("lake_managed_t")
    assert(spark.table("lake_managed_t").count() == 7)
    spark.sql("INSERT INTO lake_managed_t SELECT id, id * 10 AS v FROM range(7, 10)")
    assert(spark.table("lake_managed_t").count() == 10)
    spark.sql("DROP TABLE lake_managed_t")
  }
}
