package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/**
 * The DSv2 catalog face ([[GraftLakeCatalog]]): SQL ALTER TABLE
 * (rename/drop/add column as field-id metadata commits), SQL time travel
 * (VERSION AS OF / TIMESTAMP AS OF), and SQL MERGE INTO (full clause
 * set onto [[GraftLake.mergeInto]]'s copy-on-write commit) — none of
 * which Spark allows for v1 session-catalog tables. Reads must keep
 * planning the stats-pruned v1 FileSourceScan (the catalog's v2 table is
 * capability-free; LakeDmlRule swaps it for the LakeFileIndex relation).
 */
class LakeCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_cat").toString + "/t"

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case s: FileSourceScanExec => s }
      .getOrElse(fail("no FileSourceScan in plan"))

  test("ALTER TABLE RENAME/DROP/ADD COLUMN through SQL; old files serve " +
    "the renamed column and filters on it still prune") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_alter")
    spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("bucket"), (col("id") * 3).as("v"))
      .repartitionByRange(8, col("id"))
      .createOrReplaceTempView("lake_cat_alter_src")
    spark.sql(
      s"""CREATE TABLE lake_cat_alter USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_cat_alter_src""".stripMargin)

    spark.sql("ALTER TABLE lake_cat_alter RENAME COLUMN id TO row_id")
    spark.sql("ALTER TABLE lake_cat_alter DROP COLUMN bucket")
    spark.sql("ALTER TABLE lake_cat_alter ADD COLUMN note STRING")

    // DDL landed as pure metadata commits on the log
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "rename-column", "drop-column", "add-column"))

    // schema through SQL reflects all three changes; old files still
    // serve the renamed column (field-id resolution), dropped column is
    // gone, added column null-fills
    assert(spark.table("lake_cat_alter").columns.toSeq ==
      Seq("row_id", "v", "note"))
    val got = spark.sql(
      "SELECT row_id, v, note FROM lake_cat_alter WHERE row_id < 5 ORDER BY row_id")
      .as[(Long, Long, Option[String])].collect()
    assert(got.toSeq == (0L until 5L).map(i => (i, i * 3, None)))

    // a tight range on the RENAMED key still stats-prunes to a strict
    // file subset (stats are field-id keyed)
    val pruned = spark.sql(
      "SELECT row_id FROM lake_cat_alter WHERE row_id BETWEEN 100 AND 150")
    pruned.collect()
    val scan = scanOf(pruned)
    val files = scan.metrics("numFiles").value
    assert(files >= 1 && files < 8, s"expected a strict file subset, got $files/8")

    // the metastore schema was mirrored (DESCRIBE is truthful)
    val described = spark.sql("DESCRIBE TABLE lake_cat_alter")
      .select("col_name").as[String].collect().toSet
    assert(described.contains("row_id") && described.contains("note") &&
      !described.contains("bucket"))

    // re-adding a retired name is rejected (name-keyed parquet pushdown
    // would bind filters on it to the dropped column's dead data)
    val err = intercept[Exception](
      spark.sql("ALTER TABLE lake_cat_alter ADD COLUMN bucket STRING"))
    assert(err.getMessage.contains("retired"))

    spark.sql("DROP TABLE lake_cat_alter")
  }

  test("ALTER TABLE SET TBLPROPERTIES('checkpointEvery'): a folded table " +
    "property — checkpoints start/stop mid-life, reads fold through them") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_prop")
    spark.sql(
      s"""CREATE TABLE lake_cat_prop USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(10)""".stripMargin)
    def ckpts() = Option(new java.io.File(s"$dir/_log")
      .listFiles((_, n) => n.startsWith("ckpt-"))).map(_.length).getOrElse(0)

    // CTAS default: no cadence → no checkpoints
    spark.sql("INSERT INTO lake_cat_prop SELECT id, id * 2 FROM range(10, 20)")
    assert(ckpts() == 0)

    spark.sql(
      "ALTER TABLE lake_cat_prop SET TBLPROPERTIES ('checkpointEvery'='2')")
    spark.sql("INSERT INTO lake_cat_prop SELECT id, id * 2 FROM range(20, 30)")
    spark.sql("INSERT INTO lake_cat_prop SELECT id, id * 2 FROM range(30, 40)")
    assert(ckpts() == 2,
      "v2 (the set-properties commit itself) and v4 must have checkpointed")
    // the fold through the checkpoint serves correct data and cadence
    assert(spark.table("lake_cat_prop").count() == 40)
    assert(GraftLake.snapshot(spark, dir).ckptEvery == 2)

    spark.sql(
      "ALTER TABLE lake_cat_prop UNSET TBLPROPERTIES ('checkpointEvery')")
    val before = ckpts()
    spark.sql("INSERT INTO lake_cat_prop SELECT id, id * 2 FROM range(40, 50)")
    spark.sql("INSERT INTO lake_cat_prop SELECT id, id * 2 FROM range(50, 60)")
    assert(ckpts() == before, "cadence 0 must stop new checkpoints")
    assert(spark.table("lake_cat_prop").count() == 60)
    spark.sql("DROP TABLE lake_cat_prop")
  }

  test("VERSION AS OF on a NON-lake table delegates unparsed (no " +
    "NumberFormatException from the lake catalog)") {
    spark.sql("DROP TABLE IF EXISTS lake_cat_plainpq")
    spark.range(0, 5).write.saveAsTable("lake_cat_plainpq")
    // a non-numeric version on a plain parquet table must surface the
    // DELEGATE's unsupported-time-travel error, not die in version.toLong
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM lake_cat_plainpq VERSION AS OF 'abc'").collect()
    }
    assert(!err.isInstanceOf[NumberFormatException] &&
      !err.getMessage.contains("For input string"),
      s"lake catalog must not parse a non-lake table's version: $err")
    // and a lake table with a junk version gets the lake's own message
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_vparse")
    spark.sql(
      s"""CREATE TABLE lake_cat_vparse USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id FROM range(5)""".stripMargin)
    val err2 = intercept[Exception] {
      spark.sql("SELECT * FROM lake_cat_vparse VERSION AS OF 'abc'").collect()
    }
    assert(err2.getMessage.contains("numeric version"))
    spark.sql("DROP TABLE lake_cat_plainpq")
    spark.sql("DROP TABLE lake_cat_vparse")
  }

  test("SQL time travel: VERSION AS OF and TIMESTAMP AS OF") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_tt")
    spark.sql(
      s"""CREATE TABLE lake_cat_tt USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(100)""".stripMargin)
    val t0 = System.currentTimeMillis()
    Thread.sleep(5) // strictly between v0 and v1 commit timestamps
    spark.sql("INSERT INTO lake_cat_tt SELECT id, id * 2 AS v FROM range(100, 150)")
    spark.sql("DELETE FROM lake_cat_tt WHERE id < 10")

    assert(spark.table("lake_cat_tt").count() == 140)
    assert(spark.sql("SELECT count(*) FROM lake_cat_tt VERSION AS OF 0")
      .head().getLong(0) == 100)
    assert(spark.sql("SELECT count(*) FROM lake_cat_tt VERSION AS OF 1")
      .head().getLong(0) == 150)
    // timestamp between v0 and v1 resolves to v0
    val ts = new java.sql.Timestamp(t0).toString
    assert(spark.sql(
      s"SELECT count(*) FROM lake_cat_tt TIMESTAMP AS OF '$ts'")
      .head().getLong(0) == 100)
    spark.sql("DROP TABLE lake_cat_tt")
  }

  test("MERGE INTO: conditional matched update, matched delete, " +
    "not-matched insert — one log commit, values exact") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_m1")
    spark.sql(
      s"""CREATE TABLE lake_cat_m1 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, CAST(id * 10 AS BIGINT) AS v,
         |   CAST('keep' AS STRING) AS tag
         |FROM range(10)""".stripMargin)
    // source: ids 5..14 — 5..9 matched, 10..14 new; flag drives clauses
    spark.range(5, 15)
      .select(col("id"), (col("id") * 100).as("sv"),
        (col("id") % 2 === 0).as("even"))
      .createOrReplaceTempView("lake_cat_m1_src")

    spark.sql(
      """MERGE INTO lake_cat_m1 t USING lake_cat_m1_src s
        |ON t.id = s.id
        |WHEN MATCHED AND s.even THEN UPDATE SET v = s.sv, tag = 'upd'
        |WHEN MATCHED THEN DELETE
        |WHEN NOT MATCHED AND s.sv < 1400 THEN INSERT (id, v, tag)
        |  VALUES (s.id, s.sv, 'ins')""".stripMargin)

    val got = spark.table("lake_cat_m1")
      .select("id", "v", "tag").as[(Long, Long, String)]
      .collect().toSet
    val expected =
      (0L until 5L).map(i => (i, i * 10, "keep")).toSet ++ // untouched
        Set((6L, 600L, "upd"), (8L, 800L, "upd")) ++ // matched, even → update
        // 5,7,9 matched, odd → deleted
        Set((10L, 1000L, "ins"), (12L, 1200L, "ins"), (13L, 1300L, "ins"),
          (11L, 1100L, "ins")) // 14 fails the insert condition (1400)
    assert(got == expected)
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "merge-into"))
    spark.sql("DROP TABLE lake_cat_m1")
  }

  test("MERGE INTO: UPDATE SET * / INSERT * star forms and " +
    "NOT MATCHED BY SOURCE") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_m2")
    spark.sql(
      s"""CREATE TABLE lake_cat_m2 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, CAST(id AS BIGINT) AS v FROM range(6)""".stripMargin)
    spark.range(3, 9).select(col("id"), (col("id") * 1000).as("v"))
      .createOrReplaceTempView("lake_cat_m2_src")

    spark.sql(
      """MERGE INTO lake_cat_m2 t USING lake_cat_m2_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *
        |WHEN NOT MATCHED BY SOURCE AND t.id = 0 THEN DELETE
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)

    val got = spark.table("lake_cat_m2").select("id", "v")
      .as[(Long, Long)].collect().toSet
    val expected =
      Set((1L, -1L), (2L, -1L)) ++ // not matched by source (0 deleted)
        (3L until 9L).map(i => (i, i * 1000)).toSet // updated ∪ inserted
    assert(got == expected)
    spark.sql("DROP TABLE lake_cat_m2")
  }

  test("non-equi MERGE: range-condition tagging (no equi conjunct → " +
    "exact semi-join victims, windowed guard kept)") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_rng")
    spark.sql(
      s"""CREATE TABLE lake_cat_rng USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, CAST('none' AS STRING) AS tag FROM range(100)""".stripMargin)
    Seq((10L, 20L, "a"), (50L, 55L, "b")).toDF("lo", "hi", "tag")
      .createOrReplaceTempView("lake_cat_rng_src")
    spark.sql(
      """MERGE INTO lake_cat_rng t USING lake_cat_rng_src s
        |ON t.id >= s.lo AND t.id < s.hi
        |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin)
    val got = spark.table("lake_cat_rng")
      .groupBy("tag").count().as[(String, Long)].collect().toMap
    assert(got == Map("none" -> 85L, "a" -> 10L, "b" -> 5L))

    // overlapping ranges make a target row match two source rows → the
    // ambiguity guard (kept: no equi conjunct) must reject, commit nothing
    Seq((0L, 5L, "x"), (3L, 8L, "y")).toDF("lo", "hi", "tag")
      .createOrReplaceTempView("lake_cat_rng_bad")
    intercept[Exception](spark.sql(
      """MERGE INTO lake_cat_rng t USING lake_cat_rng_bad s
        |ON t.id >= s.lo AND t.id < s.hi
        |WHEN MATCHED THEN UPDATE SET tag = s.tag""".stripMargin))
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "merge-into"))
    spark.sql("DROP TABLE lake_cat_rng")
  }

  test("MERGE INTO rejects a target row matched by multiple source rows") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_m3")
    spark.sql(
      s"""CREATE TABLE lake_cat_m3 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, CAST(0 AS BIGINT) AS v FROM range(4)""".stripMargin)
    Seq((2L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "sv")
      .createOrReplaceTempView("lake_cat_m3_src")
    val err = intercept[Exception](spark.sql(
      """MERGE INTO lake_cat_m3 t USING lake_cat_m3_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.sv""".stripMargin))
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(err).exists(_.contains("matched multiple source rows")))
    // and the failed merge committed nothing
    assert(GraftLake.history(dir).map(_._2) == Seq("create"))
    spark.sql("DROP TABLE lake_cat_m3")
  }

  test("DataFrameWriterV2: writeTo(...).append() / .overwrite(true) land " +
    "as log commits") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_w2")
    spark.sql(
      s"""CREATE TABLE lake_cat_w2 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(10)""".stripMargin)
    spark.range(10, 20).select(col("id"), (col("id") * 2).as("v"))
      .writeTo("lake_cat_w2").append()
    assert(spark.table("lake_cat_w2").count() == 20)
    spark.range(5).select(col("id"), (col("id") * 7).as("v"))
      .writeTo("lake_cat_w2").overwrite(lit(true))
    assert(spark.table("lake_cat_w2").select(sum("v")).head().getLong(0) ==
      (0 until 5).map(_ * 7).sum)
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "append", "overwrite"))
    spark.sql("DROP TABLE lake_cat_w2")
  }

  test("MERGE INTO with ANOTHER lake catalog table as source") {
    val dirT = tmp(); val dirS = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_mt")
    spark.sql("DROP TABLE IF EXISTS lake_cat_ms")
    spark.sql(
      s"""CREATE TABLE lake_cat_mt USING `graft-lake` OPTIONS (path '$dirT')
         |AS SELECT id, CAST(0 AS BIGINT) AS v FROM range(10)""".stripMargin)
    spark.sql(
      s"""CREATE TABLE lake_cat_ms USING `graft-lake` OPTIONS (path '$dirS')
         |AS SELECT id, CAST(id * 5 AS BIGINT) AS v FROM range(5, 15)""".stripMargin)
    spark.sql(
      """MERGE INTO lake_cat_mt t USING lake_cat_ms s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.table("lake_cat_mt").select("id", "v")
      .as[(Long, Long)].collect().toSet
    assert(got == ((0L until 5L).map(i => (i, 0L)) ++
      (5L until 15L).map(i => (i, i * 5))).toSet)
    spark.sql("DROP TABLE lake_cat_mt"); spark.sql("DROP TABLE lake_cat_ms")
  }

  test("spark.readStream.table on a lake catalog table rides the " +
    "version-offset changelog source") {
    val base = java.nio.file.Files.createTempDirectory("graft_lake_rst")
    val dir = s"$base/t"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    spark.sql("DROP TABLE IF EXISTS lake_cat_stream")
    spark.sql(
      s"""CREATE TABLE lake_cat_stream USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(100)""".stripMargin)
    def drain(): Unit = {
      val q = spark.readStream.table("lake_cat_stream")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain() // initial snapshot
    assert(spark.read.parquet(out).count() == 100)
    spark.sql("INSERT INTO lake_cat_stream SELECT id, id * 2 FROM range(100, 150)")
    drain() // resume: exactly the appended slice
    assert(spark.read.parquet(out).count() == 150)
    assert(spark.read.parquet(out).select(sum("v")).head().getLong(0) ==
      (0L until 150L).map(_ * 2).sum)
    spark.sql("DROP TABLE lake_cat_stream")
  }

  test("insert-only MERGE with no matches commits and only touched files " +
    "rewrite on a matched merge") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cat_m4")
    spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(8, col("id"))
      .createOrReplaceTempView("lake_cat_m4_src")
    spark.sql(
      s"""CREATE TABLE lake_cat_m4 USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_cat_m4_src""".stripMargin)
    val filesBefore = GraftLake.read(spark, dir).inputFiles.length

    // insert-only: no target row matches → zero victims, one commit
    spark.range(5000, 5010).select(col("id"), lit(0L).as("v"))
      .createOrReplaceTempView("lake_cat_m4_new")
    spark.sql(
      """MERGE INTO lake_cat_m4 t USING lake_cat_m4_new s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("lake_cat_m4").count() == 1010)

    // a narrow matched merge must NOT rewrite all 8 original files: the
    // stats prune + touched-file semi-join keep non-overlapping files
    Seq((3L, 9999L)).toDF("id", "v").createOrReplaceTempView("lake_cat_m4_upd")
    spark.sql(
      """MERGE INTO lake_cat_m4 t USING lake_cat_m4_upd s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    assert(spark.sql("SELECT v FROM lake_cat_m4 WHERE id = 3")
      .head().getLong(0) == 9999L)
    val hist = GraftLake.history(dir) // (version, op, ts, adds, removes)
    assert(hist.map(_._2) == Seq("create", "merge-into", "merge-into"))
    assert(hist.head._5 == 0 && hist(1)._5 == 0,
      "insert-only merge must tombstone nothing")
    assert(filesBefore >= 8 && hist(2)._5 == 1,
      s"narrow matched merge must rewrite exactly the one touched file of " +
        s"$filesBefore, got ${hist(2)._5}")
    spark.sql("DROP TABLE lake_cat_m4")
  }
}
