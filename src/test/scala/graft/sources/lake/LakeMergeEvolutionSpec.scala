package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * MERGE WITH SCHEMA EVOLUTION: source-only columns evolve the target
 * (metadata-only add-column commits with fresh field ids), and star
 * actions populate them from the source — old rows null-fill. Without
 * the clause, Spark's own star expansion silently projects the source
 * down to the target schema (standard behavior, pinned here).
 */
class LakeMergeEvolutionSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_mev").toString + "/t"

  test("WITH SCHEMA EVOLUTION adds source-only columns and star actions " +
    "populate them; old rows null-fill") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_mev_t")
    spark.sql(
      s"""CREATE TABLE lake_mev_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(10)""".stripMargin)
    Seq((5L, 50L, "x"), (20L, 200L, "y"))
      .toDF("id", "v", "extra").createOrReplaceTempView("lake_mev_src")

    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO lake_mev_t t
        |USING lake_mev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    assert(spark.table("lake_mev_t").columns.toSeq == Seq("id", "v", "extra"))
    val got = spark.table("lake_mev_t")
      .select("id", "v", "extra").as[(Long, Long, Option[String])]
      .collect().toSet
    val expected =
      (0L until 10L).filter(_ != 5L).map(i => (i, i * 2, None)).toSet ++
        Set((5L, 50L, Some("x")), (20L, 200L, Some("y")))
    assert(got == expected)
    // evolution = one metadata commit per new column, then ONE merge
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "add-column", "merge-into"))
    // the evolved column got a fresh field id and stats-keys by it
    assert(GraftLake.snapshot(spark, dir).maxColId == 3)
    spark.sql("DROP TABLE lake_mev_t")
  }

  test("without the clause, star expansion projects the source down to " +
    "the target schema (no accidental evolution)") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_mev_plain")
    spark.sql(
      s"""CREATE TABLE lake_mev_plain USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(10)""".stripMargin)
    Seq((5L, 50L, "x")).toDF("id", "v", "extra")
      .createOrReplaceTempView("lake_mev_plain_src")
    spark.sql(
      """MERGE INTO lake_mev_plain t USING lake_mev_plain_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table("lake_mev_plain").columns.toSeq == Seq("id", "v"))
    assert(spark.sql("SELECT v FROM lake_mev_plain WHERE id = 5")
      .head().getLong(0) == 50L)
    spark.sql("DROP TABLE lake_mev_plain")
  }

  test("WITH SCHEMA EVOLUTION resolves EXPLICIT assignments referencing a " +
    "source-only column (not just star actions)") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_mev_exp")
    spark.sql(
      s"""CREATE TABLE lake_mev_exp USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(10)""".stripMargin)
    Seq((5L, 50L, "x"), (20L, 200L, "y"))
      .toDF("id", "v", "extra").createOrReplaceTempView("lake_mev_exp_src")
    // `extra` names a column the un-evolved target does not have — only
    // the AUTOMATIC_SCHEMA_EVOLUTION capability path can resolve it
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO lake_mev_exp t
        |USING lake_mev_exp_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET extra = s.extra
        |WHEN NOT MATCHED THEN INSERT (id, v, extra)
        |  VALUES (s.id, s.v, s.extra)""".stripMargin)
    assert(spark.table("lake_mev_exp").columns.toSeq == Seq("id", "v", "extra"))
    val got = spark.table("lake_mev_exp")
      .select("id", "v", "extra").as[(Long, Long, Option[String])]
      .collect().toSet
    val expected =
      (0L until 10L).filter(_ != 5L).map(i => (i, i * 2, None)).toSet ++
        Set((5L, 10L, Some("x")), (20L, 200L, Some("y"))) // update touched ONLY extra
    assert(got == expected)
    assert(GraftLake.history(dir).map(_._2) ==
      Seq("create", "add-column", "merge-into"))
    spark.sql("DROP TABLE lake_mev_exp")
  }

  test("API mergeInto(newColumns) evolves schema ATOMICALLY: one commit " +
    "carries both the new column and the rewrite") {
    val dir = tmp()
    spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
      .write.format("graft-lake").save(dir)
    val src = Seq((5L, 50L, "x"), (20L, 200L, "y")).toDF("id", "v", "extra")
    GraftLake.mergeInto(spark, dir, src,
      col("t.id") === col("s.id"),
      matched = Seq(GraftLake.MatchedUpdate(None,
        Seq("v" -> col("s.v"), "extra" -> col("s.extra")))),
      notMatched = Seq(GraftLake.NotMatchedInsert(None,
        Seq("id" -> col("s.id"), "v" -> col("s.v"), "extra" -> col("s.extra")))),
      newColumns = Seq(org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.StringType)))
    // ONE commit: no separate add-column — a failed merge leaves nothing
    assert(GraftLake.history(dir).map(_._2) == Seq("create", "merge-into"))
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(snap.maxColId == 3, "evolved column must take a fresh field id")
    val got = GraftLake.read(spark, dir)
      .select("id", "v", "extra").as[(Long, Long, Option[String])]
      .collect().toSet
    val expected =
      (0L until 10L).filter(_ != 5L).map(i => (i, i * 2, None)).toSet ++
        Set((5L, 50L, Some("x")), (20L, 200L, Some("y")))
    assert(got == expected)
  }

  test("evolution re-widens a retired name into an error, not dead data") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_mev_ret")
    spark.sql(
      s"""CREATE TABLE lake_mev_ret USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v, 'old' AS note FROM range(10)""".stripMargin)
    spark.sql("ALTER TABLE lake_mev_ret DROP COLUMN note")
    Seq((20L, 200L, "resurrect")).toDF("id", "v", "note")
      .createOrReplaceTempView("lake_mev_ret_src")
    val err = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO lake_mev_ret t
        |USING lake_mev_ret_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(err.getMessage.contains("retired"))
    spark.sql("DROP TABLE lake_mev_ret")
  }
}
