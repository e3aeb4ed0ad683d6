package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Clause-shape fast paths of [[GraftLake.mergeInto]] under MULTIPLE source
 * matches — the silent-duplication hazard: a full-outer rewrite emits one
 * keep-row per join match, so a target row matched by two source rows
 * would be DUPLICATED by any merge that rewrites matched files without a
 * matched clause. Delta's contract (pinned here): duplicate matches are
 * legal exactly when no matched clause exists — an insert-only merge must
 * not rewrite matched files at all (adds-only commit), and a
 * not-matched-by-source-only merge must keep each matched row once.
 */
class LakeMergeShapeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_lake_mshape").toString + "/t"

  test("insert-only MERGE with a multiply-matched target row neither " +
    "duplicates it nor rewrites its file") {
    val dir = tmp()
    spark.range(0, 100).select(col("id"), (col("id") * 2).as("v"))
      .repartitionByRange(4, col("id"))
      .write.format("graft-lake").save(dir)
    // id=7 matches TWICE; ids 200/201 are new; a second row for 200 is a
    // duplicate source insert (legal: two distinct unmatched rows insert)
    val src = Seq((7L, 70L), (7L, 71L), (200L, 400L), (201L, 402L))
      .toDF("id", "v")
    GraftLake.mergeInto(spark, dir, src,
      col("t.id") === col("s.id"),
      matched = Nil,
      notMatched = Seq(GraftLake.NotMatchedInsert(None,
        Seq("id" -> col("s.id"), "v" -> col("s.v")))))
    val got = GraftLake.read(spark, dir).as[(Long, Long)].collect().toSet
    val expected = (0L until 100L).map(i => (i, i * 2)).toSet ++
      Set((200L, 400L), (201L, 402L))
    assert(got == expected, "matched row must survive exactly once")
    assert(GraftLake.read(spark, dir).count() == 102)
    // adds-only commit: no victim files tombstoned
    val hist = GraftLake.history(dir)
    assert(hist.map(_._2) == Seq("create", "merge-into"))
    assert(hist.last._5 == 0, "insert-only merge must tombstone nothing")
  }

  test("SQL insert-only MERGE with duplicate source matches is legal and " +
    "does not duplicate the matched target row") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_mshape_io")
    spark.sql(
      s"""CREATE TABLE lake_mshape_io USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT id, id * 2 AS v FROM range(50)""".stripMargin)
    Seq((3L, 1L), (3L, 2L), (90L, 9L)).toDF("id", "v")
      .createOrReplaceTempView("lake_mshape_io_src")
    spark.sql(
      """MERGE INTO lake_mshape_io t USING lake_mshape_io_src s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("lake_mshape_io").count() == 51)
    assert(spark.sql("SELECT count(*) FROM lake_mshape_io WHERE id = 3")
      .head().getLong(0) == 1L, "multiply-matched target row must stay single")
    assert(spark.sql("SELECT v FROM lake_mshape_io WHERE id = 90")
      .head().getLong(0) == 9L)
    spark.sql("DROP TABLE lake_mshape_io")
  }

  test("not-matched-by-source-only MERGE keeps a multiply-matched target " +
    "row once and applies the clause to unmatched rows") {
    val dir = tmp()
    spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
      .write.format("graft-lake").save(dir)
    // ids 4 and 5 are "still alive" per the source; 4 matches twice
    val src = Seq((4L, 0L), (4L, 1L), (5L, 2L)).toDF("id", "sv")
    GraftLake.mergeInto(spark, dir, src,
      col("t.id") === col("s.id"),
      matched = Nil,
      notMatched = Nil,
      notMatchedBySource = Seq(
        // unmatched evens get flagged, unmatched odds get deleted
        GraftLake.MatchedUpdate(Some(col("t.id") % 2 === 0),
          Seq("v" -> lit(-1L))),
        GraftLake.MatchedDelete(None)))
    val got = GraftLake.read(spark, dir).as[(Long, Long)].collect().toSet
    val expected = Set((4L, 8L), (5L, 10L)) ++ // matched: kept ONCE, verbatim
      Set(0L, 2L, 6L, 8L).map(i => (i, -1L))   // unmatched evens: updated
    // unmatched odds (1, 3, 7, 9) deleted
    assert(got == expected)
  }

  test("insert-only MERGE with per-clause conditions still routes through " +
    "the first applicable clause") {
    val dir = tmp()
    spark.range(0, 10).select(col("id"), (col("id") * 2).as("v"))
      .write.format("graft-lake").save(dir)
    val src = Seq((100L, 1L), (101L, 2L), (102L, 3L)).toDF("id", "sv")
    GraftLake.mergeInto(spark, dir, src,
      col("t.id") === col("s.id"),
      matched = Nil,
      notMatched = Seq(
        GraftLake.NotMatchedInsert(Some(col("s.sv") % 2 === 1),
          Seq("id" -> col("s.id"), "v" -> lit(-7L))),
        GraftLake.NotMatchedInsert(None,
          Seq("id" -> col("s.id"), "v" -> col("s.sv")))))
    val got = GraftLake.read(spark, dir).filter(col("id") >= 100L)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((100L, -7L), (101L, 2L), (102L, -7L)))
  }
}
