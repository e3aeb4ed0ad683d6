package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Liquid-clustering-lite: `clusterBy` is a FOLDED table property (general
 * key/value props are log state now — latest delta wins, checkpointed,
 * versioned). A bare OPTIMIZE of a clustered table re-clusters the whole
 * table on those columns; appends best-effort sort their batch by the
 * cluster z-value (narrow, no shuffle) so new files land with tight
 * envelopes; RENAME/DROP COLUMN keep the property consistent in the SAME
 * commit. This is the clustering-over-partitioning posture the engine
 * argues for at 100 TB, now a table-level declaration instead of a
 * per-maintenance-run argument.
 */
class LakeClusterBySpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_clusterby").toString + "/t"

  test("props are folded log state: set/unset version, time-travel, and " +
    "survive checkpoints") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 100).select(col("id"), (col("id") % 7).as("k")),
      dir, checkpointEvery = 2)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "id,k", "owner" -> "ml"))
    assert(GraftLake.snapshot(spark, dir).props ==
      Map("clusterBy" -> "id,k", "owner" -> "ml"))
    GraftLake.setProperties(spark, dir, Map.empty, unsets = Seq("owner"))
    assert(GraftLake.snapshot(spark, dir).props == Map("clusterBy" -> "id,k"))
    // time travel sees the props of THAT version
    assert(GraftLake.snapshot(spark, dir, asOf = Some(0L)).props.isEmpty)
    assert(GraftLake.snapshot(spark, dir, asOf = Some(1L)).props("owner") == "ml")
    // checkpoint at v2 carries the folded map; fold from it alone
    (1 to 2).foreach { i =>
      spark.range(i * 1000, i * 1000 + 10).select(col("id"), (col("id") % 7).as("k"))
        .write.format("graft-lake").mode("append").save(dir)
    }
    val log = new java.io.File(dir, "_log")
    assert(log.listFiles((_, n) => n.startsWith("ckpt-v")).nonEmpty)
    (0 to 1).foreach(v => new java.io.File(log, f"v$v%020d.json").delete())
    assert(GraftLake.snapshot(spark, dir).props == Map("clusterBy" -> "id,k"))

    // validation: unknown columns and single-column lists are rejected
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("clusterBy" -> "id,nope"))
    }
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("clusterBy" -> "id"))
    }
  }

  test("bare OPTIMIZE re-clusters a clusterBy table; appends sort their " +
    "batch; box predicates prune") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_cluster_t")
    // scattered initial layout on (x, y)
    spark.range(0, 16384).select(
      (col("id") % 128).as("x"), (shiftright(col("id"), 7) % 128).as("y"),
      col("id").as("payload"))
      .repartition(8, col("payload"))
      .createOrReplaceTempView("lake_cluster_src")
    spark.sql(
      s"""CREATE TABLE lake_cluster_t USING `graft-lake` OPTIONS (path '$dir')
         |TBLPROPERTIES ('clusterBy' = 'x,y')
         |AS SELECT * FROM lake_cluster_src""".stripMargin)
    assert(GraftLake.snapshot(spark, dir).props("clusterBy") == "x,y")

    // bare OPTIMIZE (no ZORDER clause) -> whole-table cluster on (x, y);
    // SQL uses the 128 MB default target, the API pass below sizes files
    // small enough that the box-pruning effect is observable
    spark.sql("OPTIMIZE lake_cluster_t").head().getLong(0)
    assert(GraftLake.history(dir).map(_._2).contains("zorder"))
    val bytes = GraftLake.snapshot(spark, dir).files.map(_.bytes).sum
    GraftLake.optimize(spark, dir, targetBytes = math.max(1L, bytes / 16))
    spark.catalog.refreshTable("lake_cluster_t")

    val box = col("x").between(0, 15) && col("y").between(16, 31)
    val (df, kept, total) = GraftLake.scanFiltered(spark, dir, box)
    assert(total > 4 && kept <= total / 2,
      s"clustered table must prune the box: $kept/$total")
    val expected = (0L until 16384L)
      .filter(i => i % 128 <= 15 && (i >> 7) % 128 >= 16 && (i >> 7) % 128 <= 31)
      .sorted
    assert(df.select("payload").as[Long].collect().sorted.toSeq == expected)

    // appends to a clustered table sort their batch: each new file's
    // envelope covers a slice of the cluster space, not all of it
    val before = GraftLake.snapshot(spark, dir).files.size
    spark.range(20000, 24096).select(
      (col("id") % 128).as("x"), (shiftright(col("id"), 7) % 128).as("y"),
      lit(-1L).as("payload"))
      .repartition(4)
      .write.format("graft-lake").mode("append").save(dir)
    val snap = GraftLake.snapshot(spark, dir)
    val newFiles = snap.files.drop(before)
    assert(newFiles.size == 4)
    assert(GraftLake.snapshot(spark, dir).props("clusterBy") == "x,y")
    spark.sql("DROP TABLE lake_cluster_t")
  }

  test("RENAME COLUMN follows a clustered column; DROP clears it below " +
    "two survivors — same commit, never dangling") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 100).select(
      col("id"), (col("id") % 5).as("a"), (col("id") % 7).as("b")), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "a,b"))
    GraftLake.renameColumn(spark, dir, "a", "a2")
    assert(GraftLake.snapshot(spark, dir).props("clusterBy") == "a2,b")
    GraftLake.dropColumn(spark, dir, "b")
    assert(!GraftLake.snapshot(spark, dir).props.contains("clusterBy"),
      "below two surviving cluster columns the property must clear")
  }

  test("SQL ALTER TABLE SET/UNSET TBLPROPERTIES routes generic keys " +
    "through the folded props") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_props_t")
    spark.range(0, 50).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("lake_props_src")
    spark.sql(
      s"""CREATE TABLE lake_props_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_props_src""".stripMargin)
    spark.sql("ALTER TABLE lake_props_t SET TBLPROPERTIES " +
      "('clusterBy' = 'id,v', 'team' = 'data')")
    assert(GraftLake.snapshot(spark, dir).props ==
      Map("clusterBy" -> "id,v", "team" -> "data"))
    spark.sql("ALTER TABLE lake_props_t UNSET TBLPROPERTIES ('team')")
    assert(GraftLake.snapshot(spark, dir).props == Map("clusterBy" -> "id,v"))
    // checkpointEvery still routes to its dedicated folded field
    spark.sql("ALTER TABLE lake_props_t SET TBLPROPERTIES ('checkpointEvery' = '4')")
    assert(GraftLake.snapshot(spark, dir).ckptEvery == 4)
    assert(!GraftLake.snapshot(spark, dir).props.contains("checkpointEvery"))
    spark.sql("DROP TABLE lake_props_t")
  }
}
