package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * BATCH change-data-feed as reader options (the Delta `table_changes`
 * shape): `spark.read.format("graft-lake").option("readChangeFeed",
 * "true").option("startingVersion", s)[.option("endingVersion", e)]`
 * returns the NET row-level delta of commits [s, e] with
 * `change_kind` ∈ {insert, delete} — an updated row is old-deleted +
 * new-inserted, pure layout commits net to zero, cost bounded by
 * changed-file volume. The streaming twin is LakeStreamSpec's
 * readChangeFeed; this is the same GraftLake.changes machinery on the
 * batch seam.
 */
class LakeBatchCdfSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_batch_cdf").toString + "/t"

  test("inserts, CoW update, MoR delete, and an OPTIMIZE all net " +
    "correctly through the batch reader; endingVersion bounds the range") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 100).select(col("id"),
      (col("id") * 2).as("v")).repartitionByRange(4, col("id")), dir)   // v0
    spark.range(200, 210).select(col("id"), (col("id") * 2).as("v"))
      .write.format("graft-lake").mode("append").save(dir)              // v1
    GraftLake.update(spark, dir, col("id") === 5L,
      Seq("v" -> lit(-1L)))                                             // v2
    GraftLake.deleteMoR(spark, dir, col("id") === 7L)                   // v3
    GraftLake.optimize(spark, dir)                                      // v4 (layout)
    assert(GraftLake.latestVersion(dir) == 4L)

    def cdf(from: Long, to: Option[Long] = None) = {
      val r = spark.read.format("graft-lake")
        .option("readChangeFeed", "true").option("startingVersion", from)
      to.foreach(e => r.option("endingVersion", e))
      to.fold(r)(e => r.option("endingVersion", e)).load(dir)
    }

    // commits 1..4: +10 appended, update = delete(5,10)+insert(5,-1),
    // MoR delete of id 7, optimize nets to zero
    val all = cdf(1).collect()
    val ins = all.filter(_.getAs[String]("change_kind") == "insert")
    val del = all.filter(_.getAs[String]("change_kind") == "delete")
    assert(ins.length == 11 && del.length == 2,
      s"expected 11 inserts / 2 deletes, got ${ins.length}/${del.length}")
    assert(ins.count(r => r.getAs[Long]("id") == 5L && r.getAs[Long]("v") == -1L) == 1)
    assert(del.map(_.getAs[Long]("id")).toSet == Set(5L, 7L))

    // endingVersion bounds: commits 1..1 = just the append
    val first = cdf(1, Some(1L)).collect()
    assert(first.length == 10 &&
      first.forall(_.getAs[String]("change_kind") == "insert"))
    // commits 4..4 (pure layout) net to zero rows
    assert(cdf(4, Some(4L)).count() == 0L)

    // agrees with the API it rides on (commits [s,e] = changes(s-1, e))
    val api = GraftLake.changes(spark, dir, 0L, 4L)
      .select("id", "v", "change_kind").collect().toSet
    assert(all.map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"),
      r.getAs[String]("change_kind"))).toSet ==
      api.map(r => (r.getAs[Long]("id"), r.getAs[Long]("v"),
        r.getAs[String]("change_kind"))))
  }

  test("table_changes(t, s[, e]) — the UDTF spelling — agrees with the " +
    "reader options and takes catalog names or quoted paths") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_tc_t")
    spark.range(0, 50).select(col("id"), (col("id") * 2).as("v"))
      .createOrReplaceTempView("lake_tc_src")
    spark.sql(s"CREATE TABLE lake_tc_t USING `graft-lake` OPTIONS (path '$dir') " +
      "AS SELECT * FROM lake_tc_src")                                   // v0
    spark.sql("INSERT INTO lake_tc_t SELECT id, id FROM range(100, 110)") // v1
    spark.sql("DELETE FROM lake_tc_t WHERE id < 5")                      // v2

    val viaUdtf = spark.sql(
      "SELECT id, v, change_kind FROM table_changes('lake_tc_t', 1, 2)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val viaOptions = spark.read.format("graft-lake")
      .option("readChangeFeed", "true").option("startingVersion", 1)
      .option("endingVersion", 2).load(dir)
      .select("id", "v", "change_kind")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(viaUdtf == viaOptions && viaUdtf.nonEmpty)
    assert(viaUdtf.count(_._3 == "insert") == 10)
    assert(viaUdtf.count(_._3 == "delete") == 5)

    // quoted-path target + open-ended range (to latest)
    val openEnded = spark.sql(
      s"SELECT count(*) FROM table_changes('$dir', 1)").head().getLong(0)
    assert(openEnded == 15L)
    // misuse errors
    intercept[Exception](
      spark.sql("SELECT * FROM table_changes('lake_tc_t', 0)").collect())
    spark.sql("DROP TABLE lake_tc_t")
  }

  test("option validation: startingVersion required and >= 1; exclusive " +
    "with versionAsOf") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 10).toDF("id"), dir)
    intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("readChangeFeed", "true").load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("readChangeFeed", "true")
        .option("startingVersion", 0).load(dir)
    }
    intercept[IllegalArgumentException] {
      spark.read.format("graft-lake").option("readChangeFeed", "true")
        .option("startingVersion", 1).option("versionAsOf", 0).load(dir)
    }
  }
}
