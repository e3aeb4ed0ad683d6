package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Lake-to-lake replication via [[GraftLake.applyChangeFeed]]: bootstrap
 * from a snapshot, then apply `changes(v, v')` feeds incrementally —
 * each application is one MERGE commit, updated rows (delete+insert in
 * the feed) collapse to upserts, replay of the same feed converges
 * (idempotent state transition), and a feed with duplicate insert keys
 * is rejected upfront.
 */
class LakeReplicaSpec extends SparkSpec {

  import spark.implicits._

  private def rows(dir: String): Set[(Long, String, Long)] =
    GraftLake.read(spark, dir)
      .select("id", "tag", "v").as[(Long, String, Long)].collect().toSet

  test("incremental feed application tracks the source; replay converges") {
    val base = java.nio.file.Files.createTempDirectory("graft_replica")
    val src = s"$base/src"; val rep = s"$base/rep"
    def kv(ids: Range, tag: String) =
      ids.map(i => (i.toLong, tag, i.toLong * 10)).toDF("id", "tag", "v")

    GraftLake.create(kv(0 until 100, "a"), src)                   // v0
    GraftLake.create(GraftLake.read(spark, src, asOf = Some(0L)), rep)

    GraftLake.append(kv(100 until 150, "b"), src)                 // v1
    GraftLake.delete(spark, src, col("id") % 10 === 3)            // v2
    GraftLake.applyChangeFeed(spark, rep,
      GraftLake.changes(spark, src, 0L, 2L), "id")
    assert(rows(rep) == rows(src), "replica tracks v2")

    GraftLake.merge(spark, src,                                   // v3: update+insert
      (Seq((7L, "upd", 777L), (900L, "new", 9L))).toDF("id", "tag", "v"), "id")
    val feed23 = GraftLake.changes(spark, src, 2L, 3L)
    GraftLake.applyChangeFeed(spark, rep, feed23, "id")
    assert(rows(rep) == rows(src), "replica tracks v3 incrementally")

    // replaying the SAME feed converges (update reapplies, delete finds
    // nothing, insert upserts) — the crash-replay contract
    GraftLake.applyChangeFeed(spark, rep, feed23, "id")
    assert(rows(rep) == rows(src), "replayed feed must converge")

    // a feed with duplicate insert keys (non-key-unique table) rejects
    val bad = Seq((1L, "x", 1L, "insert"), (1L, "y", 2L, "insert"))
      .toDF("id", "tag", "v", "change_kind")
    val err = intercept[IllegalArgumentException](
      GraftLake.applyChangeFeed(spark, rep, bad, "id"))
    assert(err.getMessage.contains("key-unique"))
  }
}
