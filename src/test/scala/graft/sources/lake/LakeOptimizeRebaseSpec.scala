package graft.sources.lake

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Lost-fence REBASE for pure-layout rewrites: an OPTIMIZE/ZORDER that
 * loses its commit fence to a DISJOINT commit (the common case: a
 * concurrent append) re-targets its already-staged commit at the new
 * version instead of discarding the staged files and re-planning. At
 * 100 TB an OPTIMIZE runs for hours while appends keep landing —
 * without rebase every append would throw away ALL its staged work,
 * and a steady cadence starves compaction outright (Delta's conflict
 * matrix resolves the same way: OPTIMIZE does not conflict with
 * append). Row-CHANGING rewrites never rebase — serializability
 * demands they see concurrently appended rows — and a commit that
 * touched a victim, the schema, properties, or cluster bounds forces
 * the full re-plan.
 */
class LakeOptimizeRebaseSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_rebase").toString + "/t"

  private def dataFiles(dir: String): Set[String] =
    Option(new File(dir, "data").listFiles())
      .getOrElse(Array.empty).map(f => s"data/${f.getName}").toSet

  test("a concurrent APPEND between stage and commit is rebased over: " +
    "the staged files commit as-is, one version later, nothing re-stages") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 100).select(col("id"), col("id").as("v")),
      dir, numFiles = 4)
    var stagedAtHook = Set.empty[String]
    var hookRan = false
    GraftLake.testHookBeforeRewriteCommit = Some { op =>
      hookRan = true
      stagedAtHook = dataFiles(dir)
      GraftLake.append(
        spark.range(1000, 1010).select(col("id"), col("id").as("v")),
        dir, numFiles = 1)
    }
    try GraftLake.optimize(spark, dir, smallBytes = Long.MaxValue)
    finally GraftLake.testHookBeforeRewriteCommit = None
    assert(hookRan)
    val cs = GraftLake.commits(dir)
    val opt = cs.filter(_.op == "optimize")
    assert(opt.size == 1, "exactly one optimize commit")
    // the append WON the fence; the optimize rebased onto the next slot
    assert(cs.map(c => (c.version, c.op)).takeRight(2).map(_._2) ==
      Seq("append", "optimize"))
    // no re-staging: every file the optimize committed already existed
    // BEFORE the concurrent append (it was staged before the hook fired)
    assert(opt.head.adds.map(_.path).toSet.subsetOf(stagedAtHook),
      "rebase must commit the files staged before the race, not restage")
    // and the data is exactly the union
    assert(GraftLake.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
      == ((0L until 100L) ++ (1000L until 1010L)))
  }

  test("a commit that TOUCHES a victim (CoW delete) blocks the rebase: " +
    "the optimize discards its staging and re-plans against the new state") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 100).select(col("id"), col("id").as("v")),
      dir, numFiles = 4)
    GraftLake.testHookBeforeRewriteCommit = Some { _ =>
      // rewrites one of the optimize's victims -> disjointness fails
      GraftLake.delete(spark, dir, col("id") < 10)
    }
    try GraftLake.optimize(spark, dir, smallBytes = Long.MaxValue)
    finally GraftLake.testHookBeforeRewriteCommit = None
    // correctness after the re-plan: the delete applied, nothing
    // duplicated or resurrected
    assert(GraftLake.read(spark, dir).select("id").as[Long].collect().sorted.toSeq
      == (10L until 100L))
    // the discarded first-round staging left no orphans: every file
    // under data/ is referenced by some commit (active now, or a
    // tombstone awaiting vacuum) — the losing round's files are GONE
    val referenced = GraftLake.commits(dir).flatMap(_.adds.map(_.path)).toSet
    assert(dataFiles(dir).subsetOf(referenced),
      "discarded staging must leave no unreferenced files")
  }

  test("ZORDER rebases over appends too; the raced-in file stays " +
    "unclustered and is the next OPTIMIZE's victim") {
    val dir = tmp()
    GraftLake.create(
      spark.range(0, 4096).select((col("id") % 64).as("x"),
        (col("id") / lit(64)).cast("long").as("y"), col("id").as("p")),
      dir, numFiles = 4)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    GraftLake.testHookBeforeRewriteCommit = Some { _ =>
      GraftLake.append(spark.range(10000, 10004).select(
        (col("id") % 64).as("x"), lit(99L).as("y"), col("id").as("p")),
        dir, numFiles = 1)
    }
    try GraftLake.optimize(spark, dir)
    finally GraftLake.testHookBeforeRewriteCommit = None
    val cs = GraftLake.commits(dir)
    assert(cs.map(c => (c.version, c.op)).takeRight(2).map(_._2) ==
      Seq("append", "zorder"))
    assert(GraftLake.read(spark, dir).count() == 4100L)
    // the raced-in append missed the zorder generation -> still a victim
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.files.exists(_.cluster.isEmpty),
      "the concurrently appended file must remain unclustered")
    // a follow-up bare OPTIMIZE folds it in
    GraftLake.optimize(spark, dir)
    assert(GraftLake.read(spark, dir).count() == 4100L)
  }
}
