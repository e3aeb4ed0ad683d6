package graft.sources.lake

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * SHALLOW CLONE: a new lake table whose v0 references the source's
 * current files by ABSOLUTE path — zero bytes copied (cloning a 100 TB
 * corpus for an experiment is one metadata commit). From then on the
 * two tables are fully independent: each writes into its own directory,
 * each reads its own log, and the clone's vacuum never reclaims
 * absolute references (the source owns those bytes).
 */
class LakeCloneSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_clone").toString + "/t"

  private def dataFiles(dir: String): Set[String] =
    Option(new java.io.File(dir, "data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet

  test("clone is zero-copy and reads identically; source and clone then " +
    "diverge independently") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 2000).select(col("id"),
      (col("id") % 13).as("v")).repartitionByRange(4, col("id")), src)
    GraftLake.shallowClone(spark, src, dst)

    // zero copy: the clone's directory holds NO data files, only a log
    assert(dataFiles(dst).isEmpty, "clone must not copy data files")
    assert(GraftLake.read(spark, dst).count() == 2000L)
    assert(GraftLake.read(spark, dst).select(sum("id")).as[Long].head() ==
      GraftLake.read(spark, src).select(sum("id")).as[Long].head())
    // pruning works through the absolute references (footer stats cloned)
    val (_, kept, total) = GraftLake.scanFiltered(spark, dst, col("id") < 100)
    assert(total == 4 && kept <= 1, s"cloned stats must prune: $kept/$total")

    // divergence: writes to the clone land in ITS directory; source
    // files and source reads are untouched, and vice versa
    val srcFilesBefore = dataFiles(src)
    spark.range(10000, 10100).select(col("id"), (col("id") % 13).as("v"))
      .write.format("graft-lake").mode("append").save(dst)
    GraftLake.delete(spark, dst, col("id") < 500)
    assert(GraftLake.read(spark, dst).count() == 1600L)
    assert(GraftLake.read(spark, src).count() == 2000L, "source untouched")
    assert(dataFiles(src) == srcFilesBefore, "source files untouched")

    GraftLake.delete(spark, src, col("id") >= 1900)
    assert(GraftLake.read(spark, src).count() == 1900L)
    assert(GraftLake.read(spark, dst).count() == 1600L, "clone unaffected")
  }

  test("clone vacuum never reclaims the source's bytes; OPTIMIZE " +
    "localizes the clone and then vacuum reclaims only its own debris") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 1000).select(col("id"),
      (col("id") * 3).as("v")).repartitionByRange(4, col("id")), src)
    GraftLake.shallowClone(spark, src, dst)
    // OPTIMIZE rewrites the clone's referenced files INTO the clone's
    // own data/ (all 4 source files are "small"), dereferencing the abs
    // paths — the source's bytes must survive the clone's vacuum
    GraftLake.optimize(spark, dst, smallBytes = Long.MaxValue)
    assert(dataFiles(dst).nonEmpty, "optimize must localize the clone")
    GraftLake.vacuumAt(spark, dst, keepHistory = false, minAgeMillis = 0L,
      now = System.currentTimeMillis() + 1000L)
    assert(GraftLake.read(spark, src).count() == 1000L,
      "the clone's vacuum must never delete the source's files")
    assert(GraftLake.read(spark, dst).count() == 1000L)
    // time travel on the clone still needs the source files for v0;
    // they exist, so RESTORE works
    GraftLake.restore(spark, dst, 0L)
    assert(GraftLake.read(spark, dst).count() == 1000L)
  }

  test("clone carries schema identity: field ids, clusterBy + generation " +
    "tags, bounds; a rename on the clone keeps serving cloned files") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 4096).select((col("id") % 64).as("x"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .repartition(4), src)
    GraftLake.setProperties(spark, src, Map("clusterBy" -> "x,y"))
    GraftLake.optimize(spark, src) // clustered generation + bounds persisted
    GraftLake.shallowClone(spark, src, dst)

    val snap = GraftLake.snapshot(spark, dst)
    assert(snap.props("clusterBy") == "x,y")
    assert(snap.clusterBounds == GraftLake.snapshot(spark, src).clusterBounds)
    assert(GraftLake.unclusteredFiles(snap).isEmpty,
      "generation tags must carry: the cloned layout IS clustered")

    // rename on the CLONE: field ids came across, so the cloned files
    // (stamped with those ids) keep resolving under the new name
    GraftLake.renameColumn(spark, dst, "x", "x2")
    assert(GraftLake.read(spark, dst).filter(col("x2") === 7).count() == 64L)
    assert(GraftLake.snapshot(spark, dst).props("clusterBy") == "x2,y")
    // and the source still has the old name
    assert(GraftLake.read(spark, src).filter(col("x") === 7).count() == 64L)
  }

  test("clone of a DV'd table subtracts the source's vectors; a MoR " +
    "delete on the clone writes ITS OWN sidecar on top") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 1000).select(col("id"),
      (col("id") * 2).as("v")).coalesce(2), src)
    GraftLake.deleteMoR(spark, src, col("id") % 10 === 0) // 100 deleted
    GraftLake.shallowClone(spark, src, dst)
    assert(GraftLake.read(spark, dst).count() == 900L)

    GraftLake.deleteMoR(spark, dst, col("id") % 10 === 1) // 100 more, clone only
    assert(GraftLake.read(spark, dst).count() == 800L)
    assert(GraftLake.read(spark, src).count() == 900L, "source unaffected")
    // the clone's new sidecar is LOCAL (relative); the inherited one abs
    val dvPaths = GraftLake.snapshot(spark, dst).files.flatMap(_.dv.map(_.path))
    assert(dvPaths.exists(_.startsWith("/")) || dvPaths.isEmpty == false)
    assert(Option(new java.io.File(dst, "dv").listFiles()).exists(_.nonEmpty),
      "merged vector must be written into the clone's own dv/")
  }

  test("clone composes: a CONVERTED table clones (its already-relative " +
    "adopted paths become absolute), and a clone of a clone keeps " +
    "pointing at the ORIGINAL bytes") {
    val raw = tmp()
    spark.range(0, 1000).select(col("id"), (col("id") % 11).as("v"))
      .repartitionByRange(4, col("id")).write.parquet(raw)
    GraftLake.convert(spark, raw)
    val c1 = tmp(); val c2 = tmp()
    GraftLake.shallowClone(spark, raw, c1)
    GraftLake.shallowClone(spark, c1, c2)
    assert(dataFiles(c1).isEmpty && dataFiles(c2).isEmpty)
    assert(GraftLake.read(spark, c2).count() == 1000L)
    // second-level clone references resolve to the ORIGINAL directory
    // (abs stays abs through absPath), not to c1
    assert(GraftLake.snapshot(spark, c2).files.forall(_.path.startsWith(raw)),
      "clone-of-clone must point at the original bytes")
    GraftLake.delete(spark, c2, col("id") < 100)
    assert(GraftLake.read(spark, c2).count() == 900L)
    assert(GraftLake.read(spark, c1).count() == 1000L)
    assert(GraftLake.read(spark, raw).count() == 1000L)
  }

  test("time-travel clone: SHALLOW CLONE ... VERSION AS OF pins a past " +
    "snapshot as a standalone table (the reproducible-corpus move)") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 100).select(col("id"),
      (col("id") % 5).as("v")), src)                       // v0: 100 rows
    spark.range(1000, 1050).select(col("id"), (col("id") % 5).as("v"))
      .write.format("graft-lake").mode("append").save(src) // v1: 150
    GraftLake.delete(spark, src, col("id") < 20)           // v2: 130
    GraftLake.shallowClone(spark, src, dst, asOf = Some(1L))
    assert(GraftLake.read(spark, dst).count() == 150L,
      "clone must pin the v1 snapshot")
    // the clone is v0 of ITS OWN log — its history starts fresh
    assert(GraftLake.latestVersion(dst) == 0L)
    // and the source's later divergence is invisible to it
    assert(GraftLake.read(spark, src).count() == 130L)

    // SQL spelling
    spark.sql("DROP TABLE IF EXISTS clone_tt_src")
    spark.sql("DROP TABLE IF EXISTS clone_tt_dst")
    spark.sql(s"CREATE TABLE clone_tt_src USING `graft-lake` OPTIONS (path '$src')")
    val dst2 = tmp()
    spark.sql("CREATE TABLE clone_tt_dst SHALLOW CLONE clone_tt_src " +
      s"VERSION AS OF 0 LOCATION '$dst2'")
    assert(spark.table("clone_tt_dst").count() == 100L)
    spark.sql("DROP TABLE clone_tt_dst")
    spark.sql("DROP TABLE clone_tt_src")
  }

  test("SQL: CREATE TABLE c SHALLOW CLONE s registers the clone; history " +
    "starts at the clone commit") {
    val src = tmp()
    spark.sql("DROP TABLE IF EXISTS clone_src_t")
    spark.sql("DROP TABLE IF EXISTS clone_dst_t")
    spark.range(0, 500).select(col("id"), (col("id") % 7).as("v"))
      .createOrReplaceTempView("clone_spec_src")
    spark.sql(s"CREATE TABLE clone_src_t USING `graft-lake` " +
      s"OPTIONS (path '$src') AS SELECT * FROM clone_spec_src")
    val dstLoc = tmp()
    spark.sql(s"CREATE TABLE clone_dst_t SHALLOW CLONE clone_src_t " +
      s"LOCATION '$dstLoc'")
    assert(spark.table("clone_dst_t").count() == 500L)
    val ops = spark.sql("DESCRIBE HISTORY clone_dst_t").collect()
      .map(_.getAs[String]("operation"))
    assert(ops.toSeq == Seq("clone"))
    // divergence through SQL
    spark.sql("DELETE FROM clone_dst_t WHERE id < 100")
    assert(spark.table("clone_dst_t").count() == 400L)
    assert(spark.table("clone_src_t").count() == 500L)
    spark.sql("DROP TABLE clone_dst_t")
    spark.sql("DROP TABLE clone_src_t")
  }

  test("the documented clone/source-vacuum race: the SOURCE's history " +
    "vacuum CAN reclaim bytes a clone still references (Delta's caveat, " +
    "pinned) — and DRY RUN is the look-before-you-reclaim escape hatch") {
    val src = tmp(); val dst = tmp()
    GraftLake.create(spark.range(0, 1000).select(col("id"),
      (col("id") * 3).as("v")).repartitionByRange(4, col("id")), src)
    GraftLake.shallowClone(spark, src, dst) // clone pins src's v0 files
    // the source moves on: OPTIMIZE tombstones the original 4 files
    GraftLake.optimize(spark, src, smallBytes = Long.MaxValue)
    assert(GraftLake.read(spark, dst).count() == 1000L,
      "clone reads fine while the source retains history")

    // ESCAPE HATCH: DRY RUN names exactly what a history vacuum would
    // reclaim — the operator can check those paths against live clones
    // BEFORE giving up the bytes
    val (doomed, _) = GraftLake.vacuumDoomed(spark, src,
      keepHistory = false, minAgeMillis = 0L,
      now = System.currentTimeMillis() + 1000L)
    val cloneRefs = GraftLake.snapshot(spark, dst).files.map(_.path).toSet
    assert(doomed.exists(p => cloneRefs.contains(s"$src/$p")),
      "DRY RUN must surface the clone-referenced files it would reclaim")
    assert(GraftLake.read(spark, dst).count() == 1000L,
      "the dry run itself must touch nothing")

    // the RACE, pinned: a keepHistory=false vacuum on the source
    // reclaims the tombstoned originals — the clone's reads now fail
    // (fail-FAST on missing files, never silently partial). This is the
    // documented contract: clone from tables whose retention you
    // control, or OPTIMIZE the clone (localizing it) before the
    // source's history expires.
    GraftLake.vacuumAt(spark, src, keepHistory = false, minAgeMillis = 0L,
      now = System.currentTimeMillis() + 1000L)
    assert(GraftLake.read(spark, src).count() == 1000L,
      "the source itself is intact (its active files were never doomed)")
    val failed = try { GraftLake.read(spark, dst).count(); false }
      catch { case _: Exception => true }
    assert(failed, "clone reads must fail fast once the source reclaimed " +
      "the referenced bytes — not return silently partial data")
  }

  test("a clone whose catalog registration FAILS unwinds its v0 log — no " +
    "stranded populated lake directory without a catalog entry") {
    val src = tmp()
    spark.sql("DROP TABLE IF EXISTS clone_unwind_src")
    spark.range(0, 50).toDF("id").createOrReplaceTempView("clone_unwind_v")
    spark.sql(s"CREATE TABLE clone_unwind_src USING `graft-lake` " +
      s"OPTIONS (path '$src') AS SELECT * FROM clone_unwind_v")
    // a name in a nonexistent database passes the tableExists pre-check
    // (false) but createTable throws — the deterministic stand-in for a
    // concurrent CREATE winning the name between pre-check and register
    val dstLoc = tmp()
    intercept[Exception] {
      spark.sql(s"CREATE TABLE no_such_db_graft.clone_unwind_dst " +
        s"SHALLOW CLONE clone_unwind_src LOCATION '$dstLoc'")
    }
    assert(GraftLake.latestVersion(dstLoc) < 0,
      "failed registration must unwind the clone's v0 log")
    assert(!new java.io.File(dstLoc, "_log").exists())
    // the source is untouched and still serves
    assert(spark.table("clone_unwind_src").count() == 50L)
    spark.sql("DROP TABLE clone_unwind_src")
  }
}
