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

    // bare OPTIMIZE (no ZORDER clause) -> clusters on the declared (x, y)
    spark.sql("OPTIMIZE lake_cluster_t").head().getLong(0)
    assert(GraftLake.history(dir).map(_._2).contains("zorder"))
    // an already-clustered table yields zero victims -> bare re-OPTIMIZE
    // is a no-op; the explicit ZORDER form forces the whole-table
    // re-layout, here into files small enough to observe pruning
    spark.sql("OPTIMIZE lake_cluster_t ZORDER BY (x, y) INTO 16 FILES")
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

  test("bare OPTIMIZE clusters INCREMENTALLY: earlier generations keep " +
    "their physical place; DV'd files re-enter to purge vectors") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (shiftright(col("id"), 6) % 64).as("y"),
      col("id").as("p")).repartition(4), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    val bytes = GraftLake.snapshot(spark, dir).files.map(_.bytes).sum
    GraftLake.optimize(spark, dir, targetBytes = math.max(1L, bytes / 8))
    val gen1 = GraftLake.snapshot(spark, dir).files.map(_.path).toSet

    // append a batch, re-OPTIMIZE: generation 1 must stay untouched
    spark.range(5000, 5512).select((col("id") % 64).as("x"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .write.format("graft-lake").mode("append").save(dir)
    GraftLake.optimize(spark, dir)
    val afterSnap = GraftLake.snapshot(spark, dir)
    assert(gen1.subsetOf(afterSnap.files.map(_.path).toSet),
      "incremental clustering must not rewrite the clustered bulk")
    assert(GraftLake.history(dir).map(_._2).count(_ == "zorder") == 2)

    // a third bare OPTIMIZE with nothing new is a no-op (zero victims)
    val vBefore = GraftLake.latestVersion(dir)
    GraftLake.optimize(spark, dir)
    assert(GraftLake.latestVersion(dir) == vBefore ||
      GraftLake.snapshot(spark, dir).files.map(_.path).toSet ==
        afterSnap.files.map(_.path).toSet,
      "optimize of a fully-clustered table must not churn files")

    // a MoR delete makes its victim files candidates again: the next
    // OPTIMIZE purges the vectors, everything else keeps its place
    GraftLake.deleteMoR(spark, dir, col("p") === 77L)
    val dvd = GraftLake.snapshot(spark, dir).files
      .filter(_.dv.isDefined).map(_.path).toSet
    assert(dvd.nonEmpty)
    GraftLake.optimize(spark, dir)
    val fin = GraftLake.snapshot(spark, dir)
    assert(fin.files.forall(_.dv.isEmpty), "vectors must purge")
    assert((afterSnap.files.map(_.path).toSet -- dvd)
      .subsetOf(fin.files.map(_.path).toSet),
      "non-DV files must keep their place")
    assert(GraftLake.read(spark, dir).count() == 4096 + 512 - 1)
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

  test("Spark's native CREATE TABLE ... CLUSTER BY syntax maps onto the " +
    "clusterBy property (CTAS and plain create)") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_native_cb")
    spark.range(0, 512).select((col("id") % 16).as("x"),
      (shiftright(col("id"), 4) % 16).as("y"), col("id").as("p"))
      .createOrReplaceTempView("lake_native_cb_src")
    spark.sql(
      s"""CREATE TABLE lake_native_cb USING `graft-lake` OPTIONS (path '$dir')
         |CLUSTER BY (x, y)
         |AS SELECT * FROM lake_native_cb_src""".stripMargin)
    assert(GraftLake.snapshot(spark, dir).props("clusterBy") == "x,y")
    // bare OPTIMIZE then clusters on them, SQL-standard end to end
    spark.sql("OPTIMIZE lake_native_cb")
    assert(GraftLake.history(dir).map(_._2).contains("zorder"))
    assert(spark.table("lake_native_cb").count() == 512)
    spark.sql("DROP TABLE lake_native_cb")

    val dir2 = tmp() + "2"
    spark.sql("DROP TABLE IF EXISTS lake_native_cb2")
    spark.sql(
      s"""CREATE TABLE lake_native_cb2 (a BIGINT, b BIGINT, c STRING)
         |USING `graft-lake` OPTIONS (path '$dir2') CLUSTER BY (a, b)""".stripMargin)
    assert(GraftLake.snapshot(spark, dir2).props("clusterBy") == "a,b")
    spark.sql("DROP TABLE lake_native_cb2")

    // the typed API spells the same clause: df.writeTo(...).clusterBy(...)
    spark.sql("DROP TABLE IF EXISTS lake_native_cb3")
    val orphan = new java.io.File("spark-warehouse/lake_native_cb3")
    if (orphan.exists()) { // debris from a previously failed run
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(orphan)
    }
    spark.range(0, 256).select((col("id") % 8).as("x"), (col("id") % 9).as("y"))
      .writeTo("lake_native_cb3").using("graft-lake").clusterBy("x", "y").create()
    val shown = spark.sql("SHOW TBLPROPERTIES lake_native_cb3").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("clusterBy").contains("x,y"), s"writeTo.clusterBy: $shown")
    assert(spark.table("lake_native_cb3").count() == 256)
    spark.sql("DROP TABLE lake_native_cb3")
  }

  test("zorder persists cluster-bucket boundaries; later increments reuse " +
    "them (aligned generations, no re-sampling); layout-key changes clear") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (shiftright(col("id"), 6) % 64).as("y"),
      col("id").as("p")).repartition(4), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    assert(GraftLake.snapshot(spark, dir).clusterBounds.isEmpty)

    GraftLake.optimize(spark, dir)
    val b1 = GraftLake.snapshot(spark, dir).clusterBounds
    assert(b1.isDefined, "first cluster must persist its bucket boundaries")
    val (bits, bounds) = GraftLake.parseBounds(b1.get)
    assert(bits == 10 && bounds.cols.keySet == Set("x", "y"))

    // an incremental cluster of a new batch REUSES the persisted
    // boundaries verbatim (z-aligned with the first generation)
    spark.range(9000, 9512).select((col("id") % 64).as("x"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .write.format("graft-lake").mode("append").save(dir)
    GraftLake.optimize(spark, dir)
    assert(GraftLake.snapshot(spark, dir).clusterBounds == b1,
      "incremental clustering must keep the persisted boundaries")

    // renaming a clustered column invalidates the boundaries (keyed by
    // the old name); the next OPTIMIZE recomputes under the new one
    GraftLake.renameColumn(spark, dir, "x", "x2")
    val afterRename = GraftLake.snapshot(spark, dir)
    assert(afterRename.props("clusterBy") == "x2,y")
    assert(afterRename.clusterBounds.isEmpty, "rename must clear bounds")
    // a fully-clustered table has nothing to recompute from — the next
    // OPTIMIZE with actual victims re-persists under the new names
    spark.range(20000, 20256).select((col("id") % 64).as("x2"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .write.format("graft-lake").mode("append").save(dir)
    GraftLake.optimize(spark, dir)
    val b2 = GraftLake.snapshot(spark, dir).clusterBounds
    assert(b2.isDefined &&
      GraftLake.parseBounds(b2.get)._2.cols.keySet == Set("x2", "y"))

    // changing the property itself clears them too
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "p,y"))
    assert(GraftLake.snapshot(spark, dir).clusterBounds.isEmpty)
  }

  test("REPLACE clears stale bounds always and drops a clusterBy whose " +
    "columns the new schema lacks (no dangling layout keys)") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 512).select(
      (col("id") % 16).as("x"), (col("id") % 17).as("y")), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    GraftLake.optimize(spark, dir)
    assert(GraftLake.snapshot(spark, dir).clusterBounds.isDefined)

    // same columns survive REPLACE (property kept, bounds cleared — the
    // data distribution is brand new)
    GraftLake.replaceTable(spark.range(0, 64).select(
      (col("id") % 4).as("x"), (col("id") % 5).as("y")), dir)
    val s1 = GraftLake.snapshot(spark, dir)
    assert(s1.props.get("clusterBy").contains("x,y") && s1.clusterBounds.isEmpty)
    GraftLake.optimize(spark, dir) // re-clusters the fresh data fine
    assert(GraftLake.snapshot(spark, dir).clusterBounds.isDefined)

    // schema swap that loses a clustered column drops the property
    GraftLake.replaceTable(spark.range(0, 64).select(
      (col("id") % 4).as("a"), (col("id") % 5).as("y")), dir)
    val s2 = GraftLake.snapshot(spark, dir)
    assert(!s2.props.contains("clusterBy") && s2.clusterBounds.isEmpty,
      s"dangling clusterBy must drop: ${s2.props}")
    GraftLake.optimize(spark, dir) // plain bin-pack, no unresolvable column
    assert(GraftLake.read(spark, dir).count() == 64)
  }

  test("racing bare OPTIMIZE and appends serialize under the fence; " +
    "nothing lost, victims recomputed per attempt") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 2048).select(
      (col("id") % 64).as("x"), (shiftright(col("id"), 6) % 64).as("y"),
      col("id").as("p")).repartition(4), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 3).map { i =>
      new Thread(() =>
        try {
          if (i == 0) { GraftLake.optimize(spark, dir); () }
          else {
            spark.range(10000 + i * 1000, 10000 + i * 1000 + 256)
              .select((col("id") % 64).as("x"),
                (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
              .write.format("graft-lake").mode("append").save(dir)
          }
        } catch { case t: Throwable => errs.add(t); () })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"racing writers must all land: ${errs.peek()}")
    assert(GraftLake.read(spark, dir).count() == 2048 + 2 * 256)
    // ids unique -> no row duplicated or lost by the racing rewrite
    assert(GraftLake.read(spark, dir).select("p").distinct().count() == 2560)
  }

  test("SHOW TBLPROPERTIES and DESCRIBE DETAIL read the folded log props " +
    "(metastore lag invisible); DETAIL exposes clustering staleness") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_show_t")
    spark.range(0, 2048).select((col("id") % 64).as("x"),
      (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
      .repartition(4)
      .createOrReplaceTempView("lake_show_src")
    spark.sql(
      s"""CREATE TABLE lake_show_t USING `graft-lake` OPTIONS (path '$dir')
         |AS SELECT * FROM lake_show_src""".stripMargin)
    // set through the API — the metastore copy does NOT see this; SHOW
    // must read the log anyway
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y", "team" -> "ml"))
    spark.catalog.refreshTable("lake_show_t")
    val shown = spark.sql("SHOW TBLPROPERTIES lake_show_t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown.get("clusterBy").contains("x,y") && shown.get("team").contains("ml"),
      s"SHOW TBLPROPERTIES must read the log: $shown")

    // DETAIL: everything unclustered before OPTIMIZE, nothing after
    val d1 = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(d1.getAs[String]("clustered_by") == "x,y")
    assert(d1.getAs[Long]("unclustered_files") == d1.getAs[Long]("num_files"))
    assert(d1.getAs[String]("properties").contains("\"team\":\"ml\""))
    GraftLake.optimize(spark, dir)
    val d2 = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
    assert(d2.getAs[Long]("unclustered_files") == 0L,
      s"fully clustered table must report zero staleness: $d2")
    spark.sql("DROP TABLE lake_show_t")
  }

  test("generation TAGS, not zorder history: changing the cluster columns " +
    "re-victimizes the old bulk; a rename keeps the physically-unchanged " +
    "layout clustered; staleness is answered from the snapshot alone") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 4096).select(
      (col("id") % 64).as("x"), (shiftright(col("id"), 6) % 64).as("y"),
      col("id").as("p")).repartition(4), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    GraftLake.optimize(spark, dir)
    val snap1 = GraftLake.snapshot(spark, dir)
    assert(GraftLake.unclusteredFiles(snap1).isEmpty)
    assert(snap1.files.forall(_.cluster.isDefined))

    // CHANGE the cluster columns: the old generation's tag no longer
    // matches, so every file is stale again (the old commit-history scan
    // reported 0 here — any 'zorder' commit counted forever) and the next
    // bare OPTIMIZE actually re-clusters on the new columns
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,p"))
    val snap2 = GraftLake.snapshot(spark, dir)
    assert(GraftLake.unclusteredFiles(snap2).size == snap2.files.size,
      "a clusterBy change must re-victimize the whole old generation")
    GraftLake.optimize(spark, dir)
    val snap3 = GraftLake.snapshot(spark, dir)
    assert(GraftLake.unclusteredFiles(snap3).isEmpty)
    assert(snap3.files.map(_.path).toSet.intersect(
      snap1.files.map(_.path).toSet).isEmpty,
      "the re-cluster must have rewritten the old layout")

    // explicit ZORDER BY on OTHER columns tags that generation with those
    // columns -> still stale w.r.t. the declared clusterBy
    GraftLake.optimizeZOrder(spark, dir, Seq("y", "p"), 4)
    val snap4 = GraftLake.snapshot(spark, dir)
    assert(GraftLake.unclusteredFiles(snap4).size == snap4.files.size,
      "a zorder on different columns must not count as clustered")

    // RENAME of a clustered column: tags are field-id-keyed, so the
    // physically-unchanged layout stays clustered under the new name
    GraftLake.optimize(spark, dir) // re-cluster on (x, p) first
    GraftLake.renameColumn(spark, dir, "x", "x2")
    val snap5 = GraftLake.snapshot(spark, dir)
    assert(snap5.props("clusterBy") == "x2,p")
    assert(GraftLake.unclusteredFiles(snap5).isEmpty,
      "rename is pure metadata — the layout must stay clustered")
    assert(GraftLake.read(spark, dir).count() == 4096)
  }

  test("7-column clusterBy stays writable (interleave bits shrink); 9 " +
    "columns rejected up front") {
    val dir = tmp()
    val wide = spark.range(0, 2048).select(
      (0 until 7).map(i => ((col("id") + i) % 16).as(s"c$i")) :+
        col("id").as("p"): _*)
    GraftLake.create(wide.repartition(2), dir)
    // 10 bits x 7 cols would blow ZValueN's 63-bit budget; the shrunk
    // interleave (9 bits) must keep every write path working
    GraftLake.setProperties(spark, dir,
      Map("clusterBy" -> (0 until 7).map(i => s"c$i").mkString(",")))
    spark.range(5000, 5128).select(
      (0 until 7).map(i => ((col("id") + i) % 16).as(s"c$i")) :+
        col("id").as("p"): _*)
      .write.format("graft-lake").mode("append").save(dir) // append sorts by z
    GraftLake.optimize(spark, dir) // bare OPTIMIZE clusters
    assert(GraftLake.unclusteredFiles(GraftLake.snapshot(spark, dir)).isEmpty)
    assert(GraftLake.read(spark, dir).count() == 2048 + 128)

    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir,
        Map("clusterBy" -> ((0 until 7).map(i => s"c$i") ++ Seq("p", "p2"))
          .mkString(",")))
    }
  }

  test("CREATE/REPLACE TABLE with an invalid clusterBy is ATOMIC: the " +
    "statement fails with no lake directory and no catalog entry behind") {
    val dir = tmp()
    spark.sql("DROP TABLE IF EXISTS lake_atomic_t")
    spark.range(0, 64).select(col("id").as("a"), (col("id") * 2).as("b"))
      .createOrReplaceTempView("lake_atomic_src")
    // Spark's native CLUSTER BY (a) is legal syntax; the lake rejects
    // single-column clustering — but must do so BEFORE creating anything
    intercept[IllegalArgumentException] {
      spark.sql(
        s"""CREATE TABLE lake_atomic_t USING `graft-lake` OPTIONS (path '$dir')
           |CLUSTER BY (a) AS SELECT * FROM lake_atomic_src""".stripMargin)
    }
    assert(GraftLake.latestVersion(dir) < 0,
      "failed CREATE must not leave an orphaned lake directory")
    assert(!spark.sessionState.catalog.tableExists(
      org.apache.spark.sql.catalyst.TableIdentifier("lake_atomic_t")))
    // unknown column in TBLPROPERTIES: same atomicity
    intercept[IllegalArgumentException] {
      spark.sql(
        s"""CREATE TABLE lake_atomic_t USING `graft-lake` OPTIONS (path '$dir')
           |TBLPROPERTIES ('clusterBy' = 'a,nope')
           |AS SELECT * FROM lake_atomic_src""".stripMargin)
    }
    assert(GraftLake.latestVersion(dir) < 0)
    // the path is still usable by a VALID create afterwards
    spark.sql(
      s"""CREATE TABLE lake_atomic_t USING `graft-lake` OPTIONS (path '$dir')
         |CLUSTER BY (a, b) AS SELECT * FROM lake_atomic_src""".stripMargin)
    assert(spark.table("lake_atomic_t").count() == 64)
    assert(GraftLake.snapshot(spark, dir).props("clusterBy") == "a,b")
    spark.sql("DROP TABLE lake_atomic_t")
  }

  test("file count stays BOUNDED under an append+OPTIMIZE-every-batch " +
    "cadence: small clustered generations consolidate past the threshold, " +
    "below it OPTIMIZE stays O(new data)") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 2048).select(
      (col("id") % 64).as("x"), (shiftright(col("id"), 6) % 64).as("y"),
      col("id").as("p")), dir)
    GraftLake.setProperties(spark, dir, Map("clusterBy" -> "x,y"))
    GraftLake.optimize(spark, dir)
    val bulk = GraftLake.snapshot(spark, dir).files.map(_.path).toSet

    var maxFiles = 0
    var consolidations = 0
    (1 to 24).foreach { i =>
      spark.range(i * 10000, i * 10000 + 64).select((col("id") % 64).as("x"),
        (shiftright(col("id"), 6) % 64).as("y"), col("id").as("p"))
        .coalesce(1).write.format("graft-lake").mode("append").save(dir)
      val before = GraftLake.snapshot(spark, dir).files.size
      GraftLake.optimize(spark, dir)
      val snap = GraftLake.snapshot(spark, dir)
      maxFiles = math.max(maxFiles, snap.files.size)
      if (snap.files.size < before) consolidations += 1
    }
    // bounded: never grows past threshold + the steady bulk; and the
    // fold actually fired at least once over 24 cycles
    assert(maxFiles <= GraftLake.ConsolidateSmallGenerations + bulk.size + 2,
      s"file count must stay bounded, peaked at $maxFiles")
    assert(consolidations >= 1,
      "small clustered generations must consolidate under a frequent cadence")
    assert(GraftLake.read(spark, dir).count() == 2048 + 24 * 64)
    // all still clustered; a final bare OPTIMIZE below threshold is a no-op
    assert(GraftLake.unclusteredFiles(GraftLake.snapshot(spark, dir)).isEmpty)
  }

  test("autoCompact: appends past the small-file threshold compact " +
    "themselves (clustered tables cluster); off by default; bad values " +
    "rejected") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 512).select((col("id") % 32).as("x"),
      (col("id") % 17).as("y"), col("id").as("p")), dir)
    intercept[IllegalArgumentException] {
      GraftLake.setProperties(spark, dir, Map("autoCompact" -> "yes please"))
    }
    // OFF (default): tiny appends accumulate files one per batch
    (1 to GraftLake.ConsolidateSmallGenerations + 2).foreach { i =>
      spark.range(i * 1000, i * 1000 + 16).select((col("id") % 32).as("x"),
        (col("id") % 17).as("y"), col("id").as("p")).coalesce(1)
        .write.format("graft-lake").mode("append").save(dir)
    }
    val without = GraftLake.snapshot(spark, dir).files.size
    assert(without > GraftLake.ConsolidateSmallGenerations,
      s"without autoCompact the file count must grow: $without")

    // ON + clustered: the tipping append compacts inline and CLUSTERS
    GraftLake.setProperties(spark, dir,
      Map("autoCompact" -> "true", "clusterBy" -> "x,y"))
    spark.range(90000, 90016).select((col("id") % 32).as("x"),
      (col("id") % 17).as("y"), col("id").as("p")).coalesce(1)
      .write.format("graft-lake").mode("append").save(dir)
    val snap = GraftLake.snapshot(spark, dir)
    assert(snap.files.size < without,
      s"the tipping append must auto-compact: ${snap.files.size} vs $without")
    assert(GraftLake.unclusteredFiles(snap).isEmpty,
      "auto-compaction of a clustered table must cluster")
    assert(GraftLake.history(dir).map(_._2).contains("zorder"))
    assert(GraftLake.read(spark, dir).count() ==
      512 + (GraftLake.ConsolidateSmallGenerations + 2) * 16 + 16)

    // steady state: the next small append does NOT re-trigger (census
    // below threshold again)
    val vAfter = GraftLake.latestVersion(dir)
    spark.range(95000, 95016).select((col("id") % 32).as("x"),
      (col("id") % 17).as("y"), col("id").as("p")).coalesce(1)
      .write.format("graft-lake").mode("append").save(dir)
    assert(GraftLake.latestVersion(dir) == vAfter + 1,
      "a below-threshold append must commit exactly once")
  }

  test("autoCompact inline runs are victim-CAPPED: a tipping append on a " +
    "big backlog folds at most AutoCompactMaxVictims files (bounded " +
    "latency), and subsequent appends amortize the rest down") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 64).select(col("id"), col("id").as("v")),
      dir, checkpointEvery = 64)
    val backlog = GraftLake.AutoCompactMaxVictims + 40
    (1 to backlog).foreach { i =>
      spark.range(i * 1000L, i * 1000L + 8)
        .select(col("id"), col("id").as("v")).coalesce(1)
        .write.format("graft-lake").mode("append").save(dir)
    }
    GraftLake.setProperties(spark, dir, Map("autoCompact" -> "true"))
    val before = GraftLake.snapshot(spark, dir).files.size
    spark.range(900000L, 900008L).select(col("id"), col("id").as("v"))
      .coalesce(1).write.format("graft-lake").mode("append").save(dir)
    val after1 = GraftLake.snapshot(spark, dir).files.size
    val folded1 = before - after1
    assert(folded1 > 0 && folded1 <= GraftLake.AutoCompactMaxVictims,
      s"one inline run must fold at most the cap, folded $folded1")
    assert(after1 > GraftLake.ConsolidateSmallGenerations,
      "a capped run on a big backlog must leave remainder for later")
    // the NEXT tipping append folds another capped slice — amortization
    spark.range(910000L, 910008L).select(col("id"), col("id").as("v"))
      .coalesce(1).write.format("graft-lake").mode("append").save(dir)
    val after2 = GraftLake.snapshot(spark, dir).files.size
    assert(after2 < after1, "the backlog must keep amortizing down")
    assert(GraftLake.read(spark, dir).count() ==
      64L + backlog * 8L + 16L, "no rows lost across capped folds")
  }

  test("DESCRIBE DETAIL properties column is VALID JSON even when values " +
    "carry quotes and backslashes") {
    val dir = tmp()
    GraftLake.create(spark.range(0, 8).select(col("id"), col("id").as("v")), dir)
    GraftLake.setProperties(spark, dir,
      Map("note" -> """he said "hi" \ bye""", "team" -> "ml"))
    val props = spark.sql(s"DESCRIBE DETAIL '$dir'").head()
      .getAs[String]("properties")
    val parsed = new com.fasterxml.jackson.databind.ObjectMapper().readTree(props)
    assert(parsed.get("note").asText() == """he said "hi" \ bye""")
    assert(parsed.get("team").asText() == "ml")
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
