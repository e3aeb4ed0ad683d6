package graft.sources

import scala.collection.mutable

import graft.SparkSpec
import graft.sources.lake.GraftLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Model-based torture test for the ACID layer: a seeded random program of
 * append / CoW delete / merge / general MERGE INTO (conditional
 * update/delete/insert clauses, sometimes NOT MATCHED BY SOURCE) /
 * optimize / z-order / restore / merge-on-read delete+update runs against
 * the lake AND an in-memory reference model; after every committed
 * version the table must equal the model exactly, and random past
 * versions must time-travel to the model's state at that version. A
 * checkpoint cadence of 3 keeps the log-checkpoint fold in the loop for
 * essentially every read. This is the test that catches protocol bugs no
 * single-scenario spec would — victim mis-selection, replay off-by-one,
 * checkpoint/tail boundary faults, restore against an evolved file set.
 */
class LakeModelSpec extends SparkSpec {

  import spark.implicits._

  private type Row3 = (Long, String, Long)

  private def toDf(rows: Seq[Row3]): DataFrame =
    rows.toDF("id", "tag", "v")

  private def tableRows(dir: String, asOf: Option[Long] = None): Set[Row3] =
    GraftLake.read(spark, dir, asOf)
      .select("id", "tag", "v").as[Row3].collect().toSet

  test("40 random DML ops track the reference model at every version") {
    val rnd = new scala.util.Random(20260815L)
    val dir = java.nio.file.Files.createTempDirectory("graft_lake_model").toString + "/t"
    var nextId = 0L
    def freshRows(n: Int, tag: String): Seq[Row3] = {
      val rows = (0 until n).map(i => (nextId + i, tag, rnd.nextInt(1000).toLong))
      nextId += n
      rows
    }

    val model = mutable.Map.empty[Long, Row3]
    val init = freshRows(200, "init")
    GraftLake.create(toDf(init).repartitionByRange(4, col("id")), dir,
      checkpointEvery = 3)
    init.foreach(r => model(r._1) = r)
    // model state per committed version, for time-travel replay checks
    val versions = mutable.ArrayBuffer[Map[Long, Row3]](model.toMap)

    def check(op: String): Unit = {
      val v = GraftLake.latestVersion(dir)
      // a step may land 0, 1 or 2 commits (a metadata set-properties
      // before its layout op); every intermediate version carries the
      // same content as the step's end state, so replaying the current
      // model for each is exact
      while (versions.size.toLong <= v) versions += model.toMap
      assert(v == versions.size - 1, s"version bookkeeping after $op")
      assert(tableRows(dir) == model.values.toSet, s"model mismatch after $op (v$v)")
    }

    for (step <- 1 to 44) {
      rnd.nextInt(10) match {
        case 0 => // append
          val rows = freshRows(20 + rnd.nextInt(40), s"a$step")
          GraftLake.append(toDf(rows), dir, numFiles = 1 + rnd.nextInt(3))
          rows.foreach(r => model(r._1) = r)
          check(s"append@$step")
        case 1 => // CoW delete by modular predicate
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          GraftLake.delete(spark, dir, col("id") % m === r)
          model.keys.filter(_ % m == r).toSeq.foreach(model.remove)
          check(s"delete@$step")
        case 2 => // merge: update a sample of live keys + insert fresh ones
          val updKeys = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(30))
          val upd = updKeys.map(k => (k, s"u$step", rnd.nextInt(1000).toLong))
          val ins = freshRows(rnd.nextInt(10), s"i$step")
          val all = upd ++ ins
          if (all.nonEmpty) {
            GraftLake.merge(spark, dir, toDf(all), "id")
            all.foreach(r => model(r._1) = r)
            check(s"merge@$step")
          }
        case 3 => // optimize: layout only — sometimes under a clusterBy
          // property (incremental clustering + DV purge interleaved with
          // every other op; the model can't tell layouts apart, which is
          // the contract)
          if (rnd.nextBoolean())
            GraftLake.setProperties(spark, dir, Map("clusterBy" -> "id,v"))
          else
            GraftLake.setProperties(spark, dir, Map.empty,
              unsets = Seq("clusterBy"))
          GraftLake.optimize(spark, dir, smallBytes = 1L << 20, targetBytes = 1L << 20)
          check(s"optimize@$step")
        case 4 => // z-order: layout only
          GraftLake.optimizeZOrder(spark, dir, "id", "v", numFiles = 2 + rnd.nextInt(3))
          check(s"zorder@$step")
        case 5 => // restore to a random past version
          val target = rnd.nextInt(versions.size).toLong
          GraftLake.restore(spark, dir, target)
          model.clear(); versions(target.toInt).foreach { case (k, r) => model(k) = r }
          check(s"restore($target)@$step")
        case 6 => // general MERGE INTO: conditional update/delete/insert,
          // sometimes NOT MATCHED BY SOURCE (whole-table victim path)
          val matchedKeys = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(25))
          val srcRows = matchedKeys.map(k =>
            (k, s"m$step", rnd.nextInt(1000).toLong)) ++
            freshRows(rnd.nextInt(8), s"mi$step")
          if (srcRows.nonEmpty) {
            val nmbs =
              if (step % 3 == 0)
                Seq(GraftLake.MatchedUpdate(Some(col("t.v") < 50L),
                  Seq("tag" -> lit(s"nms$step"))))
              else Nil
            GraftLake.mergeInto(spark, dir, toDf(srcRows),
              condition = col("t.id") === col("s.id"),
              matched = Seq(
                GraftLake.MatchedUpdate(Some(col("s.v") % 3 =!= 0),
                  Seq("tag" -> col("s.tag"), "v" -> (col("s.v") + 10000L))),
                GraftLake.MatchedDelete(None)),
              notMatched = Seq(GraftLake.NotMatchedInsert(
                Some(col("s.v") % 4 =!= 1),
                Seq("id" -> col("s.id"), "tag" -> col("s.tag"),
                  "v" -> col("s.v")))),
              notMatchedBySource = nmbs)
            val srcKeys = srcRows.map(_._1).toSet
            srcRows.foreach { case (k, tag, sv) =>
              if (model.contains(k)) {
                if (sv % 3 != 0) model(k) = (k, tag, sv + 10000L)
                else model.remove(k)
              } else if (sv % 4 != 1) model(k) = (k, tag, sv)
            }
            if (nmbs.nonEmpty)
              model.keys.toSeq.filterNot(srcKeys).foreach { k =>
                val (_, _, v) = model(k)
                if (v < 50L) model(k) = (k, s"nms$step", v)
              }
            check(s"mergeInto@$step")
          }
        case 7 => // merge-on-read delete: deletion vectors, no rewrite.
          // Semantically identical to CoW delete — the model can't tell
          // them apart, which is exactly the contract: every later read,
          // optimize, restore, merge, or time travel over the DV'd files
          // must behave as if the rows were physically gone.
          val m = 2 + rnd.nextInt(5); val r = rnd.nextInt(m)
          GraftLake.deleteMoR(spark, dir, col("id") % m === r && col("v") < 800L)
          model.toSeq.filter { case (k, (_, _, v)) => k % m == r && v < 800L }
            .foreach { case (k, _) => model.remove(k) }
          check(s"deleteMoR@$step")
        case 8 => // merge-on-read update: DV old rows + append new rows
          val m = 2 + rnd.nextInt(4); val r = rnd.nextInt(m)
          GraftLake.updateMoR(spark, dir, col("id") % m === r,
            Seq("tag" -> lit(s"um$step"), "v" -> (col("v") + 2000L)))
          model.toSeq.filter { case (k, _) => k % m == r }.foreach {
            case (k, (_, _, v)) => model(k) = (k, s"um$step", v + 2000L)
          }
          check(s"updateMoR@$step")
        case 9 => // merge-on-read MERGE: fired rows vectored + appended,
          // unfired matched rows keep their place — must be
          // indistinguishable from the CoW merge to the model
          val matchedKeys = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(25))
          val srcRows = matchedKeys.map(k =>
            (k, s"mm$step", rnd.nextInt(1000).toLong)) ++
            freshRows(rnd.nextInt(8), s"mmi$step")
          if (srcRows.nonEmpty) {
            GraftLake.mergeIntoMoR(spark, dir, toDf(srcRows),
              condition = col("t.id") === col("s.id"),
              matched = Seq(
                GraftLake.MatchedUpdate(Some(col("s.v") % 3 =!= 0),
                  Seq("tag" -> col("s.tag"), "v" -> (col("s.v") + 10000L))),
                GraftLake.MatchedDelete(Some(col("s.v") % 7 === 0))),
              notMatched = Seq(GraftLake.NotMatchedInsert(
                Some(col("s.v") % 4 =!= 1),
                Seq("id" -> col("s.id"), "tag" -> col("s.tag"),
                  "v" -> col("s.v")))))
            srcRows.foreach { case (k, tag, sv) =>
              if (model.contains(k)) {
                if (sv % 3 != 0) model(k) = (k, tag, sv + 10000L)
                else if (sv % 7 == 0) model.remove(k)
                // else: no clause fires — row keeps its place untouched
              } else if (sv % 4 != 1) model(k) = (k, tag, sv)
            }
            check(s"mergeMoR@$step")
          }
      }
      if (step % 5 == 0) { // time travel spot-check against the model history
        val v = rnd.nextInt(versions.size)
        assert(tableRows(dir, Some(v.toLong)) == versions(v).values.toSet,
          s"time travel to v$v diverged from the model at step $step")
      }
    }
    assert(GraftLake.latestVersion(dir) >= 20L, "the program actually committed")
    // final global audit: every recorded version still replays exactly
    val sample = rnd.shuffle(versions.indices.toList).take(6)
    sample.foreach { v =>
      assert(tableRows(dir, Some(v.toLong)) == versions(v).values.toSet,
        s"final audit: v$v diverged")
    }
    // CDC-reconstruction audit: for random version pairs a < b, the
    // snapshot at a PLUS the net change feed (a, b] must reconstruct the
    // snapshot at b exactly — ONE invariant binding every op the random
    // program took (CoW/MoR delete-update-merge, optimize, zorder,
    // restore, appends) through the change-feed lens. A feed that
    // over-reports cancels wrongly; one that under-reports loses rows.
    (1 to 5).foreach { _ =>
      val b = 1 + rnd.nextInt(versions.size - 1)
      val a = rnd.nextInt(b)
      val ch = GraftLake.changes(spark, dir, a.toLong, b.toLong)
      val ins = ch.filter(col("change_kind") === "insert")
        .select("id", "tag", "v").as[Row3].collect().toSet
      val del = ch.filter(col("change_kind") === "delete")
        .select("id", "tag", "v").as[Row3].collect().toSet
      val reconstructed = (versions(a).values.toSet -- del) ++ ins
      assert(reconstructed == versions(b).values.toSet,
        s"CDC replay $a -> $b diverged (${ins.size} ins, ${del.size} del)")
    }
  }
}
