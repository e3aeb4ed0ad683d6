package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC changelog application — the lakehouse MERGE/upsert shape: fold a
 * stream of keyed change events (inserts/updates/deletes, each carrying a
 * monotone sequence) into a base snapshot, producing the next snapshot.
 * This is how a 100 TB corpus snapshot is maintained INCREMENTALLY — the
 * alternative (rebuild from scratch per drop) rescans the world.
 *
 * Scale posture: the latest-change-per-key winner is the same skew-safe
 * shape as [[Dedup.exactDedup]] — a narrow `max(struct(seqCols))` aggregate
 * (map-side partial combine collapses a hot key's 10⁸ updates per input
 * partition) hash-joined back to the changelog; NO per-key window/sort
 * anywhere, so full-width rows never pass through a sort buffer. The
 * snapshot side is touched by exactly one anti-join on the key (AQE
 * broadcasts it when the changed-key set is small — the common nightly
 * case), and unchanged rows stream through scan-speed.
 */
object Cdc {

  /**
   * Apply `changes` to `snapshot`. `changes` must carry `keyCols`,
   * `seqCols` (latest wins; the struct must be unique per key — pass a
   * change id as the last element to break ties deterministically),
   * `opCol`, and the full snapshot payload columns for non-delete ops.
   * Per key, only the latest change applies: `deleteOp` removes the key,
   * anything else upserts its payload (insert-or-update — a delete
   * followed by a later insert resurrects the key). Keys without changes
   * carry their snapshot row through untouched.
   */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCols: Seq[String], opCol: String = "op",
      deleteOp: String = "D"): DataFrame = {
    val kAlias = keyCols.indices.map(i => s"__ck$i")
    val latest = changes.groupBy(keyCols.map(col): _*)
      .agg(max(struct(seqCols.map(col): _*)).as("__ms"))
      .select(keyCols.zip(kAlias).map { case (k, a) => col(k).as(a) } :+ col("__ms"): _*)
    // null-safe on both key and seq so a null-keyed change stream still
    // resolves to exactly one winner per key
    val cond = keyCols.zip(kAlias).map { case (k, a) => col(k) <=> col(a) }
      .reduce(_ && _) && (struct(seqCols.map(col): _*) <=> col("__ms"))
    val winners = changes.join(latest.hint("shuffle_hash"), cond)
      .select(changes.columns.map(col): _*)
    val upserts = winners.filter(col(opCol) =!= lit(deleteOp))
      .select(snapshot.columns.map(col): _*)
    // shuffle-hash (not sort-merge): the changed-key side is the build
    // side and neither side ever sorts
    snapshot.join(winners.select(keyCols.map(col): _*).hint("shuffle_hash"),
        keyCols, "left_anti")
      .unionByName(upserts)
  }

  /**
   * Snapshot diff → changelog (the change-data-feed generator, inverse of
   * [[applyChangelog]]): emit one I/U/D row per key whose state differs
   * between `before` and `after` (same schema, unique per key). Keys only
   * in `after` → insert, only in `before` → delete (payload carried from
   * `before`), present in both with ANY payload column differing → update
   * with the new payload. Unchanged keys emit nothing.
   *
   * Round-trip law (spec-enforced): `applyChangelog(before,
   * diffSnapshots(before, after) + any seq) == after`.
   *
   * Scale posture: one full-outer hash join on the key and a null-safe
   * struct comparison — no windows, no sort; at 100 TB this is the
   * standard nightly snapshot-compare shape (both sides shuffle once on
   * the key; AQE handles the size asymmetry).
   */
  def diffSnapshots(before: DataFrame, after: DataFrame,
      keyCols: Seq[String], opCol: String = "op"): DataFrame = {
    require(before.columns.sameElements(after.columns),
      "before/after must share a schema")
    val payload = before.columns.filterNot(keyCols.contains).toSeq
    val b = before.select(struct(keyCols.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__bp"))
    val a = after.select(struct(keyCols.map(col): _*).as("__k"),
      struct(payload.map(col): _*).as("__ap"))
    val joined = b.join(a, Seq("__k"), "full_outer")
    val op = when(col("__bp").isNull, lit("I"))
      .when(col("__ap").isNull, lit("D"))
      .when(!(col("__bp") <=> col("__ap")), lit("U"))
    val diff = joined.filter(op.isNotNull).withColumn(opCol, op)
      // deletes carry the before-image payload (the CDC convention that
      // lets downstream consumers see what was removed)
      .withColumn("__p", coalesce(col("__ap"), col("__bp")))
    diff.select(
      keyCols.map(k => col("__k").getField(k).as(k)) ++
        payload.map(p => col("__p").getField(p).as(p)) :+ col(opCol): _*)
  }

  /**
   * Incremental aggregate maintenance (materialized-view maintenance for
   * SUM/COUNT): given a grouped aggregate `prevAgg` = (groupCol, sum_v, n)
   * over the `before` snapshot, produce the aggregate over `after` WITHOUT
   * rescanning it — the maintenance law `maintainSumCount(agg(before),
   * before, after) == agg(after)` is spec-enforced.
   *
   * Deltas come from one full-outer key join of the snapshots: each
   * changed key contributes (-v, -1) under its before-group and (+v, +1)
   * under its after-group (which handles group REASSIGNMENT — the case a
   * naive per-key value diff silently corrupts), unchanged keys are
   * filtered before the delta shuffle. Groups whose maintained count
   * reaches zero are dropped, so the result is exactly the fresh
   * aggregate, not a zero-row graveyard.
   *
   * Scale posture: at 100 TB the whole point — cost is O(|changed keys|)
   * after the key join, and the delta aggregation is map-side combined;
   * the prevAgg merge is groups-sized. SUM/COUNT (and any abelian-group
   * measure: avg = sum/n, variance via sum of squares) maintain this way;
   * MIN/MAX do not (deletes need a rescan) — use [[applyChangelog]] +
   * re-aggregate for those.
   */
  def maintainSumCount(prevAgg: DataFrame, before: DataFrame,
      after: DataFrame, keyCols: Seq[String], groupCol: String,
      valueCol: String): DataFrame = {
    val b = before.select(struct(keyCols.map(col): _*).as("__k"),
      struct(col(groupCol), col(valueCol)).as("__b"))
    val a = after.select(struct(keyCols.map(col): _*).as("__k"),
      struct(col(groupCol), col(valueCol)).as("__a"))
    val changed = b.join(a, Seq("__k"), "full_outer")
      .filter(!(col("__b") <=> col("__a")))
    val minus = changed.filter(col("__b").isNotNull).select(
      col("__b").getField(groupCol).as(groupCol),
      (-col("__b").getField(valueCol)).as("__dv"), lit(-1L).as("__dn"))
    val plus = changed.filter(col("__a").isNotNull).select(
      col("__a").getField(groupCol).as(groupCol),
      col("__a").getField(valueCol).as("__dv"), lit(1L).as("__dn"))
    val deltas = minus.unionByName(plus).groupBy(col(groupCol))
      .agg(sum(col("__dv")).as("__dv"), sum(col("__dn")).as("__dn"))
    prevAgg.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("__dv"), lit(0L)))
          .as("sum_v"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n"))
      .filter(col("n") > 0)
  }

  /**
   * Incremental MOMENT-SUM maintenance — [[maintainSumCount]] generalized
   * to the five bivariate moments (n, Σx, Σy, Σx², Σy², Σxy), which is
   * exactly the state [[graft.ops.Stats.olsRegression]] and
   * [[graft.ops.Stats.corrMatrix]] finish from: maintain the sums from
   * snapshot deltas, re-run only the (groups-sized) closed-form finish,
   * and the regression/correlation over a 100 TB table stays current at
   * O(|changed keys|) per refresh — no rescan. Moments are an abelian
   * group under row insert/delete (every term is ±), so the same
   * before-group-minus / after-group-plus delta shape applies, including
   * group reassignment.
   *
   * `prevAgg` must carry (groupCol, n, sx, sy, sxx, syy, sxy) as produced
   * by the same integer-scaled projection, and `keyCols` must uniquely
   * identify rows in BOTH snapshots (a non-key explodes the full-outer
   * key join and corrupts the deltas); the maintenance law
   * `maintainMoments(agg(before), before, after) == agg(after)` is
   * spec-enforced and oracle-gated through the regression finish.
   */
  def maintainMoments(prevAgg: DataFrame, before: DataFrame,
      after: DataFrame, keyCols: Seq[String], groupCol: String,
      xCol: String, yCol: String): DataFrame = {
    val b = before.select(struct(keyCols.map(col): _*).as("__k"),
      struct(col(groupCol), col(xCol).cast("long").as(xCol),
        col(yCol).cast("long").as(yCol)).as("__b"))
    val a = after.select(struct(keyCols.map(col): _*).as("__k"),
      struct(col(groupCol), col(xCol).cast("long").as(xCol),
        col(yCol).cast("long").as(yCol)).as("__a"))
    val changed = b.join(a, Seq("__k"), "full_outer")
      .filter(!(col("__b") <=> col("__a")))
    def side(c: String, sign: Long): DataFrame = {
      val x = changed(c).getField(xCol)
      val y = changed(c).getField(yCol)
      changed.filter(col(c).isNotNull).select(
        col(c).getField(groupCol).as(groupCol), lit(sign).as("__dn"),
        (lit(sign) * x).as("__dx"), (lit(sign) * y).as("__dy"),
        (lit(sign) * x * x).as("__dxx"), (lit(sign) * y * y).as("__dyy"),
        (lit(sign) * x * y).as("__dxy"))
    }
    val deltas = side("__b", -1L).unionByName(side("__a", 1L))
      .groupBy(col(groupCol))
      .agg(sum(col("__dn")).as("__dn"), sum(col("__dx")).as("__dx"),
        sum(col("__dy")).as("__dy"), sum(col("__dxx")).as("__dxx"),
        sum(col("__dyy")).as("__dyy"), sum(col("__dxy")).as("__dxy"))
    def upd(prev: String, d: String) =
      (coalesce(col(prev), lit(0L)) + coalesce(col(d), lit(0L))).as(prev)
    prevAgg.join(deltas, Seq(groupCol), "full_outer")
      .select(col(groupCol), upd("n", "__dn"), upd("sx", "__dx"),
        upd("sy", "__dy"), upd("sxx", "__dxx"), upd("syy", "__dyy"),
        upd("sxy", "__dxy"))
      .filter(col("n") > 0)
  }
}
