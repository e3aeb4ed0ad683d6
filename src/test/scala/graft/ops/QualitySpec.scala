package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("checkColumns: one scan, per-constraint violation counts and verdicts") {
    val df = Seq(
      (1L, Some(10), "ok"),
      (2L, None, "ok"),
      (3L, Some(-5), "bad"),
      (4L, Some(7), "ok")
    ).toDF("id", "v", "status")
    val out = Quality.checkColumns(df, Seq(
      "not_null(v)" -> col("v").isNull,
      "positive(v)" -> (col("v") <= 0),
      "accepted(status)" -> !col("status").isin("ok")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("not_null(v)") == ((1L, 4L, false)))
    // NULL <= 0 is NULL, not true: the null row does not count as
    // non-positive — constraints are independent by design
    assert(out("positive(v)") == ((1L, 4L, false)))
    assert(out("accepted(status)") == ((1L, 4L, false)))
  }

  test("checkColumns plan: all constraints fold into a single aggregate") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    val plan = Quality.checkColumns(df, Seq(
      "c1" -> col("a").isNull, "c2" -> (col("b") < 0)))
      .queryExecution.executedPlan.toString
    // one scan feeding one aggregate; no join of per-constraint subplans
    assert(!plan.contains("Join"), s"expected single-pass aggregation:\n$plan")
  }

  test("checkUnique: counts rows beyond the first per duplicated key") {
    val df = Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L), (2L, 1L), (2L, 1L))
      .toDF("k1", "k2")
    val r = Quality.checkUnique(df, Seq("k1", "k2")).collect().head
    assert(r.getString(0) == "unique(k1,k2)")
    assert((r.getLong(1), r.getLong(2), r.getBoolean(3)) == ((3L, 6L, false)))
  }

  test("madOutlierStats: hand-computed discrete medians and outlier flags") {
    // group A values: 1,2,3,4,100 → n=5, ⌈5/2⌉=3 → median=3;
    // deviations 2,1,0,1,97 → sorted 0,1,1,2,97 → MAD=1;
    // outliers: |v-3| > 5·1 → only 100. Group B: constant → MAD 0,
    // every deviation 0 → no outliers (0 > 0 is false).
    val df = Seq(("A", 1L), ("A", 2L), ("A", 3L), ("A", 4L), ("A", 100L),
      ("B", 7L), ("B", 7L), ("B", 7L)).toDF("g", "v")
    val out = Quality.madOutlierStats(df, "g", "v", k = 5)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("A") == ((5L, 3L, 1L, 1L)))
    assert(out("B") == ((3L, 7L, 0L, 0L)))
  }

  test("scd2Intervals: hand-computed runs, open current interval") {
    val e = Seq(
      // user 1: A A B A — runs [A x2], [B x1], [A x1 current]
      (1L, 1L, "A", 100L), (1L, 2L, "A", 200L),
      (1L, 3L, "B", 300L), (1L, 4L, "A", 400L),
      // user 2: single run, stays open
      (2L, 5L, "C", 50L), (2L, 6L, "C", 60L)
    ).toDF("user_id", "event_id", "event_type", "ts_ms")
    val out = Quality.scd2Intervals(e, "user_id", "ts_ms", "event_id", "event_type")
      .orderBy("user_id", "valid_from_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "A", 100L, Some(300L), 2L),
      (1L, "B", 300L, Some(400L), 1L),
      (1L, "A", 400L, None, 1L),
      (2L, "C", 50L, None, 2L)))
  }

  test("scd2Intervals: same-timestamp events break ties on the id column") {
    val e = Seq((1L, 10L, "X", 100L), (1L, 11L, "Y", 100L))
      .toDF("user_id", "event_id", "event_type", "ts_ms")
    val out = Quality.scd2Intervals(e, "user_id", "ts_ms", "event_id", "event_type")
      .orderBy("valid_from_ms", "value")
      .collect().map(r => (r.getString(1), if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // X (id 10) precedes Y (id 11): X closes at 100, Y stays open
    assert(out.toSeq == Seq(("X", Some(100L)), ("Y", None)))
  }
}
