package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot = Seq(
    (1L, "alice", 100L),
    (2L, "bob", 200L),
    (3L, "carol", 300L),
    (4L, "dave", 400L)
  ).toDF("id", "name", "balance")

  test("applyChangelog: insert, update, delete, latest-wins, resurrection") {
    val changes = Seq(
      // plain update
      (1L, 1L, "U", "alice2", 150L),
      // latest-wins: seq 2 overrides seq 1
      (2L, 1L, "U", "bob-stale", 201L),
      (2L, 2L, "U", "bob-new", 250L),
      // delete
      (3L, 1L, "D", "", 0L),
      // resurrection: delete overridden by a later insert
      (4L, 1L, "D", "", 0L),
      (4L, 2L, "I", "dave2", 999L),
      // insert of a key absent from the snapshot
      (5L, 1L, "I", "eve", 500L),
      // delete of a key absent from the snapshot: no-op
      (6L, 1L, "D", "", 0L)
    ).toDF("id", "seq", "op", "name", "balance")

    val out = Cdc.applyChangelog(snapshot, changes, Seq("id"), Seq("seq"))
      .orderBy("id")
      .as[(Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "alice2", 150L),
      (2L, "bob-new", 250L),
      (4L, "dave2", 999L),
      (5L, "eve", 500L)))
  }

  test("applyChangelog: empty changelog is the identity") {
    val changes = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("id", "seq", "op", "name", "balance")
    val out = Cdc.applyChangelog(snapshot, changes, Seq("id"), Seq("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(out == Seq((1L, "alice", 100L), (2L, "bob", 200L),
      (3L, "carol", 300L), (4L, "dave", 400L)))
  }

  test("diffSnapshots: I/U/D classification, before-image deletes, " +
      "unchanged keys silent") {
    val before = snapshot
    val after = Seq(
      (1L, "alice", 100L),   // unchanged → no row
      (2L, "bob2", 200L),    // payload change → U
      (3L, "carol", 999L),   // payload change → U
      (5L, "eve", 500L)      // new → I   (4 dave missing → D)
    ).toDF("id", "name", "balance")
    val got = Cdc.diffSnapshots(before, after, Seq("id"))
      .as[(Long, String, Long, String)].collect().toSet
    assert(got == Set(
      (2L, "bob2", 200L, "U"),
      (3L, "carol", 999L, "U"),
      (4L, "dave", 400L, "D"),
      (5L, "eve", 500L, "I")))
  }

  test("round-trip law: applyChangelog(before, diffSnapshots(before, " +
      "after)) == after") {
    val before = snapshot
    val after = Seq((2L, "bob2", 250L), (3L, "carol", 300L),
      (6L, "frank", 600L)).toDF("id", "name", "balance")
    val feed = Cdc.diffSnapshots(before, after, Seq("id"))
      .withColumn("seq", lit(1L))
    val rebuilt = Cdc.applyChangelog(before, feed, Seq("id"), Seq("seq"))
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val want = after.orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(rebuilt == want)
  }

  test("maintainSumCount: maintenance law == fresh aggregate, including " +
      "group reassignment, deletes, inserts, emptied groups") {
    import org.apache.spark.sql.DataFrame
    val before = Seq(
      (1L, "g1", 10L), (2L, "g1", 20L), (3L, "g2", 30L), (4L, "g3", 40L)
    ).toDF("id", "grp", "v")
    val after = Seq(
      (1L, "g1", 15L),  // value change within group
      (2L, "g2", 20L),  // group REASSIGNMENT g1 → g2
      (4L, "g3", 40L),  // unchanged          (3 deleted → g2 loses 30)
      (5L, "g4", 50L)   // insert into a new group
    ).toDF("id", "grp", "v")
    def agg(df: DataFrame) = df.groupBy("grp")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
    val maintained = Cdc.maintainSumCount(agg(before), before, after,
        Seq("id"), "grp", "v")
      .as[(String, Long, Long)].collect().toSet
    val fresh = agg(after).as[(String, Long, Long)].collect().toSet
    assert(maintained == fresh)
    assert(maintained == Set(("g1", 15L, 1L), ("g2", 20L, 1L),
      ("g3", 40L, 1L), ("g4", 50L, 1L)))
    // emptying a group drops it: delete everything in g1
    val after2 = after.filter(col("grp") =!= "g1")
    val m2 = Cdc.maintainSumCount(agg(after), after, after2,
        Seq("id"), "grp", "v")
      .as[(String, Long, Long)].collect().toSet
    assert(m2 == agg(after2).as[(String, Long, Long)].collect().toSet)
    assert(!m2.exists(_._1 == "g1"))
  }

  test("maintainMoments law: maintained sums == fresh aggregate under churn") {
    val rnd = new scala.util.Random(41)
    val before = (1L to 500L).map(i =>
      (i, s"g${i % 4}", rnd.nextInt(50).toLong, rnd.nextInt(1000).toLong))
      .toDF("id", "g", "x", "y")
    // churn: delete %7, update x/y on %3, REASSIGN group on %11, insert new
    val after = before
      .filter($"id" % 7 =!= 0)
      .select($"id",
        when($"id" % 11 === 0, lit("gNew")).otherwise($"g").as("g"),
        when($"id" % 3 === 0, $"x" + 5L).otherwise($"x").as("x"),
        when($"id" % 3 === 0, $"y" - 9L).otherwise($"y").as("y"))
      .unionByName(Seq((9001L, "g0", 7L, 11L), (9002L, "gNew", 1L, 2L))
        .toDF("id", "g", "x", "y"))
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy($"g").agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    val maintained = Cdc.maintainMoments(agg(before), before, after,
        Seq("id"), "g", "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    val fresh = agg(after)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(maintained == fresh)
    assert(maintained.exists(_._1 == "gNew"))
  }

  test("maintainMoments: emptied groups vanish instead of lingering at n=0") {
    val before = Seq((1L, "solo", 3L, 4L), (2L, "keep", 1L, 1L))
      .toDF("id", "g", "x", "y")
    val after = Seq((2L, "keep", 1L, 1L)).toDF("id", "g", "x", "y")
    def agg(df: org.apache.spark.sql.DataFrame) = df.groupBy($"g").agg(
      count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
      sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
      sum($"x" * $"y").as("sxy"))
    val m = Cdc.maintainMoments(agg(before), before, after,
        Seq("id"), "g", "x", "y")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(m == Seq(("keep", 1L, 1L, 1L, 1L, 1L, 1L)))
  }

  test("applyChangelog plan: winner is a partial-agg + hash join, no window") {
    val changes = Seq((1L, 1L, "U", "a", 1L))
      .toDF("id", "seq", "op", "name", "balance")
    val plan = Cdc.applyChangelog(snapshot, changes, Seq("id"), Seq("seq"))
      .queryExecution.executedPlan.toString
    // a hot key (10^8 updates in one changelog) must collapse map-side:
    // partial max over narrow (key, seq) rows, hash joins, no window —
    // the exactDedup skew posture (full-width rows never pass a sort)
    assert(plan.contains("partial_max"), s"expected partial max aggregate:\n$plan")
    assert(!plan.contains("Window"), s"expected no window:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"expected hash joins:\n$plan")
  }
}
