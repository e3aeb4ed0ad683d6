package graft.ops

import graft.SparkSpec

class AsofSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of: greatest right time <= left time, inclusive ties, null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (1L, 2L, "d"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 3L, 100), (1L, 10L, 200), (2L, 99L, 300))
      .toDF("k", "rt", "rv")
    val got = Asof.joinBackward(left, right, "k", "t", "rt")
      .as[(Long, Long, String, Option[Int])].collect().toSet
    // mirrors the DuckDB ASOF LEFT JOIN reference on the same rows
    assert(got == Set(
      (1L, 2L, "d", None), // no right row at or before t=2
      (1L, 5L, "b", Some(100)), // rt=3
      (1L, 10L, "a", Some(200)), // tie rt=10 matches (inclusive)
      (2L, 7L, "c", None))) // 2's only right row is later
  }

  test("one shuffle, no pair explosion: row count equals the left side") {
    val left = (1 to 1000).map(i => (i % 10L, i.toLong, i)).toDF("k", "t", "lv")
    val right = (1 to 500).map(i => (i % 10L, i.toLong * 2, i)).toDF("k", "rt", "rv")
    val out = Asof.joinBackward(left, right, "k", "t", "rt")
    assert(out.count() == 1000)
  }

  test("forward as-of: smallest right time >= left time, inclusive ties, null when none") {
    val left = Seq((1L, 10L, "a"), (1L, 5L, "b"), (2L, 7L, "c"), (1L, 2L, "d"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 3L, 100), (1L, 10L, 200), (2L, 99L, 300), (2L, 5L, 400))
      .toDF("k", "rt", "rv")
    val got = Asof.joinForward(left, right, "k", "t", "rt")
      .as[(Long, Long, String, Option[Int])].collect().toSet
    assert(got == Set(
      (1L, 2L, "d", Some(100)),  // next at rt=3
      (1L, 5L, "b", Some(200)),  // next at rt=10
      (1L, 10L, "a", Some(200)), // tie rt=10 matches (inclusive)
      (2L, 7L, "c", Some(300)))) // rt=5 is in the past; next is 99
  }

  test("forward ≡ backward under time negation (duality cross-check)") {
    import org.apache.spark.sql.functions._
    val left = (1 to 400).map(i => ((i % 7).toLong, (i * 13 % 101).toLong, i))
      .toDF("k", "t", "lv")
    val right = (1 to 200).map(i => ((i % 7).toLong, (i * 29 % 97).toLong, i))
      .toDF("k", "rt", "rv")
    // dedupe right per (k, rt): the contract requires uniqueness for
    // determinism, and negation must compare like against like
    val r1 = right.groupBy("k", "rt").agg(max("rv").as("rv"))
    val fwd = Asof.joinForward(left, r1, "k", "t", "rt")
      .select("k", "t", "lv", "rv")
      .as[(Long, Long, Int, Option[Int])].collect().toSet
    val bwdNeg = Asof.joinBackward(
      left.withColumn("t", -col("t")),
      r1.withColumn("rt", -col("rt")), "k", "t", "rt")
      .select(col("k"), -col("t"), col("lv"), col("rv"))
      .as[(Long, Long, Int, Option[Int])].collect().toSet
    assert(fwd == bwdNeg)
  }

  test("clashing value-column names are rejected") {
    val df = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Asof.joinBackward(df, df.withColumnRenamed("t", "rt"), "k", "t", "rt")
    }
  }

  test("interpolateAt: midpoint, exact hit, flat one-sided fills, no-obs null") {
    import spark.implicits._
    // key 1: obs (100 → 10.0), (200 → 30.0); key 2: single obs; key 3: none
    val obs = Seq((1L, 100L, 10.0), (1L, 200L, 30.0), (2L, 500L, 7.0))
      .toDF("k", "ot", "v")
    val grid = Seq((1L, 150L), (1L, 100L), (1L, 50L), (1L, 250L),
      (2L, 400L), (2L, 600L), (3L, 100L)).toDF("k", "gt")
    val got = Asof.interpolateAt(grid, obs, "k", "gt", "ot", "v")
      .select("k", "gt", "value")
      .as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 150L)) == Some(20.0)) // midpoint of 10 and 30
    assert(got((1L, 100L)) == Some(10.0)) // exact hit
    assert(got((1L, 50L)) == Some(10.0))  // before first obs → flat forward
    assert(got((1L, 250L)) == Some(30.0)) // after last obs → flat backward
    assert(got((2L, 400L)) == Some(7.0))
    assert(got((2L, 600L)) == Some(7.0))
    assert(got((3L, 100L)) == None)       // no observations at all
  }

  test("interpolateAt: quarter-point weights and bracketing timestamps") {
    import spark.implicits._
    val obs = Seq((1L, 0L, 0.0), (1L, 400L, 100.0)).toDF("k", "ot", "v")
    val grid = Seq((1L, 100L), (1L, 300L)).toDF("k", "gt")
    val got = Asof.interpolateAt(grid, obs, "k", "gt", "ot", "v")
      .select("k", "gt", "prev_t", "next_t", "value")
      .as[(Long, Long, Option[Long], Option[Long], Option[Double])]
      .collect().map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(got(100L) == ((Some(0L), Some(400L), Some(25.0))))
    assert(got(300L) == ((Some(0L), Some(400L), Some(75.0))))
  }
}
