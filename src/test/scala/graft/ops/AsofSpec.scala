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

  test("clashing value-column names are rejected") {
    val df = Seq((1L, 1L, "x")).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      Asof.joinBackward(df, df.withColumnRenamed("t", "rt"), "k", "t", "rt")
    }
  }
}
