package graft.ops

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed range join = exact inequality join, including bucket-straddling intervals") {
    val points = Seq((1L, 5L), (1L, 10L), (1L, 99L), (2L, 10L))
      .toDF("k", "t")
    // interval [8, 25) straddles bucket width 10; [0, 10) ends on a boundary
    val ivals = Seq((1L, 0L, 10L, "early"), (1L, 8L, 25L, "straddle"),
      (2L, 50L, 60L, "other"))
      .toDF("k", "s", "e", "tag")
    val got = RangeJoin.byBucket(points, ivals, Seq("k"), "t", "s", "e", bucketMs = 10L)
      .select("k", "t", "tag").as[(Long, Long, String)].collect().toSet
    // truth = the plain (nested-loop) inequality join
    val truth = points.join(ivals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("k", "t", "tag").as[(Long, Long, String)].collect().toSet
    assert(got == truth)
    assert(got.contains((1L, 10L, "straddle")))
    assert(!got.exists { case (_, t, tag) => t == 10L && tag == "early" })
  }

  test("intervalOverlap: touching endpoints excluded, containment and " +
      "multi-bucket spans emitted exactly once") {
    val a = Seq(
      (1L, 1L, 0L, 100L),    // overlaps b1 ([50,150)) across 2 buckets
      (2L, 1L, 100L, 200L),  // touches b1's end at 150 → overlap [100,150)
      (3L, 1L, 200L, 300L),  // touches b2 ([300,400)) only at the point → NO
      (4L, 1L, 0L, 1000L),   // contains everything on key 1
      (5L, 2L, 0L, 1000L)    // other key: never joins key 1
    ).toDF("a_id", "k", "as", "ae")
    val b = Seq((10L, 1L, 50L, 150L), (11L, 1L, 300L, 400L))
      .toDF("b_id", "k", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, Seq("k"), "as", "ae", "bs", "be",
        bucketMs = 64L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // exactly-once even though e.g. (4,10) co-occupies several buckets
    assert(got.size == got.distinct.size)
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (4L, 10L), (4L, 11L)))
  }

  test("intervalOverlap random cross-check vs quadratic predicate join") {
    val a = (1 to 400).map { i =>
      val s = (i * 53) % 900
      ((i % 5).toLong, i.toLong, s.toLong, (s + 1 + i % 80).toLong)
    }.toDF("k", "a_id", "as", "ae")
    val b = (1 to 400).map { i =>
      val s = (i * 89) % 900
      ((i % 5).toLong, i.toLong, s.toLong, (s + 1 + i % 50).toLong)
    }.toDF("k", "b_id", "bs", "be")
    val got = RangeJoin.intervalOverlap(a, b, Seq("k"), "as", "ae", "bs", "be",
        bucketMs = 37L)
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    val truth = a.join(b, Seq("k"))
      .filter($"as" < $"be" && $"bs" < $"ae")
      .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got == truth)
  }

  test("random cross-check vs inequality join") {
    val points = (1 to 2000).map(i => ((i % 7).toLong, (i * 37 % 1000).toLong))
      .toDF("k", "t")
    val ivals = (1 to 300).map { i =>
      val s = (i * 91) % 950
      ((i % 7).toLong, s.toLong, (s + 1 + (i % 60)).toLong, i)
    }.toDF("k", "s", "e", "iv")
    val got = RangeJoin.byBucket(points, ivals, Seq("k"), "t", "s", "e", bucketMs = 32L)
      .select("k", "t", "iv").as[(Long, Long, Int)].collect().sorted.toSeq
    val truth = points.join(ivals, Seq("k"))
      .filter($"t" >= $"s" && $"t" < $"e")
      .select("k", "t", "iv").as[(Long, Long, Int)].collect().sorted.toSeq
    assert(got == truth)
  }
}
