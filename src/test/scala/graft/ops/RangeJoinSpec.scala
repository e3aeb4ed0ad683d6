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
