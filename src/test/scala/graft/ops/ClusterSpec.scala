package graft.ops

import graft.SparkSpec

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connected components label every node with its cluster minimum") {
    // two chains (diameter > 1) and one pair, arbitrary pair direction
    val pairs = Seq(
      (2L, 1L), (2L, 3L), // {1,2,3}
      (10L, 11L), // {10,11}
      (31L, 30L), (31L, 32L), (32L, 33L), (33L, 34L) // {30..34}
    ).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L, 34L -> 30L))
  }
}
