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

  test("a 64-node path converges within maxIter=20 (pointer-jump proof)") {
    // Worst case for plain min-label propagation: a single path labeled
    // against the propagation direction needs diameter (=63) rounds — far
    // over maxIter. The hash-to-min pointer jump must converge it in
    // O(log diameter); if the jump ever regresses to plain propagation,
    // this returns wrong labels at iteration cutoff and fails.
    val pairs = (1L until 64L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(pairs, maxIter = 20)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 64)
    assert(got.values.forall(_ == 1L),
      s"path not fully converged: ${got.filter(_._2 != 1L)}")
  }
}
