package graft.ops

import graft.SparkSpec

class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  // bipartite: customers 1..4, items 10..13
  //   item 10: {1,2,3}   item 11: {1,2,4}   item 12: {1,2,3,4}   item 13: {4}
  private val edges = Seq(
    (1L, 10L), (2L, 10L), (3L, 10L),
    (1L, 11L), (2L, 11L), (4L, 11L),
    (1L, 12L), (2L, 12L), (3L, 12L), (4L, 12L),
    (4L, 13L)).toDF("cust", "item")

  test("neighborJaccard: hand-computed intersections and integer-ratio scores") {
    val got = Graph.neighborJaccard(edges, "cust", "item", minCommon = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    // (10,11): common {1,2}=2, union 3+3-2=4 -> 500000
    // (10,12): common {1,2,3}=3, union 3+4-3=4 -> 750000
    // (11,12): common {1,2,4}=3, union 3+4-3=4 -> 750000
    assert(got == Set((10L, 11L, 2L, 500000L), (10L, 12L, 3L, 750000L),
      (11L, 12L, 3L, 750000L)))
  }

  test("duplicate incidence rows do not inflate counts") {
    val dup = edges.union(edges)
    val got = Graph.neighborJaccard(dup, "cust", "item", minCommon = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2, t._3)) ==
      Set((10L, 11L, 2L), (10L, 12L, 3L), (11L, 12L, 3L)))
  }

  test("maxLeftDegree drops hub customers from pair generation") {
    // customer 99 bought everything: uncapped it links all pairs
    val hub = (10L to 13L).map(i => (99L, i)).toDF("cust", "item")
    val withHub = edges.union(hub)
    val uncapped = Graph.neighborJaccard(withHub, "cust", "item", 1L)
      .as[(Long, Long, Long, Long)].collect()
    val capped = Graph.neighborJaccard(withHub, "cust", "item", 1L,
      maxLeftDegree = 3L).as[(Long, Long, Long, Long)].collect()
    // hub links (10,13),(11,13),(12,13); capped drops the hub's contribution
    assert(uncapped.map(t => (t._1, t._2)).toSet.contains((10L, 13L)))
    assert(!capped.map(t => (t._1, t._2)).toSet.contains((10L, 13L)))
    // pair volume strictly shrinks under the cap
    assert(capped.map(_._3).sum < uncapped.map(_._3).sum)
  }

  test("capped output IS the exact result over the capped graph: degrees " +
    "and Jaccard count only surviving evidence") {
    // dropping the hub must be indistinguishable from the hub never
    // having existed — if degrees were computed on the RAW edge list the
    // denominators would still count the hub's edges and every score
    // would shrink inconsistently with `common`
    val hub = (10L to 13L).map(i => (99L, i)).toDF("cust", "item")
    val capped = Graph.neighborJaccard(edges.union(hub), "cust", "item",
      minCommon = 2L, maxLeftDegree = 3L)
      .as[(Long, Long, Long, Long)].collect().toSet
    val exact = Graph.neighborJaccard(edges, "cust", "item", minCommon = 2L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(capped == exact)
    // and the DEFAULT is capped (finite): a pathological hub cannot ride
    // the default into a deg² stage
    val wide = (1L to 1001L).map(i => (7L, 100000L + i)).toDF("cust", "item")
    val got = Graph.neighborJaccard(edges.union(wide), "cust", "item",
      minCommon = 2L).as[(Long, Long, Long, Long)].collect().toSet
    assert(got == exact, "a >1000-degree hub must be dropped by default")
  }
}
