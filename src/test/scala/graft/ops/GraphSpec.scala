package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: one hand-computed iteration on a 3-node chain") {
    // 1 -> 2 -> 3 : after one round (scale 1M, teleport 150k, damping 85):
    //   r(1) = 150000                            (no in-edges)
    //   r(2) = 150000 + 85*1000000/100 = 1000000 (one full contribution)
    //   r(3) = 1000000                           (same)
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.pageRank(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 150000L, 2L -> 1000000L, 3L -> 1000000L))
  }

  test("pageRank: fan-out splits rank by integer division; fan-in sums") {
    // 1 -> {2, 3}, {2, 3} -> 4. Round 1: r(2)=r(3)=150000+85*500000/100
    // = 575000; r(4) = 150000 + 85*(1000000+1000000)/100 = 1850000.
    // Round 2: r(4) = 150000 + 85*(575000+575000)/100 = 1127500.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val r1 = Graph.pageRank(edges, "src", "dst", iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000L, 2L -> 575000L, 3L -> 575000L,
      4L -> 1850000L))
    val r2 = Graph.pageRank(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2(4L) == 1127500L)
    assert(r2(2L) == 150000L + 85L * (150000L / 2) / 100)
  }

  test("pageRank is deterministic across runs and repartitionings") {
    val edges = (1L to 200L).map(i => (i % 17, i % 13)).toDF("src", "dst")
      .distinct()
    val a = Graph.pageRank(edges, "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(edges.repartition(7), "src", "dst", iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
