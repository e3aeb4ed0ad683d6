package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val em = Tables.embeddings(spark, graft.TestSpark.sf0001)
  private lazy val queries = em.filter(col("vec_id") % 100 === 0)

  test("IVF with nProbe = nCentroids reproduces the exact search") {
    val exact = Similarity.bruteForceTopK(em, queries, k = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val ivfAll = Similarity.ivfTopK(em, queries, k = 5,
      nCentroids = 8, nProbe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivfAll == exact) // probing every cell = scanning the corpus
  }

  /** Recall@k of an approximate result against the exact top-k. */
  private def recallAt(approx: Set[(Long, Long)], exact: Set[(Long, Long)]): Double =
    if (exact.isEmpty) 1.0 else approx.intersect(exact).size.toDouble / exact.size

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

  test("recall curves: nTables (LSH) and nProbe (IVF) are monotone dials " +
    "reaching production-grade recall") {
    val k = 5
    val exact = pairs(Similarity.bruteForceTopK(em, queries, k))
    // LSH: tables are a prefix family (table t's hyperplanes are seeded by
    // t), so candidates at nTables+1 are a superset of nTables — recall is
    // structurally non-decreasing. The driver-gated config (nBits=3,
    // nTables=6 -> 0.84 at sf0.01) sits mid-curve; both ends are swept here.
    val lshCurve = for (nBits <- Seq(2, 4); nTables <- Seq(1, 4, 8)) yield {
      val r = recallAt(pairs(Similarity.lshTopK(em, queries, k, nBits, nTables)), exact)
      info(f"lshTopK  nBits=$nBits nTables=$nTables  recall@$k = $r%.2f")
      (nBits, nTables, r)
    }
    for (b <- Seq(2, 4)) {
      val byTables = lshCurve.filter(_._1 == b).sortBy(_._2).map(_._3)
      assert(byTables == byTables.sorted,
        s"recall must be non-decreasing in nTables at nBits=$b: $byTables")
    }
    assert(lshCurve.map(_._3).max >= 0.9,
      s"some swept LSH config must reach production-grade recall: $lshCurve")
    // IVF: probe cells are the top-nProbe by centroid cosine — nested sets,
    // recall non-decreasing in nProbe, exact at nProbe = nCentroids.
    val ivfCurve = Seq(1, 2, 4, 6, 7, 8).map { nProbe =>
      val r = recallAt(
        pairs(Similarity.ivfTopK(em, queries, k, nCentroids = 8, nProbe = nProbe)), exact)
      info(f"ivfTopK  nProbe=$nProbe/8  recall@$k = $r%.2f")
      (nProbe, r)
    }
    assert(ivfCurve.map(_._2) == ivfCurve.map(_._2).sorted,
      s"recall must be non-decreasing in nProbe: $ivfCurve")
    assert(ivfCurve.exists { case (p, r) => p < 8 && r >= 0.85 },
      s"a partial probe must reach high recall: $ivfCurve")
    assert(ivfCurve.last._2 == 1.0, "full probe = exact search")
  }

  test("IVF partial probe: scores are exact, recall bounded by probe ratio") {
    val ivf = Similarity.ivfTopK(em, queries, k = 5, nCentroids = 8, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    assert(ivf.nonEmpty)
    // every reported (query, neighbor) cosine equals the true cosine —
    // approximation only narrows the candidate set, never the scores
    val pairs = ivf.map(r => (r._1, r._2)).toSet
    val truth = Similarity.bruteForceTopK(em, queries, k = 2000)
      .as[(Long, Long, Double, Int)].collect()
      .filter(r => pairs.contains((r._1, r._2)))
      .map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, nb, cos, _) =>
      assert(math.abs(cos - truth((q, nb))) < 1e-12)
    }
    // per-query result count never exceeds k
    ivf.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 5) }
  }
}
