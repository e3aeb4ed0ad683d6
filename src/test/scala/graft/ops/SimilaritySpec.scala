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
