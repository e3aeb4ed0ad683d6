package graft.functions

import graft.SparkSpec
import graft.TestSpark.sf0001
import graft.sources.Tables
import org.apache.spark.sql.functions._

class HashEmbedSpec extends SparkSpec {
  import spark.implicits._

  private def embed(texts: Seq[String], dim: Int = 64) =
    texts.toDF("t").select(NativeVectorKit.hashEmbed(col("t"), dim).as("v"))
      .as[Seq[Double]].collect()

  test("deterministic, unit-norm, token-order-insensitive (bag of words)") {
    val Seq(a1, a2, b, perm) =
      embed(Seq("the quick brown fox", "the quick brown fox",
        "completely different words here", "fox brown quick the")).toSeq
    assert(a1 == a2) // deterministic
    assert(a1 == perm) // bag-of-words: order never matters
    def norm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(a1) - 1.0) < 1e-12)
    assert(math.abs(norm(b) - 1.0) < 1e-12)
    assert(a1 != b)
  }

  test("empty/whitespace text embeds to the zero vector (cosine-0 contract)") {
    val Seq(z1, z2) = embed(Seq("", "  \t\n ")).toSeq
    assert(z1.forall(_ == 0.0) && z2.forall(_ == 0.0))
  }

  test("similar texts score higher cosine than unrelated texts") {
    val docs = Seq(
      (1L, "spark catalyst optimizer rewrites logical plans"),
      (2L, "spark catalyst optimizer rewrites physical plans"),
      (3L, "marmalade recipe citrus sugar pectin boiling")).toDF("id", "t")
      .select(col("id"), NativeVectorKit.hashEmbed(col("t"), 256).as("v"))
    val m = docs.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) = a.zip(b).map(p => p._1 * p._2).sum
    assert(cos(m(1L), m(2L)) > 0.6)
    assert(cos(m(1L), m(2L)) > cos(m(1L), m(3L)) + 0.3)
  }

  test("unlocks the vector stack on text-only corpora: SemDeDup finds planted copies") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .filter(col("doc_id") < 100)
    val withVec = docs.select(col("doc_id"),
      NativeVectorKit.hashEmbed(col("text"), 64).as("embedding"))
    val copies = withVec.select((col("doc_id") + 1000000L).as("doc_id"),
      col("embedding"))
    val corpus = withVec.unionByName(copies)
    val pairs = graft.ops.Dedup.semanticNearDupPairs(corpus, "doc_id",
      "embedding", threshold = 0.999, nCentroids = 4)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    // every planted (doc, copy) pair found — identical vectors share a cell
    val planted = pairs.filter { case (a, b) => b == a + 1000000L }
    assert(planted.length == 100)
  }
}
