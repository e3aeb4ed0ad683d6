package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("editDistanceJoin k=1: finds sub/ins/del at any position, rejects ed 2") {
    import spark.implicits._
    val clean = Seq((1L, "kitten"), (2L, "orange")).toDF("id", "s")
    val dirty = Seq(
      (10L, "kitten"),  // ed 0 (identical)
      (11L, "sitten"),  // substitution at FIRST char
      (12L, "kitte"),   // deletion at last
      (13L, "kittens"), // insertion at last
      (14L, "kitzten"), // insertion mid
      (15L, "sittin"),  // ed 2 from kitten — must NOT match at k=1
      (16L, "oranje")   // substitution mid → orange
    ).toDF("id", "s")
    val got = pairs(Fuzzy.editDistanceJoin(dirty, clean, "id", "s", "id", "s",
      maxDist = 1))
    assert(got == Set((10L, 1L, 0), (11L, 1L, 1), (12L, 1L, 1), (13L, 1L, 1),
      (14L, 1L, 1), (16L, 2L, 1)))
  }

  test("editDistanceJoin k=2: two-edit chain caught, three-edit rejected") {
    import spark.implicits._
    val clean = Seq((1L, "kitten")).toDF("id", "s")
    val dirty = Seq((10L, "sittin"), (11L, "sittig")).toDF("id", "s")
    val got = pairs(Fuzzy.editDistanceJoin(dirty, clean, "id", "s", "id", "s",
      maxDist = 2))
    assert(got == Set((10L, 1L, 2))) // ed(sittig, kitten) = 3 → out
  }

  test("editDistanceJoin matches brute-force levenshtein join (recall 1 " +
    "by the symmetric-deletion theorem)") {
    import spark.implicits._
    // a vocabulary with planted 1-edit neighbors and unrelated words
    val words = Seq("alpha", "alpho", "alpa", "beta", "betta", "gamma",
      "gamm", "delta", "dleta", "epsilon", "epsilon", "zeta")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val df = words.toDF("id", "s")
    val got = pairs(Fuzzy.editDistanceJoin(df, df, "id", "s", "id", "s",
      maxDist = 1)).filter { case (a, b, _) => a < b }
    val brute = (for {
      (ia, sa) <- words; (ib, sb) <- words if ia < ib
      d = levRef(sa, sb) if d <= 1
    } yield (ia, ib, d)).toSet
    assert(got == brute)
  }

  test("editDistanceJoin: hot signature buckets (many DISTINCT strings) are " +
    "dropped whole by the cap") {
    import spark.implicits._
    // 30 distinct strings "word0".."word~" all share the deletion signature
    // "word" → one 30-member bucket per side
    val df = (0 until 30).map(i => (i.toLong, "word" + ('0' + i).toChar))
      .toDF("id", "s")
    val capped = Fuzzy.editDistanceJoin(df, df, "id", "s", "id", "s",
      maxDist = 1, maxBucketSize = 20)
    // the hot "word" bucket dies, but each string still matches ITSELF via
    // its unique self-signature bucket (size 1) → exactly the 30 identity
    // pairs survive
    assert(capped.count() == 30)
    assert(capped.filter(col("dist") =!= 0).count() == 0)
    val uncapped = Fuzzy.editDistanceJoin(df, df, "id", "s", "id", "s",
      maxDist = 1, maxBucketSize = 1000)
    // every pair differs only in the last char → ed ≤ 1, all 30×30 survive
    assert(uncapped.count() == 30L * 30L)
  }

  test("editDistanceJoin: exact-duplicate groups bypass the signature cap " +
    "(pipeline runs over distinct strings)") {
    import spark.implicits._
    // 30 COPIES of one string: one distinct-string row in the signature
    // join, so the cap can't drop it — the 900 output pairs are the answer
    val df = (1 to 30).map(i => (i.toLong, "same")).toDF("id", "s")
    val out = Fuzzy.editDistanceJoin(df, df, "id", "s", "id", "s",
      maxDist = 1, maxBucketSize = 2)
    assert(out.count() == 30L * 30L)
    assert(out.filter(col("dist") =!= 0).count() == 0)
  }

  test("editDistanceJoin: empty and single-char strings don't break the " +
    "signature generator (sequence(1,0) guard)") {
    import spark.implicits._
    val left = Seq((1L, ""), (2L, "a"), (3L, "ab")).toDF("id", "s")
    val got = pairs(Fuzzy.editDistanceJoin(left, left, "id", "s", "id", "s",
      maxDist = 1)).filter { case (a, b, _) => a < b }
    // ed("", "a") = 1, ed("a", "ab") = 1, ed("", "ab") = 2
    assert(got == Set((1L, 2L, 1), (2L, 3L, 1)))
  }

  test("jaroWinklerJoin: scores ed<=2 candidates, drops below-threshold") {
    import spark.implicits._
    val clean = Seq((1L, "martha"), (2L, "orange")).toDF("id", "s")
    val dirty = Seq(
      (10L, "marhta"),  // jw 0.9611 vs martha → kept
      (11L, "martha"),  // jw 1.0 → kept
      (12L, "oragne"),  // swap vs orange: jw ≥ 0.9 → kept
      (13L, "xyzzyx")   // no candidate at ed<=2
    ).toDF("id", "s")
    val got = Fuzzy.jaroWinklerJoin(dirty, clean, "id", "s", "id", "s",
      minSim = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.map(t => (t._1, t._2)) == Set((10L, 1L), (11L, 1L), (12L, 2L)))
    assert(got.forall(_._3 >= 0.9))
    assert(got.find(_._1 == 10L).get._3 == 0.9611111111111111)
  }

  test("damerauJoin: adjacent swap is distance 1 and caught (lev would be 2)") {
    import spark.implicits._
    val clean = Seq((1L, "trial")).toDF("id", "s")
    val dirty = Seq(
      (10L, "trail"),  // adjacent swap mid → dl 1 (lev 2)
      (11L, "trial"),  // dl 0
      (12L, "trila"),  // adjacent swap at end → dl 1
      (13L, "lairt")   // reversal → dl > 1
    ).toDF("id", "s")
    val got = Fuzzy.damerauJoin(dirty, clean, "id", "s", "id", "s").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 1L, 1L), (11L, 1L, 0L), (12L, 1L, 1L)))
  }

  /** Reference Levenshtein (full DP) for the brute-force cross-check. */
  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
