package graft.ops

import graft.SparkSpec
import graft.TestSpark.sf0001
import graft.functions.TextKit
import graft.sources.Tables
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("exactDedup keeps exactly one row per key, the deterministic winner") {
    import spark.implicits._
    val df = Seq(
      ("k1", 3L, "c"), ("k1", 1L, "a"), ("k1", 2L, "b"),
      ("k2", 5L, "z")).toDF("k", "ord", "v")
    val out = Dedup.exactDedup(df, Seq("k"), Seq("ord")).orderBy("k")
      .collect().map(r => (r.getString(0), r.getString(2)))
    assert(out.toSeq == Seq(("k1", "a"), ("k2", "z")))
  }

  test("exactDedup is a narrow partial-min + hash join-back, not a window sort (skew posture)") {
    import spark.implicits._
    val df = Seq(("k1", 1L, "a"), ("k2", 2L, "b")).toDF("k", "ord", "v")
    val plan = Dedup.exactDedup(df, Seq("k"), Seq("ord")).queryExecution.executedPlan.toString
    // map-side combine: the partial min over (key, orderCols) reduces a hot
    // key to one row per input partition BEFORE the shuffle — the window
    // form cannot; the wide columns come back via a hash join, never a sort
    assert(plan.contains("partial_min"), s"expected partial min aggregate:\n$plan")
    assert(!plan.contains("Window"), s"expected no window operator:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"expected hash join-back:\n$plan")
  }

  test("exactDedup survives a skewed key (one key = 20% of rows) with the right winner") {
    import spark.implicits._
    // 50k rows, key "hot" holds 10k of them — the viral-duplicate shape
    val n = 50000
    val df = spark.range(n).select(
      when(col("id") % 5 === 0, lit("hot")).otherwise(concat(lit("k"), col("id"))).as("k"),
      col("id").as("ord"),
      concat(lit("v"), col("id")).as("v"))
    val out = Dedup.exactDedup(df, Seq("k"), Seq("ord"))
    assert(out.count() == (n - n / 5 + 1).toLong) // distinct keys
    val hot = out.filter(col("k") === "hot").collect()
    assert(hot.length == 1 && hot(0).getLong(1) == 0L && hot(0).getString(2) == "v0")
  }

  test("dedupMarkers: every input row emitted, 1 SENT + N-1 SENT_OR_DUPLICATED per key " +
    "(the reference's canonical 1+2-duplicate scenario, MediationServiceSpec:45-83)") {
    import spark.implicits._
    // quique arrives 3 times (1 unique + 2 dups), abuela once
    val df = Seq(
      ("unique_kcop-1", 1L), ("unique_kcop-1", 5L), ("unique_kcop-1", 1L),
      ("unique_abu-2", 2L)).toDF("key", "ts")
    val out = Dedup.dedupMarkers(df.withColumn("id", monotonically_increasing_id()),
      col("key"), Seq(col("ts"), col("id")))
    assert(out.count() == 4) // all N produce an output row
    val statuses = out.groupBy("key").agg(
      sum(when(col("status") === "SENT", 1).otherwise(0)).as("sent"),
      sum(when(col("status") === "SENT_OR_DUPLICATED", 1).otherwise(0)).as("dup"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toMap2
    assert(statuses("unique_kcop-1") == (1L, 2L))
    assert(statuses("unique_abu-2") == (1L, 0L))
  }

  test("dedupMarkers is a narrow partial-min + hash join-back, not a window sort " +
    "(skew posture, VERDICT r6 item 2)") {
    import spark.implicits._
    val df = Seq(("k1", 1L), ("k1", 2L), ("k2", 3L)).toDF("key", "ts")
    val plan = Dedup.dedupMarkers(df, col("key"), Seq(col("ts")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min"), s"expected partial min aggregate:\n$plan")
    assert(!plan.contains("Window"), s"expected no window operator over the key:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("BroadcastHashJoin"),
      s"expected hash join-back:\n$plan")
  }

  test("dedupMarkers survives a hot key (one key = 20% of rows) with exactly one SENT") {
    import spark.implicits._
    val n = 5000
    val rows = (0 until n).map(i =>
      (if (i % 5 == 0) "hot" else s"k$i", i.toLong))
    val out = Dedup.dedupMarkers(rows.toDF("key", "ts"), col("key"), Seq(col("ts")))
    assert(out.count() == n.toLong) // every row emits a marker
    val hot = out.filter(col("key") === "hot")
      .groupBy("status").count().as[(String, Long)].collect().toMap
    assert(hot("SENT") == 1L && hot("SENT_OR_DUPLICATED") == (n / 5 - 1).toLong)
    // winner is deterministic: the smallest ts
    val sent = out.filter(col("key") === "hot" && col("status") === "SENT")
      .select("ts").as[Long].collect()
    assert(sent.toSeq == Seq(0L))
  }

  implicit class ToMap2(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("prefixBlockedCandidatePairs caps pathological shared-prefix blocks") {
    import spark.implicits._
    // 50 docs share one hot boilerplate prefix (a capped-out block), two
    // separate small blocks still pair, one singleton block pairs nothing
    val hot = (1L to 50L).map(i => (i, s"Terms of Service: clause $i"))
    val small = Seq((100L, "unique-prefix-aaaa one"), (101L, "unique-prefix-aaaa two"),
      (200L, "other-prefix-bbbbb x"), (201L, "other-prefix-bbbbb y"),
      (300L, "lonely-prefix-cccc z"))
    val docs = (hot ++ small).toDF("doc_id", "text")
    val capped = Dedup.prefixBlockedCandidatePairs(docs, "doc_id", "text",
      prefixLen = 16, maxBlockSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L), (200L, 201L)),
      s"hot block must be dropped whole, small blocks kept: $capped")
    // with the cap above the hot-block size, the quadratic block pairs fully
    val uncapped = Dedup.prefixBlockedCandidatePairs(docs, "doc_id", "text",
      prefixLen = 16, maxBlockSize = 1000).count()
    assert(uncapped == 50L * 49 / 2 + 2)
  }

  test("jaccardFromSets defines empty-vs-empty as 0.0 (oracle parity, ADVICE r3)") {
    import spark.implicits._
    // two sub-n-length docs: both shingle sets empty -> NOT near-dups (0.0),
    // matching the DuckDB oracles' explicit len(ga)+len(gb)=0 guard
    val row = Seq(("ab", "xy")).toDF("a", "b")
      .select(TextKit.jaccardFromSets(
        TextKit.ngramHashSet(col("a"), 3), TextKit.ngramHashSet(col("b"), 3)).as("j"))
      .collect()(0)
    assert(row.getDouble(0) == 0.0)
  }

  test("minhash-LSH recall is 1.0 vs brute-force jaccard>=0.8 on testdata") {
    val docs = Tables.documents(spark, sf0001)
    val lsh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.8, numHashes = 128, shingleLen = 5, bands = 16, oph = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: all pairs, exact jaccard
    val d1 = docs.select(col("doc_id").as("doc_a"), col("text").as("ta"))
    val d2 = docs.select(col("doc_id").as("doc_b"), col("text").as("tb"))
    val brute = d1.crossJoin(d2).filter(col("doc_a") < col("doc_b"))
      .withColumn("j", TextKit.ngramJaccard(col("ta"), col("tb"), 5))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain near-dup pairs")
    assert(lsh == brute, s"LSH missed ${(brute -- lsh).size}, extra ${(lsh -- brute).size}")
  }

  test("incremental near-dup matches brute-force cross-corpus pairs (recall 1)") {
    val docs = Tables.documents(spark, sf0001)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val inc = Dedup.incrementalNearDupPairs(fresh, ref, "doc_id", "text", 0.8,
      oph = true)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = fresh.select(col("doc_id").as("doc_a"), col("text").as("ta"))
      .crossJoin(ref.select(col("doc_id").as("doc_b"), col("text").as("tb")))
      .withColumn("j", TextKit.ngramJaccard(col("ta"), col("tb"), 5))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain cross-split near-dups")
    assert(inc == brute, s"missed ${(brute -- inc).size}, extra ${(inc -- brute).size}")
    assert(inc.forall { case (a, b) => a % 2 == 1 && b % 2 == 0 })
  }

  test("simhash chunk-blocking is exact for hamming distance <= 3 (pigeonhole)") {
    val docs = Tables.documents(spark, sf0001).limit(200)
    val viaChunks = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id").as("id"), Dedup.simhash64(col("text")).as("sh"))
    val brute = sh.select(col("id").as("doc_a"), col("sh").as("sa"))
      .crossJoin(sh.select(col("id").as("doc_b"), col("sh").as("sb")))
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaChunks == brute)
  }

  test("simhash caps hot chunk buckets (planted boilerplate cluster is dropped whole)") {
    import spark.implicits._
    // 60 docs with IDENTICAL text → identical simhash → all 4 chunk buckets
    // hold 60 members each; 2 distinct near-dup docs (1-token edit) stay
    val boiler = (1L to 60L).map(i => (i, "terms of service apply to all users equally"))
    val pairTxt = "the quick brown fox jumps over the lazy dog today"
    val near = Seq((1001L, pairTxt), (1002L, pairTxt)) // dist 0, bucket size 2
    val docs = (boiler ++ near).toDF("doc_id", "text")
    val capped = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxDist = 3, maxBucketSize = 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // hot buckets dropped whole → zero boilerplate pairs; the small bucket
    // (2 ≤ cap) still pairs — pair work bounded by cap², not cluster²
    assert(capped == Set((1001L, 1002L)),
      s"hot bucket must be dropped whole, small bucket kept: $capped")
    // with the cap above the cluster size the quadratic cluster pairs fully
    val uncapped = Dedup.simhashNearDupPairs(docs, "doc_id", "text",
      maxDist = 3, maxBucketSize = 1000).count()
    assert(uncapped >= 60L * 59 / 2)
  }

  test("embedding near-dup: LSH-bucketed pairs are a subset of exact pairs with " +
    "identical cosine values") {
    val em = Tables.embeddings(spark, sf0001)
    val exact = Dedup.embeddingNearDupPairs(em, "vec_id", "embedding", 0.42, exact = true)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDupPairs(em, "vec_id", "embedding", 0.42,
      nBits = 4)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }

  test("embedding near-dup: multi-table LSH finds every planted scaled copy " +
    "(×2 is an exponent shift — sign bits provably identical, recall = 1)") {
    val em = Tables.embeddings(spark, sf0001)
    val copies = em.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = em.select(col("vec_id"), col("embedding")).unionByName(copies)
    val n = em.count()
    val pairs = Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, nBits = 8, nTables = 2)
      .select("vec_a", "vec_b", "cos").collect()
    assert(pairs.length == n) // one pair per planted copy, nothing else
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
    // cos = 1 ± 1ulp (√S·√S re-rounds); micro-quantization is exact
    assert(pairs.forall(r => math.rint(r.getDouble(2) * 1e6) == 1000000.0))
  }

  test("SemDeDup: scaled copies share their original's k-means cell (recall = 1) " +
    "and semanticDedup keeps exactly the original corpus") {
    val em = Tables.embeddings(spark, sf0001)
    val copies = em.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = em.select(col("vec_id"), col("embedding")).unionByName(copies)
    val n = em.count()
    val pairs = Dedup.semanticNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 8)
      .select("vec_a", "vec_b", "cos").collect()
    // cosine is scale-invariant ⇒ the copy's argmax cell is its original's
    // cell ⇒ every planted pair is within-cluster; nothing else reaches 0.9
    assert(pairs.length == n)
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 1000000L))
    val kept = Dedup.semanticDedup(corpus, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 8)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val originals = em.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept == originals)
  }

  test("SemDeDup caps a degenerate hot cluster (over-cap cell dropped whole)") {
    val em = Tables.embeddings(spark, sf0001)
    val copies = em.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = em.select(col("vec_id"), col("embedding")).unionByName(copies)
    // nCentroids=1 puts the whole corpus in one cell; a cap below the corpus
    // size must drop it whole — zero pairs instead of an all-pairs join
    val capped = Dedup.semanticNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, nCentroids = 1, maxClusterSize = 10)
    assert(capped.count() == 0)
  }

  test("containmentPairs: hand-computed directional containment with threshold") {
    import spark.implicits._
    // 5-char shingles: doc 2 is a prefix of doc 1 → C(2→1)=1; doc 1's set
    // is 6 shingles of which 3 are doc 2's → C(1→2)=0.5; doc 3 disjoint
    val docs = Seq(
      (1L, "abcdefghij"),
      (2L, "abcdefg"),
      (3L, "zzzzzzzzzz")
    ).toDF("doc_id", "text")
    val strict = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(strict.toSeq == Seq((2L, 1L, 1000000L)))
    val loose = Dedup.containmentPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(loose == Set((2L, 1L, 1000000L), (1L, 2L, 500000L)))
  }

  test("containmentPairs: posting cap drops a hot shingle's bucket whole") {
    import spark.implicits._
    // 21 docs all sharing every shingle (identical text): every posting has
    // size 21 > cap 20 → no candidates survive the cap
    val docs = (1 to 21).map(i => (i.toLong, "aaaaabbbbb")).toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPostingSize = 20)
    assert(capped.count() == 0)
    val uncapped = Dedup.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPostingSize = 1000)
    assert(uncapped.count() == 21L * 20L) // all ordered pairs, C = 1
  }

  test("setJaccardPairs: exact thresholded pairs over element sets; " +
      "ubiquitous elements capped out of candidate generation only") {
    import spark.implicits._
    val baskets = Seq(
      (1L, Seq(10L, 20L, 30L, 40L)),
      (2L, Seq(10L, 20L, 30L)),      // j(1,2) = 3/4
      (3L, Seq(10L, 50L, 60L, 70L)), // j(1,3) = 1/7, j(2,3) = 1/6
      (4L, Seq(80L, 90L)),           // disjoint from all
      (5L, Seq(20L, 30L, 40L))       // j(1,5) = 3/4, j(2,5) = 2/4
    ).toDF("id", "items")
    val got = Dedup.setJaccardPairs(baskets, "id", "items", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 5L), (2L, 5L)))
    // an element in EVERY basket is blocking-useless: with the cap at 4
    // it is dropped from candidate generation, but pairs sharing rarer
    // elements are still found and verified on FULL sets
    val withCommon = baskets.select(col("id"),
      array_union(col("items"), array(lit(999L))).as("items"))
    val capped = Dedup.setJaccardPairs(withCommon, "id", "items",
        threshold = 0.5, maxElementFreq = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // j values shift with the shared element: j(1,2)=4/5? — recompute:
    // sets now {10,20,30,40,999},{10,20,30,999}: j = 4/5 ≥ .5 — found via
    // elements 10/20/30 (freq 3 ≤ 4), NOT via 999 (freq 5 > 4)
    assert(capped.contains((1L, 2L)))
    // basket 4 shares ONLY the capped 999 with others → never a candidate
    assert(!capped.exists(p => p._1 == 4L || p._2 == 4L))
  }
}
