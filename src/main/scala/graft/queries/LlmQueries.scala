package graft.queries

import graft.functions.{Kit, TextKit, VectorKit}
import graft.ops.{Dedup, Lookup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data-pipeline operator inventory: deduplication (exact, MinHash-
 * LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search, text
 * analysis. Same cross-engine conventions as [[RelationalQueries]].
 *
 * Oracle notes: the MinHash-LSH and n-gram queries emit pairs verified by
 * EXACT jaccard, so the DuckDB oracle is the brute-force pair join (with a
 * provable length-ratio prune: j ≥ 0.8 ⇒ |A| ≥ 0.8·|B|). The approximate
 * ops (SimHash blocking, LSH/IVF top-k) have no SQL-replicable pair
 * listing (DuckDB lacks Spark's xxhash64), so each emits a one-row
 * assertion vs in-engine brute force instead — exactness invariants where
 * a theorem guarantees them (SimHash pigeonhole), pinned deterministic
 * recall constants where not (LSH/IVF) — making every query in this module
 * driver-gated.
 */
object LlmQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── exact dedup by content hash (over a doubled corpus) ─────────────────
  private val ddExact: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    val doubled = d.unionByName(d) // simulate a re-crawled corpus
    doubled.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min(col("doc_id")).as("canonical_doc"), count(lit(1)).as("n_copies"))
      .orderBy(col("h"))
  }
  private val ddExactSql =
    """SELECT md5(text) AS h, min(doc_id) AS canonical_doc, count(*) AS n_copies
      |FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents)
      |GROUP BY 1 ORDER BY h""".stripMargin

  // ── n-gram Jaccard near-dup, prefix-blocked (exact, oracle-able) ────────
  private val ddNgram: Q = (s, dir) => {
    // ids-first pairing (same shape as the MinHash verify): the blocked
    // pair join carries ONLY (pfx, doc_id) — shingle sets are computed once
    // per doc and attached to candidates by id equi-joins afterward, so no
    // array ever rides the pair join's broadcast/shuffle. The j≥0.5 filter
    // keeps a pushdown barrier so the Jaccard evaluates in the codegen'd
    // post-join projection (see TextKit.noPushdown).
    // Blocks are size-capped (Dedup.prefixBlockedCandidatePairs): the cap
    // (1000) is far above the observed max block at sf0.1 (10), so the
    // oracle — which pairs uncapped — sees identical output, while a hot
    // boilerplate prefix at 100× scale can't go quadratic. Verification is
    // the shared candidates-only shape (Dedup.verifiedJaccardPairs).
    val docs = Tables.documents(s, dir)
    Dedup.verifiedJaccardPairs(docs,
      Dedup.prefixBlockedCandidatePairs(docs, "doc_id", "text",
        prefixLen = 16, maxBlockSize = 1000),
      "doc_id", "text", shingleLen = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"), Kit.microUnits(col("jaccard")).as("j_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
  private val ddNgramSql =
    """WITH d AS (
      |  SELECT doc_id, text, substring(text, 1, 16) AS pfx FROM documents
      |), p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    list_distinct([substring(a.text, x, 3) for x in range(1, length(a.text) - 1)]) AS ga,
      |    list_distinct([substring(b.text, x, 3) for x in range(1, length(b.text) - 1)]) AS gb
      |  FROM d a JOIN d b ON a.pfx = b.pfx AND a.doc_id < b.doc_id
      |), j AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
      |      (CAST(len(ga) + len(gb) AS DOUBLE) - CAST(len(list_intersect(ga, gb)) AS DOUBLE)) END AS jac
      |  FROM p
      |)
      |SELECT doc_a, doc_b, CAST(round(jac * 1000000, 0) AS BIGINT) AS j_micro
      |FROM j WHERE jac >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  // ── MinHash-LSH near-dup (LSH candidates, exact-jaccard verified) ───────
  private val ddMinhash: Q = (s, dir) => {
    // 128 hashes / 16 bands (r=8) on the ONE-PERMUTATION kernel (oph):
    // per-shingle cost O(1) instead of O(128) — measured 21× faster than
    // the dense kernel, and the sketch pass is the dominant full-scan term
    // at 100 TB. Verified near-dup pair set is identical to both the dense
    // 128/16 and 256/32 families at sf0.01 AND sf0.1 (deterministic
    // families, so this holds for every future run on this data).
    Dedup.minhashNearDupPairs(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.8, numHashes = 128, shingleLen = 5, bands = 16, oph = true)
      .select(col("doc_a"), col("doc_b"), Kit.microUnits(col("jaccard")).as("j_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
  // Brute-force oracle with the provable prune: j≥0.8 ⇒ 5|A|≥4|B| ∧ 5|B|≥4|A|.
  // Valid iff LSH recall is 1 on this data (min true pair j = .93, miss prob
  // (1-.93⁸)¹⁶ ≈ 2e-6) — asserted in the ScalaTest suite too.
  private val ddMinhashSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 5) for x in range(1, length(text) - 3)]) AS gs
      |  FROM documents
      |), p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gs AS ga, b.gs AS gb
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |    AND len(a.gs) * 5 >= len(b.gs) * 4 AND len(b.gs) * 5 >= len(a.gs) * 4
      |), j AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
      |      (CAST(len(ga) + len(gb) AS DOUBLE) - CAST(len(list_intersect(ga, gb)) AS DOUBLE)) END AS jac
      |  FROM p
      |)
      |SELECT doc_a, doc_b, CAST(round(jac * 1000000, 0) AS BIGINT) AS j_micro
      |FROM j WHERE jac >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  // ── incremental near-dup: fresh crawl (odd ids) vs reference corpus
  //    (even ids) — the per-increment ingestion shape. Oracle = brute-force
  //    odd×even cross join with the same provable length-ratio prune; valid
  //    because banding collision is a property of the two texts alone, so
  //    the self-join's verified recall-1 carries over to any corpus split.
  private val ddIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Dedup.incrementalNearDupPairs(
      docs.filter(col("doc_id") % 2 === 1),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", threshold = 0.8, oph = true)
      .select(col("doc_a"), col("doc_b"), Kit.microUnits(col("jaccard")).as("j_micro"))
      .orderBy(col("doc_a"), col("doc_b"))
  }
  private val ddIncrementalSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 5) for x in range(1, length(text) - 3)]) AS gs
      |  FROM documents
      |), p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gs AS ga, b.gs AS gb
      |  FROM g a JOIN g b ON a.doc_id % 2 = 1 AND b.doc_id % 2 = 0
      |    AND len(a.gs) * 5 >= len(b.gs) * 4 AND len(b.gs) * 5 >= len(a.gs) * 4
      |), j AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
      |      (CAST(len(ga) + len(gb) AS DOUBLE) - CAST(len(list_intersect(ga, gb)) AS DOUBLE)) END AS jac
      |  FROM p
      |)
      |SELECT doc_a, doc_b, CAST(round(jac * 1000000, 0) AS BIGINT) AS j_micro
      |FROM j WHERE jac >= 0.8 ORDER BY doc_a, doc_b""".stripMargin

  // ── near-dup clusters: connected components over the verified MinHash
  //    pairs; canonical = min doc id in the component. Oracle = recursive
  //    CTE transitive closure over the same pair set. ───────────────────────
  private val ddCluster: Q = (s, dir) => {
    val pairs = Dedup.minhashNearDupPairs(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.8, numHashes = 128, shingleLen = 5, bands = 16, oph = true)
    Dedup.nearDupClusters(pairs)
      .orderBy(col("doc_id"))
  }
  private val ddClusterSql =
    """WITH RECURSIVE g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 5) for x in range(1, length(text) - 3)]) AS gs
      |  FROM documents
      |), p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gs AS ga, b.gs AS gb
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |    AND len(a.gs) * 5 >= len(b.gs) * 4 AND len(b.gs) * 5 >= len(a.gs) * 4
      |), j AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
      |      (CAST(len(ga) + len(gb) AS DOUBLE) - CAST(len(list_intersect(ga, gb)) AS DOUBLE)) END AS jac
      |  FROM p
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM j WHERE jac >= 0.8
      |), edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |), cc(node, label) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, cc.label FROM edges e JOIN cc ON cc.node = e.b
      |)
      |SELECT node AS doc_id, min(label) AS canonical
      |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin

  // ── SimHash near-dup — driver-visible exactness gate ────────────────────
  // The chunk-blocked pair set is compared in-engine against the brute-force
  // all-pairs Hamming join; pigeonhole (dist ≤ 3 over 4 16-bit chunks ⇒ some
  // chunk equal) makes missed_pairs = 0 / extra_pairs = 0 a THEOREM, so the
  // oracle is SF-independent: the assertion row pins the blocking scheme's
  // exactness through the driver gate, not just the ScalaTest suite. The
  // raw pair listing itself has no SQL oracle (DuckDB lacks Spark's
  // xxhash64) and stays covered by DedupSpec.
  private val ddSimhash: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val blocked = Dedup.simhashNearDupPairs(docs, "doc_id", "text", maxDist = 3)
      .select(col("doc_a"), col("doc_b")).withColumn("in_blocked", lit(1))
    // coalesce('') → non-nullable sketch, so constraint propagation can't
    // re-evaluate simhash64 inside the scan's DataFilters (see Dedup)
    val sh = docs.repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), Dedup.simhash64(coalesce(col("text"), lit(""))).as("sh"))
    val brute = sh.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
      .crossJoin(broadcast(sh.select(col("doc_id").as("doc_b"), col("sh").as("sb"))))
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select(col("doc_a"), col("doc_b")).withColumn("in_brute", lit(1))
    val stats = brute.join(blocked, Seq("doc_a", "doc_b"), "full_outer").agg(
      coalesce(sum(when(col("in_blocked").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("missed_pairs"),
      coalesce(sum(when(col("in_brute").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("extra_pairs"),
      (count(lit(1)) > 0).as("has_pairs"))
    docs.agg(count(lit(1)).cast("long").as("n_docs")).crossJoin(stats)
      .select("n_docs", "missed_pairs", "extra_pairs", "has_pairs")
  }
  private val ddSimhashSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(0 AS BIGINT) AS missed_pairs,
      |  CAST(0 AS BIGINT) AS extra_pairs, TRUE AS has_pairs
      |FROM documents""".stripMargin

  // ── embedding cosine near-dup — the SCALE path (RHP-LSH bucketed) ───────
  // Near-dup detection semantics: the corpus is seeded with re-scaled
  // duplicates (each vector also appears as 2·v under vec_id+10⁶ — the
  // "same embedding, different normalization" re-crawl case, mirroring
  // dd_exact_hash's doubled corpus). Scaling by exactly 2.0 is an exponent
  // shift: every product/partial-sum in the RHP projection doubles EXACTLY,
  // so all sign bits — hence buckets — are identical, and LSH recall on the
  // planted pairs is provably 1 (not just w.h.p.). Threshold 0.9 has a huge
  // real margin here: planted pairs compute to cos = 1 ± 1 ulp (the same
  // value in both engines — op order matches), background pairs max out at
  // ~0.62 on this corpus (verified at sf0.01/sf0.1). NOTE a provable-recall LSH gate at the corpus's own
  // 0.42-threshold continuum is impossible — the pair-cosine distribution
  // is smooth through 0.42 (gap ~1e-4), and sign-agreement probability at
  // θ≈65° prunes nothing; that shape stays gated as the exact baseline
  // below (dd_embedding_threshold).
  private val ddEmbedding: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val copies = em.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = em.select(col("vec_id"), col("embedding")).unionByName(copies)
    Dedup.embeddingNearDupPairs(corpus, "vec_id", "embedding",
      threshold = 0.9, nBits = 8, nTables = 2)
      .select(col("vec_a"), col("vec_b"), Kit.microUnits(col("cos")).as("cos_micro"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
  private val ddEmbeddingSql =
    """WITH base AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), v AS (
      |  SELECT vec_id, e FROM base
      |  UNION ALL
      |  SELECT vec_id + 1000000, list_transform(e, x -> x * 2.0) FROM base
      |), s AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) /
      |      (sqrt(list_sum(list_transform(a.e, x -> x * x))) *
      |       sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id
      |)
      |SELECT vec_a, vec_b, CAST(round(cos * 1000000, 0) AS BIGINT) AS cos_micro
      |FROM s WHERE cos >= 0.9 ORDER BY vec_a, vec_b""".stripMargin

  // ── embedding cosine threshold join (exact all-pairs baseline) ──────────
  // The general cosine-threshold similarity join at a mid-range threshold:
  // kept on the exact path BY DESIGN (see note above — no bucketing prunes
  // at θ≈65°). The plan is broadcast-nested-loop with the small side
  // broadcast: right for "corpus × bounded reference set"; an unbounded
  // 100 TB self-join at this threshold is Ω(n²) in any engine.
  private val ddEmbeddingThreshold: Q = (s, dir) => {
    Dedup.embeddingNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
      threshold = 0.42, exact = true)
      .select(col("vec_a"), col("vec_b"), Kit.microUnits(col("cos")).as("cos_micro"))
      .orderBy(col("vec_a"), col("vec_b"))
  }
  private val ddEmbeddingThresholdSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), s AS (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) /
      |      (sqrt(list_sum(list_transform(a.e, x -> x * x))) *
      |       sqrt(list_sum(list_transform(b.e, x -> x * x)))) AS cos
      |  FROM v a JOIN v b ON a.vec_id < b.vec_id
      |)
      |SELECT vec_a, vec_b, CAST(round(cos * 1000000, 0) AS BIGINT) AS cos_micro
      |FROM s WHERE cos >= 0.42 ORDER BY vec_a, vec_b""".stripMargin

  // ── similarity search: exact brute-force cosine top-k ───────────────────
  private val simTopK: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    Similarity.bruteForceTopK(em, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"),
        Kit.microUnits(col("cos")).as("cos_micro"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
  private val simTopKSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id % 25 = 0
      |), s AS (
      |  SELECT q.query_id, v.vec_id AS neighbor_id,
      |    list_sum(list_transform(range(1, 65), i -> v.e[i] * q.qe[i])) /
      |      (sqrt(list_sum(list_transform(v.e, x -> x * x))) *
      |       sqrt(list_sum(list_transform(q.qe, x -> x * x)))) AS cos
      |  FROM v, q WHERE v.vec_id <> q.query_id
      |), r AS (
      |  SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM s
      |)
      |SELECT query_id, neighbor_id, CAST(round(cos * 1000000, 0) AS BIGINT) AS cos_micro, rank
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  // ── approximate top-k, driver-visible recall gates ──────────────────────
  // Each approximate searcher is scored in-engine against bruteForceTopK on
  // the same query set and emits a one-row summary. n_queries / n_exact are
  // SQL-derivable; recall_micro is pinned to the (fully deterministic — no
  // RNG anywhere in the path) measured value at sf0.01, the driver's verify
  // SF. score_mismatch = 0 asserts every reported neighbor carries the
  // exact cosine (approximation only ever drops candidates, never corrupts
  // scores).
  private def recallSummary(s: SparkSession, dir: String,
      approx: DataFrame): DataFrame = {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    val exact = Similarity.bruteForceTopK(em, queries, k = 5)
      .select(col("query_id"), col("neighbor_id"), col("cos").as("cos_exact"))
    val stats = approx.select(col("query_id"), col("neighbor_id"), col("cos"))
      .join(exact, Seq("query_id", "neighbor_id"), "full_outer").agg(
        coalesce(sum(when(col("cos").isNotNull && col("cos_exact").isNotNull, 1)
          .otherwise(0)), lit(0)).as("hits"),
        coalesce(sum(when(col("cos_exact").isNotNull, 1).otherwise(0)), lit(0))
          .as("n_exact"),
        coalesce(sum(when(col("cos").isNotNull && col("cos_exact").isNotNull
          && col("cos") =!= col("cos_exact"), 1).otherwise(0)), lit(0))
          .cast("long").as("score_mismatch"))
    queries.agg(count(lit(1)).cast("long").as("n_queries")).crossJoin(stats)
      .select(col("n_queries"), col("n_exact").cast("long").as("n_exact"),
        round(col("hits") * 1000000.0 / col("n_exact"), 0).cast("long")
          .as("recall_micro"),
        col("score_mismatch"))
  }

  private val simIvf: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    recallSummary(s, dir,
      Similarity.ivfTopK(em, queries, k = 5, nCentroids = 16, nProbe = 4))
  }
  private val simIvfSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(count(*) * 5 AS BIGINT) AS n_exact,
      |  CAST(680000 AS BIGINT) AS recall_micro,
      |  CAST(0 AS BIGINT) AS score_mismatch
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  private val simLsh: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    // mid-curve dial from the SimilaritySpec recall sweep (nBits=3,
    // nTables=6 → recall 0.84 pinned at sf0.01): demonstrates the
    // OR-amplified multi-table path at ~⅜ of the probe cost of the
    // recall-1.0 (2,8) config; both curve ends live in the spec sweep
    recallSummary(s, dir,
      Similarity.lshTopK(em, queries, k = 5, nBits = 3, nTables = 6))
  }
  private val simLshSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(count(*) * 5 AS BIGINT) AS n_exact,
      |  CAST(840000 AS BIGINT) AS recall_micro,
      |  CAST(0 AS BIGINT) AS score_mismatch
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  // persisted IVF index: build the partition-pruned lakehouse layout, probe
  // it, and require BIT-IDENTITY with the in-memory ivfTopK at the same
  // dials (deterministic trainer + shared assignment/probe expressions
  // make that an equality, not a recall bound). full_outer on (query,
  // rank): a row on either side without its exact twin is a mismatch.
  private val simIvfPersisted: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    val path = java.nio.file.Files.createTempDirectory("ivfidx_gate").toString
    graft.ops.IvfIndex.build(em, path, nCentroids = 16)
    val p = graft.ops.IvfIndex.probe(s, path, queries, k = 5, nProbe = 4)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("n_p"), col("cos").as("c_p"))
    val m = Similarity.ivfTopK(em, queries, k = 5, nCentroids = 16, nProbe = 4)
      .select(col("query_id"), col("rank"),
        col("neighbor_id").as("n_m"), col("cos").as("c_m"))
    val cmp = p.join(m, Seq("query_id", "rank"), "full_outer").agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(col("n_p") === col("n_m")
        && col("c_p") === col("c_m"), 0L).otherwise(1L)), lit(0L))
        .as("mismatches"))
    queries.agg(count(lit(1)).cast("long").as("n_queries")).crossJoin(cmp)
  }
  // n_rows = n_queries * 5: every probed query finds a full k at this SF
  // (16 cells over the corpus leave >= 5 non-self neighbors in any probed
  // 4-cell union — re-derived by the n_rows equality each run)
  private val simIvfPersistedSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(count(*) * 5 AS BIGINT) AS n_rows,
      |  CAST(0 AS BIGINT) AS mismatches
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  private val simIvfPq: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val queries = em.filter(col("vec_id") % 25 === 0)
    // the memory-bound layout: same coarse dial as sim_topk_ivf
    // (nCentroids=16, nProbe=4) but the probe join scans PQ codes (8
    // subspaces × 16 codes = 8 nibbles/vector vs 256 B of float32), ADC
    // shortlist 50 per query re-scored with exact cosine — score_mismatch=0
    // asserts the rerank, recall_micro pins the end-to-end determinism
    // (0.61 ≈ 90% of the 0.68 nProbe=4 IVF ceiling, reranking 10% of the
    // corpus; the gap IS the PQ quantization cost, measured)
    recallSummary(s, dir,
      Similarity.ivfPqTopK(em, queries, k = 5, nCentroids = 16, nProbe = 4,
        numSubspaces = 8, codebookSize = 16, shortlist = 50))
  }
  private val simIvfPqSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_queries,
      |  CAST(count(*) * 5 AS BIGINT) AS n_exact,
      |  CAST(610000 AS BIGINT) AS recall_micro,
      |  CAST(0 AS BIGINT) AS score_mismatch
      |FROM embeddings WHERE vec_id % 25 = 0""".stripMargin

  // ── SemDeDup: semantic dedup via embedding k-means clustering ───────────
  // End-to-end gate with a DATA-DERIVED oracle: dedup of (corpus ∪ ×2-scaled
  // copies at id+1e6) must return EXACTLY the original corpus — a scaled
  // copy has identical cosine geometry, so it lands in its original's
  // k-means cell with probability 1 and scores cos=1 ≥ 0.9 against it
  // (dropped: the copy is always the larger id), while no natural pair
  // reaches 0.9 (proved by dd_embedding_threshold's exact all-pairs
  // baseline on the same data). The oracle needs no pinned constants and
  // no k-means replay: it is SELECT vec_id FROM embeddings.
  private val ddSemantic: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val copies = em.select((col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    val corpus = em.select(col("vec_id"), col("embedding")).unionByName(copies)
    Dedup.semanticDedup(corpus, "vec_id", "embedding",
        threshold = 0.9, nCentroids = 16)
      .select(col("vec_id")).orderBy(col("vec_id"))
  }
  private val ddSemanticSql =
    "SELECT vec_id FROM embeddings ORDER BY vec_id"

  // ── int8 embedding quantization (symmetric, per-vector scale) ───────────
  // The storage-side companion of PQ: 4× compression with max-abs scaling,
  // fully deterministic (floor(x+0.5) rounding, no RNG) so the codes and
  // the max reconstruction error hash-match the DuckDB replay bit-for-bit.
  private val simInt8: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val v = VectorKit.asDouble(col("embedding"))
    val sc0 = array_max(transform(v, x => abs(x)))
    val sc = when(sc0 === 0.0, lit(1.0)).otherwise(sc0)
    val codes = transform(v, x => floor(x * lit(127.0) / sc + lit(0.5)).cast("int"))
    val err = array_max(zip_with(v, codes, (x, c) => abs(x - c * sc / lit(127.0))))
    em.select(col("vec_id"),
        floor(sc * 1000000.0 + 0.5).cast("long").as("scale_micro"),
        array_join(codes, ",").as("codes_csv"),
        floor(err * 1000000.0 + 0.5).cast("long").as("err_micro"))
      .orderBy(col("vec_id"))
  }
  private val simInt8Sql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), s AS (
      |  SELECT vec_id, e,
      |    CASE WHEN list_max(list_transform(e, x -> abs(x))) = 0 THEN 1.0
      |         ELSE list_max(list_transform(e, x -> abs(x))) END AS sc
      |  FROM v
      |), c AS (
      |  SELECT vec_id, e, sc,
      |    list_transform(e, x -> CAST(floor(x * 127 / sc + 0.5) AS INT)) AS codes
      |  FROM s
      |)
      |SELECT vec_id,
      |  CAST(floor(sc * 1000000 + 0.5) AS BIGINT) AS scale_micro,
      |  array_to_string(codes, ',') AS codes_csv,
      |  CAST(floor(list_max(list_transform(range(1, 65),
      |    i -> abs(e[i] - codes[i] * sc / 127))) * 1000000 + 0.5) AS BIGINT)
      |    AS err_micro
      |FROM c ORDER BY vec_id""".stripMargin

  // ── deterministic contrastive negative sampling ─────────────────────────
  // 3 reproducible pseudo-random negatives per anchor (every 10th vector),
  // partner = integer-mix(anchor, j) mod corpus-size — pure modular
  // arithmetic, so the oracle replays the identical pairing in SQL; scored
  // with the sequential-order native cosine and micro-quantized.
  private val simNegatives: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    val total = em.count()
    val anchors = em.filter(col("vec_id") % 10 === 0)
    Similarity.contrastiveNegatives(anchors, em, "vec_id", total, k = 3)
      .join(em.select(col("vec_id").as("anchor"), col("embedding").as("__va")),
        "anchor")
      .join(em.select(col("vec_id").as("partner"), col("embedding").as("__vb")),
        "partner")
      .select(col("anchor"), col("j"), col("partner"),
        Kit.microUnits(VectorKit.cosine(col("__va"), col("__vb")))
          .as("cos_micro"))
      .orderBy("anchor", "j")
  }
  private val simNegativesSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      |), n AS (SELECT count(*) AS total FROM v),
      |cand AS (
      |  SELECT a.vec_id AS anchor, j.j,
      |    (a.vec_id * 2654435761 + j.j * 40503) % (SELECT total FROM n) AS p0
      |  FROM v a CROSS JOIN (SELECT unnest([1, 2, 3]) AS j) j
      |  WHERE a.vec_id % 10 = 0
      |), pairs AS (
      |  SELECT anchor, j,
      |    CASE WHEN p0 = anchor THEN (p0 + 1) % (SELECT total FROM n)
      |         ELSE p0 END AS partner
      |  FROM cand
      |)
      |SELECT p.anchor, p.j, p.partner,
      |  CAST(round(
      |    list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) /
      |      (sqrt(list_sum(list_transform(a.e, x -> x * x))) *
      |       sqrt(list_sum(list_transform(b.e, x -> x * x)))) * 1000000, 0)
      |    AS BIGINT) AS cos_micro
      |FROM pairs p
      |JOIN v a ON a.vec_id = p.anchor
      |JOIN v b ON b.vec_id = p.partner
      |ORDER BY anchor, j""".stripMargin

  // ── corpus diversity: sampled pairwise similarity per source ────────────
  // Inter-document diversity (the self-BLEU-style health metric — a source
  // whose documents all resemble each other is template spam): mean
  // pairwise 3-gram Jaccard over DETERMINISTIC sampled pairs
  // ([[Similarity.contrastiveNegatives]] as the sampler), per source. Each
  // pair's score is micro-quantized BEFORE summation so the aggregate is
  // an integer sum — associative, hence identical in any engine at any
  // parallelism (a double mean would be order-dependent).
  private val tDiversity: Q = (s, dir) => {
    val d = Tables.documents(s, dir)
    val total = d.count()
    val anchors = d.filter(col("doc_id") % 2 === 0)
    Similarity.contrastiveNegatives(anchors, d, "doc_id", total, k = 2,
        seed = 11L)
      .join(d.select(col("doc_id").as("anchor"), col("source"),
        TextKit.ngramHashSet(col("text"), 3).as("__ga")), "anchor")
      .join(d.select(col("doc_id").as("partner"),
        TextKit.ngramHashSet(col("text"), 3).as("__gb")), "partner")
      .select(col("source"),
        Kit.microUnits(TextKit.jaccardFromSets(col("__ga"), col("__gb")))
          .as("__jm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__jm")).as("sum_j_micro"))
      .orderBy(col("source"))
  }
  private val tDiversitySql =
    """WITH d AS (SELECT doc_id, text, source FROM documents),
      |n AS (SELECT count(*) AS total FROM d),
      |cand AS (
      |  SELECT a.doc_id AS anchor, j.j,
      |    (a.doc_id * 2654435761 + j.j * 40503 + 11)
      |      % (SELECT total FROM n) AS p0
      |  FROM d a CROSS JOIN (SELECT unnest([1, 2]) AS j) j
      |  WHERE a.doc_id % 2 = 0
      |), pairs AS (
      |  SELECT anchor, j,
      |    CASE WHEN p0 = anchor THEN (p0 + 1) % (SELECT total FROM n)
      |         ELSE p0 END AS partner
      |  FROM cand
      |), g AS (
      |  SELECT doc_id, source,
      |    list_distinct([substring(text, x, 3)
      |      for x in range(1, length(text) - 1)]) AS gs
      |  FROM d
      |), scored AS (
      |  SELECT ga.source,
      |    CASE WHEN len(ga.gs) + len(gb.gs) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE) /
      |           (CAST(len(ga.gs) + len(gb.gs) AS DOUBLE)
      |             - len(list_intersect(ga.gs, gb.gs))) END AS jac
      |  FROM pairs p
      |  JOIN g ga ON ga.doc_id = p.anchor
      |  JOIN g gb ON gb.doc_id = p.partner
      |)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
      |  CAST(sum(CAST(round(jac * 1000000, 0) AS BIGINT)) AS BIGINT)
      |    AS sum_j_micro
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  // ── set-similarity join (similar baskets) ───────────────────────────────
  // Per-order item sets (every third order) plus a planted drop-one-
  // element twin per multi-item order: twins sit at Jaccard (n-1)/n ≥
  // 0.5, natural pairs
  // are found identically by both engines. The oracle blocks on shared
  // elements too (a bare quadratic over 30k baskets of lists is oracle-
  // side intractable), then verifies on full sets — the same candidates ⊇
  // answers ⇒ exact-result argument as the operator.
  private val ddSetJaccard: Q = (s, dir) => {
    val items0 = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") % 3 === 0)
      .groupBy(col("l_orderkey").as("oid"))
      .agg(sort_array(array_distinct(collect_list(col("l_partkey") % 49999)))
        .as("items"))
    val baskets = items0.unionByName(
      items0.filter(size(col("items")) >= 2)
        .select((col("oid") + 10000000L).as("oid"),
          slice(col("items"), lit(2), size(col("items")) - 1).as("items")))
    Dedup.setJaccardPairs(baskets, "oid", "items", threshold = 0.5,
        maxElementFreq = Int.MaxValue)
      .select(col("id_a"), col("id_b"), Kit.microUnits(col("jaccard"))
        .as("j_micro"))
      .orderBy("id_a", "id_b")
  }
  private val ddSetJaccardSql =
    """WITH items0 AS (
      |  SELECT l_orderkey AS oid,
      |    list_sort(list_distinct(list(l_partkey % 49999))) AS items
      |  FROM lineitem WHERE l_orderkey % 3 = 0 GROUP BY l_orderkey
      |), basket AS (
      |  SELECT oid, items FROM items0
      |  UNION ALL
      |  SELECT oid + 10000000, items[2:] FROM items0 WHERE len(items) >= 2
      |), posts AS (
      |  SELECT oid, unnest(items) AS e FROM basket
      |), cand AS (
      |  SELECT DISTINCT a.oid AS id_a, b.oid AS id_b
      |  FROM posts a JOIN posts b ON a.e = b.e AND a.oid < b.oid
      |), scored AS (
      |  SELECT c.id_a, c.id_b,
      |    CASE WHEN len(ba.items) + len(bb.items) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ba.items, bb.items)) AS DOUBLE) /
      |           (CAST(len(ba.items) + len(bb.items) AS DOUBLE)
      |             - len(list_intersect(ba.items, bb.items))) END AS jac
      |  FROM cand c
      |  JOIN basket ba ON ba.oid = c.id_a
      |  JOIN basket bb ON bb.oid = c.id_b
      |)
      |SELECT id_a, id_b, CAST(round(jac * 1000000, 0) AS BIGINT) AS j_micro
      |FROM scored WHERE jac >= 0.5 ORDER BY id_a, id_b""".stripMargin

  // ── T5-style span corruption (denoising objective data prep) ────────────
  // Deterministic keyed masking of aligned 3-token spans at 15%: corrupted
  // text with <MASK> sentinels + concatenated target tokens, reproducible
  // from the raw corpus (no stored RNG state). The oracle replays the
  // integer mask decision and both reconstructions with DuckDB list
  // comprehensions — full-string equality on every row.
  private val tSpanCorrupt: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.ops.Corpus.spanCorrupt(col("doc_id"), col("text")).as("c"))
      .select(col("doc_id"), col("c.corrupted").as("corrupted"),
        col("c.target").as("target"), col("c.n_tokens").as("n_tokens"),
        col("c.n_masked").as("n_masked"))
      .orderBy(col("doc_id"))
  }
  private val tSpanCorruptSql =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |)
      |SELECT doc_id,
      |  coalesce(array_to_string([CASE
      |      WHEN NOT (((doc_id * 2654435761 + (i // 3) * 40503) % 100) < 15)
      |        THEN toks[i + 1] ELSE '<MASK>' END
      |    for i in range(0, len(toks))
      |    if NOT (((doc_id * 2654435761 + (i // 3) * 40503) % 100) < 15)
      |       OR i % 3 = 0], ' '), '') AS corrupted,
      |  coalesce(array_to_string([toks[i + 1]
      |    for i in range(0, len(toks))
      |    if ((doc_id * 2654435761 + (i // 3) * 40503) % 100) < 15], ' '),
      |    '') AS target,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len([i for i in range(0, len(toks))
      |    if ((doc_id * 2654435761 + (i // 3) * 40503) % 100) < 15])
      |    AS BIGINT) AS n_masked
      |FROM d ORDER BY doc_id""".stripMargin

  // ── text analysis ───────────────────────────────────────────────────────
  private val tTokens: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextKit.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextKit.bpeishCount(col("text")).cast("long").as("n_bpeish"))
      .orderBy(col("doc_id"))
  }
  private val tTokensSql =
    """SELECT doc_id,
      |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpeish
      |FROM documents ORDER BY doc_id""".stripMargin

  private val tQuality: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), Kit.bps(TextKit.qualityScore(col("text"))).as("quality_bps"))
      .orderBy(col("doc_id"))
  }
  private val tQualitySql =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS DOUBLE) AS nchars,
      |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS toks,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS puncts
      |  FROM documents
      |), q AS (
      |  SELECT doc_id,
      |    least(nchars / 200.0, 1.0) * 0.5
      |      + least(stops / toks, 1.0) * 0.3
      |      + (1.0 - least(puncts / toks, 1.0)) * 0.2 AS quality
      |  FROM f
      |)
      |SELECT doc_id, CAST(round(quality * 10000, 0) AS BIGINT) AS quality_bps
      |FROM q ORDER BY doc_id""".stripMargin

  // ── intra-document repetition (Gopher-style quality filter signals) ─────
  // Fractions are ppm-quantized for exact integer comparison; both engines
  // compute the identical double ratios of small exact integers, so the
  // rounded values agree bit-for-bit.
  private val tRepetition: Q = (s, dir) => {
    val st = TextKit.repetitionStats(col("text"))
    Tables.documents(s, dir).select(
        col("doc_id"),
        st.getField("n_lines").as("n_lines"),
        st.getField("n_words").as("n_words"),
        round(st.getField("dup_line_frac") * 1e6).cast("long").as("dup_line_ppm"),
        round(st.getField("dup_line_char_frac") * 1e6).cast("long").as("dup_line_char_ppm"),
        round(st.getField("dup_word_frac") * 1e6).cast("long").as("dup_word_ppm"),
        round(st.getField("top_word_frac") * 1e6).cast("long").as("top_word_ppm"))
      .orderBy(col("doc_id"))
  }
  private val tRepetitionSql =
    """WITH base AS (
      |  SELECT doc_id,
      |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |                l -> len(l) > 0) AS ls,
      |    CASE WHEN len(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ws
      |  FROM documents
      |), d AS (
      |  SELECT doc_id, ls, ws,
      |    list_distinct(ls) AS dls, list_distinct(ws) AS dws,
      |    CAST(len(ls) AS DOUBLE) AS nl, CAST(len(ws) AS DOUBLE) AS nw,
      |    CAST(list_sum(list_transform(ls, x -> len(x))) AS DOUBLE) AS lchars
      |  FROM base
      |)
      |SELECT doc_id,
      |  CAST(len(ls) AS BIGINT) AS n_lines,
      |  CAST(len(ws) AS BIGINT) AS n_words,
      |  CAST(round(CASE WHEN nl > 0 THEN (nl - len(dls)) / nl ELSE 0 END * 1e6, 0)
      |    AS BIGINT) AS dup_line_ppm,
      |  CAST(round(CASE WHEN lchars > 0
      |    THEN (lchars - list_sum(list_transform(dls, x -> len(x)))) / lchars
      |    ELSE 0 END * 1e6, 0) AS BIGINT) AS dup_line_char_ppm,
      |  CAST(round(CASE WHEN nw > 0 THEN (nw - len(dws)) / nw ELSE 0 END * 1e6, 0)
      |    AS BIGINT) AS dup_word_ppm,
      |  CAST(round(CASE WHEN nw > 0
      |    THEN CAST(list_max(list_transform(dws,
      |           w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / nw
      |    ELSE 0 END * 1e6, 0) AS BIGINT) AS top_word_ppm
      |FROM d ORDER BY doc_id""".stripMargin

  // ── one-scan quality report card ────────────────────────────────────────
  // The per-document wide quality table a corpus pipeline publishes: token
  // count, composite quality, word-repetition, language, dominant script,
  // and PII density — SIX signal families fused into ONE projection over
  // ONE scan (plan-asserted in QualityCardPlanSpec: a single
  // FileSourceScan, no joins, no aggregation exchanges). At 100 TB the
  // scan IS the cost; computing the signals separately multiplies it by
  // the signal count. Oracle = the composition of the individual gates'
  // replays (t_token_count, t_quality_score, t_repetition, t_lang_id,
  // t_script_profile, t_pii_redact), all on the same row.
  private val tQualityCard: Q = (s, dir) => {
    val rep = TextKit.repetitionStats(col("text"))
    val pii = TextKit.piiCount(col("text"), TextKit.emailPattern) +
      TextKit.piiCount(col("text"), TextKit.phonePattern) +
      TextKit.piiCount(col("text"), TextKit.ipv4Pattern)
    Tables.documents(s, dir).select(
        col("doc_id"),
        TextKit.tokenCount(col("text")).cast("long").as("n_tokens"),
        Kit.bps(TextKit.qualityScore(col("text"))).as("quality_bps"),
        round(rep.getField("dup_word_frac") * 1e6).cast("long")
          .as("dup_word_ppm"),
        TextKit.langId(col("text")).as("lang_pred"),
        TextKit.scriptProfile(col("text")).getField("dominant").as("script"),
        pii.cast("long").as("n_pii"))
      .orderBy(col("doc_id"))
  }
  private val tQualityCardSql = {
    val scripts = Seq("arabic" -> "Arabic", "cyrillic" -> "Cyrillic",
      "greek" -> "Greek", "han" -> "Han", "latin" -> "Latin",
      "digits" -> "Nd")
    val scriptCounts = scripts.map { case (n, c) =>
      s"length(regexp_replace(text, '[^\\p{$c}]', '', 'g')) AS $n" }
    val scriptStructs = scripts.map { case (n, _) => s"{'n': -$n, 's': '$n'}" }
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |    CASE WHEN len(trim(text)) = 0 THEN []
       |         ELSE regexp_split_to_array(trim(text), '\\s+') END AS ws,
       |    CAST(length(text) AS DOUBLE) AS nchars,
       |    greatest(CAST(len(regexp_split_to_array(trim(text), '\\s+'))
       |      AS DOUBLE), 1.0) AS toks,
       |    CAST(len(regexp_extract_all(text,
       |      '\\b(the|a|an|and|or|of|to|in|is|it)\\b')) AS DOUBLE) AS stops,
       |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS puncts,
       |    len(regexp_extract_all(text, '\\b(the|and|of|to|is)\\b')) AS s_en,
       |    len(regexp_extract_all(text, '\\b(el|la|de|que|y)\\b')) AS s_es,
       |    len(regexp_extract_all(text, '\\b(le|la|de|et|les)\\b')) AS s_fr,
       |    len(regexp_extract_all(text, '\\b(der|die|und|das|ist)\\b')) AS s_de,
       |    len(regexp_extract_all(text, '\\b(zh|shi|de|le|bu)\\b')) AS s_zh,
       |    ${scriptCounts.mkString(",\n    ")},
       |    len(regexp_extract_all(text,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
       |      + len(regexp_extract_all(text,
       |          '\\+\\d{1,3}[ .-]\\d{3}[ .-]\\d{3}[ .-]\\d{4}'))
       |      + len(regexp_extract_all(text,
       |          '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_pii
       |  FROM documents
       |), g AS (
       |  SELECT *, list_distinct(ws) AS dws,
       |    CAST(len(ws) AS DOUBLE) AS nw,
       |    greatest(s_en, s_es, s_fr, s_de, s_zh) AS best
       |  FROM f
       |)
       |SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_tokens,
       |  CAST(round((least(nchars / 200.0, 1.0) * 0.5
       |    + least(stops / toks, 1.0) * 0.3
       |    + (1.0 - least(puncts / toks, 1.0)) * 0.2) * 10000, 0) AS BIGINT)
       |    AS quality_bps,
       |  CAST(round(CASE WHEN nw > 0 THEN (nw - len(dws)) / nw ELSE 0 END
       |    * 1e6, 0) AS BIGINT) AS dup_word_ppm,
       |  CASE WHEN best = 0 THEN 'und'
       |       WHEN s_en = best THEN 'en'
       |       WHEN s_es = best THEN 'es'
       |       WHEN s_fr = best THEN 'fr'
       |       WHEN s_de = best THEN 'de'
       |       ELSE 'zh' END AS lang_pred,
       |  CASE WHEN greatest(${scripts.map(_._1).mkString(", ")}) = 0
       |    THEN 'none'
       |    ELSE list_sort([${scriptStructs.mkString(", ")}])[1].s
       |    END AS script,
       |  CAST(n_pii AS BIGINT) AS n_pii
       |FROM g ORDER BY doc_id""".stripMargin
  }

  // ── deterministic training-mixture sampling ─────────────────────────────
  // src0 upsampled ×2.5, src1 downsampled to 0.4, everything else to 0.1;
  // both engines carve the same md5 16-bit cells, so the sampled multiset
  // (incl. copy indices) matches exactly.
  private val tMixture: Q = (s, dir) => {
    graft.ops.Corpus.mixtureSample(Tables.documents(s, dir), "source", "text",
        weights = Seq("src0" -> 2.5, "src1" -> 0.4), defaultWeight = 0.1,
        salt = "s1")
      .select(col("doc_id"), col("source"), col("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }
  private val tMixtureSql =
    """WITH j AS (
      |  SELECT doc_id, source, substring(md5('s1' || text), 1, 4) AS h,
      |    CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
      |         ELSE 0.1 END AS w
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source,
      |    CAST(floor(w) AS BIGINT)
      |      + CASE WHEN h < printf('%04x',
      |          CAST(round((w - floor(w)) * 65536, 0) AS BIGINT))
      |        THEN 1 ELSE 0 END AS n_copies
      |  FROM j
      |)
      |SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy
      |FROM c, unnest(range(1, n_copies + 1)) AS u(copy)
      |ORDER BY doc_id, copy""".stripMargin

  // Sentence segmentation stats: segments = non-blank runs between
  // [.!?]+ terminator runs (no lookbehind — RE2 has none, so the split
  // form is the engine-portable one), per-doc count / mean token length
  // (×100 integer-div) / longest sentence. The chunking/packing stages
  // consume these to pick sentence-aligned boundaries.
  private val tSentenceSplit: Q = (s, dir) => {
    val segs = filter(split(col("text"), "[.!?]+"),
      seg => length(trim(seg)) > 0)
    Tables.documents(s, dir)
      .select(col("doc_id"), segs.as("__segs"))
      .select(col("doc_id"),
        size(col("__segs")).cast("long").as("n_sentences"),
        aggregate(transform(col("__segs"),
            seg => size(split(trim(seg), "\\s+")).cast("long")),
          lit(0L), (a, x) => a + x).as("__toks"),
        coalesce(array_max(transform(col("__segs"),
          seg => length(trim(seg)))), lit(0)).cast("long")
          .as("max_sent_chars"))
      .select(col("doc_id"), col("n_sentences"),
        when(col("n_sentences") > 0,
          expr("__toks * 100 div n_sentences")).otherwise(0L)
          .as("mean_sent_tokens_c"),
        col("max_sent_chars"))
      .orderBy(col("doc_id"))
  }
  private val tSentenceSplitSql =
    """WITH d AS (
      |  SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[.!?]+'),
      |                s -> len(trim(s)) > 0) AS segs
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(segs) AS BIGINT) AS n_sentences,
      |  CAST(CASE WHEN len(segs) > 0 THEN
      |      list_sum(list_transform(segs,
      |        s -> len(regexp_split_to_array(trim(s), '\s+')))) * 100
      |      // len(segs)
      |    ELSE 0 END AS BIGINT) AS mean_sent_tokens_c,
      |  CAST(coalesce(list_max(list_transform(segs, s -> len(trim(s)))), 0)
      |    AS BIGINT) AS max_sent_chars
      |FROM d ORDER BY doc_id""".stripMargin

  // Anchor/link extraction from an HTML shell: hrefs pulled with a group
  // capture — both engines' regexp_extract_all take a group index. The
  // planted shell wraps each real doc with a doc_id-derived pair of
  // anchors (plus a third on every 5th doc), so counts and both end
  // links are fully derived.
  private val tLinkExtract: Q = (s, dir) => {
    val html = concat(
      lit("<a href=\"https://ex"), pmod(col("doc_id"), lit(7)),
      lit(".com/p\">t</a><p>"), col("text"),
      lit("</p><a href=\"http://site"), pmod(col("doc_id"), lit(3)),
      lit(".org/q?x=1\">u</a>"),
      when(col("doc_id") % 5 === 0,
        lit("<a href=\"https://extra.net/r\">v</a>")).otherwise(lit("")))
    val links = regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))
    Tables.documents(s, dir).select(
        col("doc_id"),
        size(links).cast("long").as("n_links"),
        element_at(links, 1).as("first_link"),
        element_at(links, -1).as("last_link"))
      .orderBy(col("doc_id"))
  }
  private val tLinkExtractSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<a href="https://ex' || (doc_id % 7) || '.com/p">t</a><p>'
      |      || text
      |      || '</p><a href="http://site' || (doc_id % 3)
      |      || '.org/q?x=1">u</a>'
      |      || CASE WHEN doc_id % 5 = 0
      |           THEN '<a href="https://extra.net/r">v</a>' ELSE '' END
      |      AS html
      |  FROM documents
      |), l AS (
      |  SELECT doc_id, regexp_extract_all(html, 'href="([^"]+)"', 1) AS links
      |  FROM h
      |)
      |SELECT doc_id, CAST(len(links) AS BIGINT) AS n_links,
      |  links[1] AS first_link, links[-1] AS last_link
      |FROM l ORDER BY doc_id""".stripMargin

  // Unicode-script profile: per-script character counts + dominant script
  // (ties by name, "none" when nothing counted) — the multilingual routing
  // signal. Planted docs exercise every counted script; the oracle replays
  // the same script-class counting in RE2 (\p{Script} there, \p{IsScript}
  // in Java — same BMP classes) and the argmax via a negated-count struct
  // sort. Fully derived — no pinned constants.
  private val tScriptProfile: Q = (s, dir) => {
    val texts = Seq("привет мир как дела сегодня", "καλημέρα κόσμε τι κάνεις",
      "你好世界今天天气很好", "مرحبا بالعالم كيف الحال",
      "mixed латиница and 2024 digits", "12345 67890")
    val planted = s.range(texts.size).select(
      (col("id") + 5000001L).as("doc_id"),
      element_at(typedLit(texts), (col("id") + 1).cast("int")).as("text"))
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .unionByName(planted)
      .select(col("doc_id"), TextKit.scriptProfile(col("text")).as("p"))
      .select(col("doc_id"), col("p.*"))
      .orderBy(col("doc_id"))
  }
  private val tScriptProfileSql = {
    val classes = Seq("arabic" -> "Arabic", "cyrillic" -> "Cyrillic",
      "greek" -> "Greek", "han" -> "Han", "latin" -> "Latin",
      "digits" -> "Nd")
    val counts = classes.map { case (n, c) =>
      s"length(regexp_replace(text, '[^\\p{$c}]', '', 'g')) AS $n" }
    val structs = classes.map { case (n, _) =>
      s"{'n': -$n, 's': '$n'}" }
    s"""WITH base AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT 5000001, 'привет мир как дела сегодня'
       |  UNION ALL SELECT 5000002, 'καλημέρα κόσμε τι κάνεις'
       |  UNION ALL SELECT 5000003, '你好世界今天天气很好'
       |  UNION ALL SELECT 5000004, 'مرحبا بالعالم كيف الحال'
       |  UNION ALL SELECT 5000005, 'mixed латиница and 2024 digits'
       |  UNION ALL SELECT 5000006, '12345 67890'
       |), c AS (
       |  SELECT doc_id, ${counts.mkString(",\n    ")}
       |  FROM base
       |)
       |SELECT doc_id,
       |  ${classes.map { case (n, _) => s"CAST($n AS BIGINT) AS $n" }
             .mkString(",\n  ")},
       |  CASE WHEN greatest(${classes.map(_._1).mkString(", ")}) = 0
       |    THEN 'none'
       |    ELSE list_sort([${structs.mkString(", ")}])[1].s END AS dominant
       |FROM c ORDER BY doc_id""".stripMargin
  }

  // √-temperature mixture: 20% target, p_s ∝ √n_s. The whole weight
  // derivation is integer arithmetic (isqrt quantized 1e-6, copies
  // quantized 1/65536) so DuckDB replays it in HUGEINT; the only floating
  // step in the oracle is floor(sqrt(·)) and a ±1 correction makes that
  // exact regardless of rounding.
  private val tTemperatureMixture: Q = (s, dir) => {
    graft.ops.Corpus.temperatureMixture(
      Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text")),
      "source", "text", targetPermille = 200, salt = "tmix")
      .select(col("doc_id"), col("source"), col("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }
  private val tTemperatureMixtureSql =
    """WITH c AS (
      |  SELECT source, CAST(count(*) AS HUGEINT) AS n FROM documents GROUP BY source
      |), tot AS (
      |  SELECT sum(n) AS total, CAST(1000000000000 AS HUGEINT) AS e12 FROM c
      |), r0 AS (
      |  SELECT source, n, e12,
      |    CAST(floor(sqrt(CAST(n AS DOUBLE) * 1e12)) AS HUGEINT) AS cand
      |  FROM c, tot
      |), r AS (
      |  SELECT source, n,
      |    CASE WHEN (cand + 1) * (cand + 1) <= n * e12 THEN cand + 1
      |         WHEN cand * cand > n * e12 THEN cand - 1
      |         ELSE cand END AS rs
      |  FROM r0
      |), sm AS (
      |  SELECT sum(rs) AS s FROM r
      |), w AS (
      |  SELECT source,
      |    (200 * total * e12) // (1000 * s * rs) AS whole,
      |    (65536 * ((200 * total * e12) % (1000 * s * rs)))
      |      // (1000 * s * rs) AS cells
      |  FROM r, sm, tot
      |), j AS (
      |  SELECT d.doc_id, d.source,
      |    substring(md5('tmix' || d.text), 1, 4) AS h, w.whole, w.cells
      |  FROM documents d JOIN w USING (source)
      |), cc AS (
      |  SELECT doc_id, source,
      |    CAST(whole AS BIGINT) + CASE WHEN h < printf('%04x',
      |      CAST(cells AS BIGINT)) THEN 1 ELSE 0 END AS n_copies
      |  FROM j
      |)
      |SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy
      |FROM cc, unnest(range(1, n_copies + 1)) AS u(copy)
      |ORDER BY doc_id, copy""".stripMargin

  // ── cross-document line dedup (boilerplate removal) ─────────────────────
  // The synthetic documents are single-line, so the query plants the
  // real-world shape in BOTH engines: a per-source header (~100 docs each)
  // and a global footer (all docs) around the unique body. minDocs=2 strips
  // header+footer and keeps every body line.
  private val ddLineDedup: Q = (s, dir) => {
    val boilered = Tables.documents(s, dir).select(col("doc_id"),
      concat(lit("nav header "), col("source"), lit("\n"),
        col("text"), lit("\nsite footer (c) 2026")).as("text"))
    graft.ops.Corpus.dedupLines(boilered, "doc_id", "text", minDocs = 2)
      .orderBy(col("doc_id"))
  }
  private val ddLineDedupSql =
    """WITH d2 AS (
      |  SELECT doc_id, 'nav header ' || source || chr(10) || text ||
      |         chr(10) || 'site footer (c) 2026' AS t
      |  FROM documents
      |), l AS (
      |  SELECT doc_id,
      |    generate_subscripts(string_split(t, chr(10)), 1) AS pos,
      |    unnest(string_split(t, chr(10))) AS line
      |  FROM d2
      |), freq AS (
      |  SELECT line, count(DISTINCT doc_id) AS ndocs FROM l GROUP BY line
      |), m AS (
      |  SELECT l.doc_id, l.pos, l.line, freq.ndocs >= 2 AS dup
      |  FROM l JOIN freq USING (line)
      |)
      |SELECT doc_id,
      |  string_agg(line, chr(10) ORDER BY pos) FILTER (WHERE NOT dup)
      |    AS clean_text,
      |  CAST(count(*) FILTER (WHERE NOT dup) AS BIGINT) AS lines_kept,
      |  CAST(count(*) FILTER (WHERE dup) AS BIGINT) AS lines_dropped
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── PII redaction ────────────────────────────────────────────────────────
  // Synthetic docs carry no PII, so the query plants a deterministic email,
  // phone and IPv4 per document in BOTH engines, then verifies the scrub
  // and the pre-redaction counts match byte-for-byte.
  private val tPiiRedact: Q = (s, dir) => {
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example.com"),
        lit(" or +1 415-555-0"),
        lpad((col("doc_id") % 100).cast("string"), 3, "0"),
        lit(" node 10.20."), (col("doc_id") % 256).cast("string"),
        lit(".7 end")).as("text"))
    planted.select(col("doc_id"),
        TextKit.piiCount(col("text"), TextKit.emailPattern).as("n_emails"),
        TextKit.piiCount(col("text"), TextKit.phonePattern).as("n_phones"),
        TextKit.piiCount(col("text"), TextKit.ipv4Pattern).as("n_ips"),
        TextKit.redactPii(col("text")).as("clean_text"))
      .orderBy(col("doc_id"))
  }
  private val tPiiRedactSql =
    """WITH p AS (
      |  SELECT doc_id, text || ' contact user' || doc_id ||
      |    '@mail.example.com or +1 415-555-0' ||
      |    lpad(CAST(doc_id % 100 AS VARCHAR), 3, '0') ||
      |    ' node 10.20.' || (doc_id % 256) || '.7 end' AS text
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
      |    AS n_emails,
      |  CAST(len(regexp_extract_all(text,
      |    '\+\d{1,3}[ .-]\d{3}[ .-]\d{3}[ .-]\d{4}')) AS INT) AS n_phones,
      |  CAST(len(regexp_extract_all(text,
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\+\d{1,3}[ .-]\d{3}[ .-]\d{3}[ .-]\d{4}', '<PHONE>', 'g'),
      |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
      |    AS clean_text
      |FROM p ORDER BY doc_id""".stripMargin

  private val tLang: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), TextKit.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))
  }
  private val tLangSql =
    """WITH s AS (
      |  SELECT doc_id,
      |    len(regexp_extract_all(text, '\b(the|and|of|to|is)\b')) AS s_en,
      |    len(regexp_extract_all(text, '\b(el|la|de|que|y)\b')) AS s_es,
      |    len(regexp_extract_all(text, '\b(le|la|de|et|les)\b')) AS s_fr,
      |    len(regexp_extract_all(text, '\b(der|die|und|das|ist)\b')) AS s_de,
      |    len(regexp_extract_all(text, '\b(zh|shi|de|le|bu)\b')) AS s_zh
      |  FROM documents
      |), b AS (
      |  SELECT *, greatest(s_en, s_es, s_fr, s_de, s_zh) AS best FROM s
      |)
      |SELECT doc_id,
      |  CASE WHEN best = 0 THEN 'und'
      |       WHEN s_en = best THEN 'en'
      |       WHEN s_es = best THEN 'es'
      |       WHEN s_fr = best THEN 'fr'
      |       WHEN s_de = best THEN 'de'
      |       ELSE 'zh' END AS lang_pred
      |FROM b ORDER BY doc_id""".stripMargin

  private val tFingerprint: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), TextKit.fingerprint32(col("text")).as("fp"))
      .orderBy(col("doc_id"))
  }
  private val tFingerprintSql =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform([substring(text, x, 1) for x in range(1, length(text) + 1)],
      |                     c -> CAST(unicode(c) AS BIGINT))),
      |    (a, b) -> (a * 31 + b) % 2147483647) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── corpus management: split / decontaminate / pack ─────────────────────
  // Deterministic content-hash split: md5 parity with DuckDB is already
  // load-bearing for dd_exact_hash; the first-hex-char carve (0-c/d-e/f)
  // is pure lexicographic comparison in both engines.
  private val tSplit: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.ops.Corpus.splitLabel(col("text")).as("split"))
      .orderBy(col("doc_id"))
  }
  private val tSplitSql =
    """SELECT doc_id,
      |  CASE WHEN substring(md5(text), 1, 1) < 'd' THEN 'train'
      |       WHEN substring(md5(text), 1, 1) < 'f' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  // Benchmark decontamination: benchmark = every 20th doc; output = per
  // training doc, how many of its distinct 8-grams appear in the benchmark
  // set. Spark counts 64-bit hashed grams (the native NgramHashSet FNV-1a
  // polynomial — see [[graft.functions.NgramHashSet]]), the oracle counts
  // the strings — identical unless the 64-bit hash collides within one
  // doc's shingles (P≈10⁻¹³ at 64 bits).
  private val ddDecontaminate: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.Corpus.contaminationCounts(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }
  private val ddDecontaminateSql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 8) for x in range(1, length(text) - 6)]) AS gs
      |  FROM documents
      |), bench AS (
      |  SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 20 = 0
      |), train AS (
      |  SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 20 <> 0
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |FROM train JOIN bench USING (gram)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // n-gram novelty — the decontamination machinery's dual: per training
  // doc, the ppm of its distinct 8-grams ABSENT from the reference set
  // (every 20th doc), zero-overlap docs included (novelty 1e6). Same
  // hash-vs-string equivalence argument as dd_decontaminate.
  private val tNovelty: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.Corpus.noveltyScores(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 8)
      .orderBy(col("doc_id"))
  }
  private val tNoveltySql =
    """WITH g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 8) for x in range(1, length(text) - 6)]) AS gs
      |  FROM documents
      |), ref AS (
      |  SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % 20 = 0
      |), train AS (
      |  SELECT doc_id, len(gs) AS n_grams FROM g WHERE doc_id % 20 <> 0
      |), sh AS (
      |  SELECT doc_id, count(*) AS n_shared
      |  FROM (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % 20 <> 0) t
      |  JOIN ref USING (gram) GROUP BY doc_id
      |)
      |SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
      |  CAST(coalesce(n_shared, 0) AS BIGINT) AS n_shared,
      |  CAST(CASE WHEN n_grams = 0 THEN 0
      |    ELSE (n_grams - coalesce(n_shared, 0)) * 1000000 // n_grams
      |    END AS BIGINT) AS novelty_ppm
      |FROM train LEFT JOIN sh USING (doc_id) ORDER BY doc_id""".stripMargin

  // Sequence packing: per-source shards, whitespace token budget 512,
  // chunk boundaries from the exclusive running total — pure integer
  // window arithmetic, identical in both engines.
  private val tPack: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ops.Corpus.packChunks(docs, "source", "doc_id",
      TextKit.tokenCount(col("text")).cast("long"), budget = 512L)
      .orderBy(col("source"), col("chunk_id"))
  }
  private val tPackSql =
    """WITH t AS (
      |  SELECT source, doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS tok
      |  FROM documents
      |), c AS (
      |  SELECT source, tok,
      |    CAST(floor(coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512) AS BIGINT)
      |      AS chunk_id
      |  FROM t
      |)
      |SELECT source, chunk_id, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS chunk_tokens
      |FROM c GROUP BY source, chunk_id ORDER BY source, chunk_id""".stripMargin

  // Vocabulary statistics: top 50 tokens by document frequency. Integer-only
  // output (no float aggregates to quantize); ties broken by token.
  private val tVocab: Q = (s, dir) => {
    graft.ops.Corpus.vocabStats(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_freq").desc, col("token"))
      .limit(50)
  }
  private val tVocabSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents WHERE length(trim(text)) > 0
      |), d AS (
      |  SELECT token, doc_id, count(*) AS tf FROM t GROUP BY 1, 2
      |)
      |SELECT token, CAST(count(*) AS BIGINT) AS doc_freq,
      |  CAST(sum(tf) AS BIGINT) AS total_count
      |FROM d GROUP BY token
      |ORDER BY doc_freq DESC, token LIMIT 50""".stripMargin

  // ── URL canonicalization + domain blocklist ─────────────────────────────
  // Synthetic docs carry no URLs, so the query plants a messy-but-realistic
  // one per document in BOTH engines (uppercase scheme/host, www, default
  // port, tracking params, fragment; every 5th doc on a co.uk host) and
  // verifies the canonical form, the registered domain, and the blocklist
  // verdict byte-for-byte. The regex pipeline is the same in Java regex and
  // RE2, so the oracle replays it step for step.
  private val tUrlKit: Q = (s, dir) => {
    import graft.functions.UrlKit
    val hostRaw = when(col("doc_id") % 5 === 0,
      concat(lit("WWW.Shop."), col("source"), lit(".co.uk")))
      .otherwise(concat(lit("WWW."), col("source"), lit(".Example-"),
        (col("doc_id") % 7).cast("string"), lit(".com")))
    val url = concat(lit("HTTPS://"), hostRaw, lit(":443/p/"),
      col("doc_id").cast("string"), lit("?utm_source=feed&id="),
      col("doc_id").cast("string"), lit("&gclid=x11#sec"))
    // layered projections: each derived column is materialized once per
    // row instead of re-embedding the whole upstream regexp chain in every
    // consumer (CollapseProject keeps the boundary for multiply-referenced
    // non-cheap aliases) — same result, much smaller codegen unit
    Tables.documents(s, dir)
      .select(col("doc_id"), UrlKit.canonicalizeUrl(url).as("canonical"))
      .withColumn("host", UrlKit.hostOf(col("canonical")))
      .withColumn("domain", UrlKit.registeredDomain(col("host")))
      .select(col("doc_id"), col("canonical"), col("domain"),
        (col("domain") === "example-3.com").as("blocked"))
      .orderBy(col("doc_id"))
  }
  private val tUrlKitSql =
    """WITH u AS (
      |  SELECT doc_id,
      |    'HTTPS://' || CASE WHEN doc_id % 5 = 0
      |        THEN 'WWW.Shop.' || source || '.co.uk'
      |        ELSE 'WWW.' || source || '.Example-' || (doc_id % 7) || '.com'
      |      END || ':443/p/' || doc_id || '?utm_source=feed&id=' || doc_id ||
      |      '&gclid=x11#sec' AS url
      |  FROM documents
      |), s1 AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(
      |      regexp_replace(trim(url), '#.*$', ''), '\?', '?&', 'g'),
      |      '&(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref|igshid)=[^&]*',
      |      '', 'g') AS x
      |  FROM u
      |), s2 AS (
      |  SELECT doc_id,
      |    regexp_replace(regexp_replace(x, '\?&', '?', 'g'), '[?&]$', '') AS x
      |  FROM s1
      |), c AS (
      |  SELECT doc_id,
      |    lower(regexp_extract(x, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(x, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      |      ':(80|443)$', ''), '^www\.', '') AS host,
      |    regexp_replace(
      |      regexp_replace(x, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', ''),
      |      '/(\?|$)', '\1') AS rest
      |  FROM s2
      |), k AS (
      |  SELECT doc_id,
      |    CASE WHEN scheme = '' OR host = '' THEN NULL
      |         ELSE scheme || '://' || host || rest END AS canonical,
      |    regexp_extract(host,
      |      '([^.]+\.(?:co|com|org|net|gov|ac)\.(?:uk|au|jp|br|in|nz))$', 1)
      |      AS three,
      |    regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS two
      |  FROM c
      |)
      |SELECT doc_id, canonical,
      |  CASE WHEN three <> '' THEN three
      |       WHEN two <> '' THEN two ELSE NULL END AS domain,
      |  (CASE WHEN three <> '' THEN three
      |        WHEN two <> '' THEN two ELSE NULL END) = 'example-3.com'
      |    AS blocked
      |FROM k ORDER BY doc_id""".stripMargin

  // ── exact substring-span dedup stats ────────────────────────────────────
  // A shared per-source 11-word preamble is planted in BOTH engines (the
  // syndicated-template shape), so every document carries cross-document
  // 5-word spans that are NOT line-aligned; body spans collide naturally.
  // Spark groups 64-bit hashed spans, the oracle groups the strings —
  // identical unless xxhash64 collides (P≈10⁻¹³ at this scale).
  private val ddSpanDedup: Q = (s, dir) => {
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(lit("shared promo intro for "), col("source"),
        lit(" campaign edition alpha beta gamma delta "), col("text")).as("text"))
    graft.ops.Corpus.spanDedupStats(planted, "doc_id", "text", k = 5, minDocs = 2)
      .orderBy(col("doc_id"))
  }
  private val ddSpanDedupSql =
    """WITH d2 AS (
      |  SELECT doc_id, 'shared promo intro for ' || source ||
      |    ' campaign edition alpha beta gamma delta ' || text AS t
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, CASE WHEN len(trim(t)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(t), '\s+') END AS ws
      |  FROM d2
      |), s AS (
      |  SELECT doc_id, CASE WHEN len(ws) >= 5
      |    THEN list_distinct(list_transform(range(1, len(ws) - 3),
      |           i -> array_to_string(ws[i:i+4], ' ')))
      |    ELSE [] END AS spans
      |  FROM w
      |), e AS (
      |  SELECT doc_id, unnest(spans) AS span FROM s
      |), f AS (
      |  SELECT span FROM e GROUP BY span HAVING count(*) >= 2
      |), c AS (
      |  SELECT e.doc_id, CAST(count(*) AS BIGINT) AS dup_spans
      |  FROM e JOIN f USING (span) GROUP BY e.doc_id
      |)
      |SELECT s.doc_id, CAST(len(spans) AS BIGINT) AS n_spans,
      |  coalesce(c.dup_spans, 0) AS dup_spans,
      |  CASE WHEN len(spans) > 0
      |    THEN CAST(round(CAST(coalesce(c.dup_spans, 0) AS DOUBLE) /
      |           CAST(len(spans) AS DOUBLE) * 1e6, 0) AS BIGINT)
      |    ELSE 0 END AS dup_span_ppm
      |FROM s LEFT JOIN c USING (doc_id) ORDER BY s.doc_id""".stripMargin

  // ── exact substring-span REMOVAL (ExactSubstr rewrite) ──────────────────
  // Same planted syndicated preamble as dd_span_dedup, so every document
  // carries duplicated 5-word spans whose non-first occurrences must be cut.
  // Spark keys spans by xxhash64, the oracle by the span string; the oracle
  // replays first-occurrence protection with a (doc, pos) row_number window
  // — identical semantics to the engine's min(struct(doc, pos)) winner.
  private val ddSpanRemoval: Q = (s, dir) => {
    val planted = Tables.documents(s, dir).select(col("doc_id"),
      concat(lit("shared promo intro for "), col("source"),
        lit(" campaign edition alpha beta gamma delta "), col("text")).as("text"))
    graft.ops.Corpus.removeDupSpans(planted, "doc_id", "text", k = 5, minCount = 2)
      // fully-cut documents surface null text from the operator; the gate
      // coalesces to '' (words_kept=0 still pins the distinction) because
      // the driver compare treats null string cells as missing
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("words_kept"), col("words_dropped"))
      .orderBy(col("doc_id"))
  }
  private val ddSpanRemovalSql =
    """WITH d2 AS (
      |  SELECT doc_id, 'shared promo intro for ' || source ||
      |    ' campaign edition alpha beta gamma delta ' || text AS t
      |  FROM documents
      |), w AS (
      |  SELECT doc_id, CASE WHEN len(trim(t)) = 0 THEN []
      |    ELSE regexp_split_to_array(trim(t), '\s+') END AS ws
      |  FROM d2
      |), occ AS (
      |  SELECT doc_id, i - 1 AS p, array_to_string(ws[i:i+4], ' ') AS span
      |  FROM w, unnest(CASE WHEN len(ws) >= 5 THEN range(1, len(ws) - 3)
      |                 ELSE [] END) AS u(i)
      |), mk AS (
      |  SELECT doc_id, p,
      |    count(*) OVER (PARTITION BY span) AS n,
      |    row_number() OVER (PARTITION BY span ORDER BY doc_id, p) AS rn
      |  FROM occ
      |), cov AS (
      |  SELECT DISTINCT doc_id, pp AS p
      |  FROM mk, unnest(range(p, p + 5)) AS c(pp)
      |  WHERE n >= 2 AND rn > 1
      |), wpos AS (
      |  SELECT doc_id, i - 1 AS p, ws[i] AS wd
      |  FROM w, unnest(range(1, len(ws) + 1)) AS t(i)
      |), kept AS (
      |  SELECT wpos.doc_id, wpos.p, wpos.wd, cov.p IS NOT NULL AS c
      |  FROM wpos LEFT JOIN cov ON wpos.doc_id = cov.doc_id AND wpos.p = cov.p
      |), agg AS (
      |  SELECT doc_id,
      |    CASE WHEN count(*) FILTER (WHERE NOT c) > 0
      |      THEN array_to_string(list(wd ORDER BY p) FILTER (WHERE NOT c), ' ')
      |      END AS clean_text,
      |    CAST(count(*) FILTER (WHERE NOT c) AS BIGINT) AS words_kept,
      |    CAST(count(*) FILTER (WHERE c) AS BIGINT) AS words_dropped
      |  FROM kept GROUP BY doc_id
      |)
      |SELECT d2.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |  coalesce(agg.words_kept, 0) AS words_kept,
      |  coalesce(agg.words_dropped, 0) AS words_dropped
      |FROM d2 LEFT JOIN agg USING (doc_id) ORDER BY d2.doc_id""".stripMargin

  // ── corpus-trained unigram surprisal (model-based quality score) ────────
  // Surprisal in whole bits via exact integer log2 (binary-expansion
  // length), so both engines agree bit-for-bit with no floating-point ln.
  private val tUnigramLm: Q = (s, dir) => {
    graft.ops.Corpus.unigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }
  private val tUnigramLmSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), tf AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
      |), v AS (
      |  SELECT w, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY w
      |), n AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v
      |)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  CAST(sum(tf * (length(bin(n.total)) - length(bin(v.cnt)))) AS BIGINT)
      |    AS surprisal_bits,
      |  CAST((sum(tf * (length(bin(n.total)) - length(bin(v.cnt)))) * 100)
      |    // sum(tf) AS BIGINT) AS mean_centibits
      |FROM tf JOIN v USING (w) CROSS JOIN n
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── containment near-dup (excerpt detection) ────────────────────────────
  // Every 10th doc with ≥25 words gets a planted EXCERPT (its first 20
  // words — texts are single-spaced, so the excerpt is a literal prefix
  // substring and char-shingle containment is exactly 1.0, while Jaccard
  // is far below the symmetric threshold). With uncapped postings the
  // prefix-filter theorem makes recall on C=1 pairs exact, so
  // planted_found ≡ n_planted is a theorem-backed gate the oracle replays
  // as counting arithmetic.
  private val ddContainment: Q = (s, dir) => {
    val toks = TextKit.tokens(col("text"))
    val base = Tables.documents(s, dir).filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("text"))
    val planted = base.filter(size(toks) >= 25)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        array_join(slice(toks, 1, 20), " ").as("text"))
    val corpus = base.unionByName(planted)
    // ONE corpus sketch shared by the uncapped exactness pass and the
    // capped-path pin below — the sketch is the dominant cost and the two
    // configs only differ downstream of it
    val sketch = Dedup.containmentSketch(corpus, "doc_id", "text", shingleLen = 5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = Dedup.containmentPairsFromSketch(sketch,
      threshold = 0.9, maxPostingSize = Int.MaxValue)
    val expect = planted.select(col("doc_id").as("pa"),
      (col("doc_id") - 1000000L).as("pb"))
    def foundOf(p: DataFrame): DataFrame = p.join(expect,
      col("doc_a") === col("pa") && col("doc_b") === col("pb") &&
        col("containment_ppm") === 1000000L)
    val found = foundOf(pairs)
    // capped-path pin (VERDICT r6 nit 3): the uncapped run above proves
    // theorem-exact recall, but production runs with a finite
    // maxPostingSize — so the gate ALSO runs the capped path over a
    // PLANTED HOT POSTING: 60 filler docs sharing one identical gibberish
    // text (every filler shingle's posting has df=60 > cap=50, so
    // sizeBandedBuckets drops those buckets whole → zero filler pairs),
    // while every planted excerpt pair still surfaces (its discriminative
    // shingles are rare, far under the cap). Gibberish tokens keep filler
    // shingles disjoint from corpus shingles, so the cap cannot touch a
    // real posting.
    val fillerText = "zzq4x wq7kj xva9z qqy3m zzr8n vvk2p yyj6t xxw5h " +
      "zzq4x wq7kj xva9z qqy3m zzr8n vvk2p"
    val filler = s.range(60).select((col("id") + 2000000L).as("doc_id"),
      lit(fillerText).as("text"))
    // the pin runs on a one-third corpus slice (filtered from the CACHED
    // sketch — no re-scan, no re-sketch): its contract is that the hot
    // posting's buckets drop whole while rare postings survive, which
    // full corpus density adds nothing to — the uncapped pass above
    // already proves recall there
    val sliced = sketch.filter(
      (col("doc") < 1000000L && col("doc") % 30 === 0) ||
      (col("doc") >= 1000000L && (col("doc") - 1000000L) % 30 === 0))
    val cappedPairs = Dedup.containmentPairsFromSketch(
      sliced.unionByName(Dedup.containmentSketch(filler, "doc_id", "text",
        shingleLen = 5)),
      threshold = 0.9, maxPostingSize = 50)
    val cappedFound = foundOf(cappedPairs)
    val fillerPairs = cappedPairs.filter(
      col("doc_a") >= 2000000L && col("doc_b") >= 2000000L)
    sketch.unpersist() // both pair sets are eagerly checkpointed
    base.agg(count(lit(1)).as("n_base"))
      .crossJoin(planted.agg(count(lit(1)).as("n_planted")))
      .crossJoin(found.agg(count(lit(1)).as("planted_found")))
      .withColumn("missing", col("n_planted") - col("planted_found"))
      .crossJoin(cappedFound.agg(count(lit(1)).as("capped_planted_found")))
      .crossJoin(fillerPairs.agg(count(lit(1)).as("capped_filler_pairs")))
  }
  private val ddContainmentSql =
    """WITH b AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
      |), p AS (
      |  SELECT doc_id FROM b
      |  WHERE len(regexp_split_to_array(trim(text), '\s+')) >= 25
      |)
      |SELECT CAST((SELECT count(*) FROM b) AS BIGINT) AS n_base,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS n_planted,
      |  CAST((SELECT count(*) FROM p) AS BIGINT) AS planted_found,
      |  CAST(0 AS BIGINT) AS missing,
      |  CAST((SELECT count(*) FROM p WHERE doc_id % 30 = 0) AS BIGINT)
      |    AS capped_planted_found,
      |  CAST(0 AS BIGINT) AS capped_filler_pairs""".stripMargin

  // ── bloom-pruned incremental anti-join (huge-historical dedup) ──────────
  // The D2 split where the HISTORICAL corpus is the 100 TB side: a bloom
  // over the fresh batch's keys prunes historical at its scan before the
  // shuffle join. False positives only widen the pruned candidate set —
  // never the answer — so the oracle is the plain exact anti/semi join.
  private val ddBloomAntijoin: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val hist = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id")
    val fresh = docs.filter(col("doc_id") % 2 === 0).select("doc_id")
    val (novel, dups) = Lookup.bloomSemiAntiSplit(fresh, hist, "doc_id",
      expectedFreshKeys = 100000L, fpp = 0.01)
    novel.select(col("doc_id"), lit("novel").as("route"))
      .unionByName(dups.select(col("doc_id"), lit("dup").as("route")))
      .orderBy("doc_id")
  }
  private val ddBloomAntijoinSql =
    """WITH h AS (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0),
      |     f AS (SELECT doc_id FROM documents WHERE doc_id % 2 = 0)
      |SELECT f.doc_id,
      |  CASE WHEN h.doc_id IS NULL THEN 'novel' ELSE 'dup' END AS route
      |FROM f LEFT JOIN h ON f.doc_id = h.doc_id
      |ORDER BY f.doc_id""".stripMargin

  // ── crawl-frontier dedup on canonical URLs ──────────────────────────────
  // Four messy variants per URL group (case/www/port, fragment, tracking
  // params, trailing slash) must collapse to ONE canonical each; dedup
  // keeps the min doc_id. The oracle states the canonical analytically —
  // hash equality on the curl column re-proves the whole canonicalization
  // chain, and the group arithmetic pins the dedup.
  private val ddUrlDedup: Q = (s, dir) => {
    import graft.functions.UrlKit
    val g = (col("doc_id") % 100).cast("string")
    val v = col("doc_id") % 4
    val url = when(v === 0, concat(lit("https://docs.example.com/a/"), g))
      .when(v === 1, concat(lit("HTTPS://WWW.Docs.Example.COM:443/a/"), g,
        lit("#frag")))
      .when(v === 2, concat(lit("https://docs.example.com/a/"), g,
        lit("?utm_source=x&gclid=y")))
      .otherwise(concat(lit("https://www.docs.example.com/a/"), g, lit("/")))
    val withC = Tables.documents(s, dir)
      .select(col("doc_id"), UrlKit.canonicalizeUrl(url).as("curl"))
    val winners = graft.ops.Dedup.exactDedup(withC, Seq("curl"), Seq("doc_id"))
    val counts = withC.groupBy(col("curl")).agg(count(lit(1)).as("n_dups"))
    winners.join(counts, Seq("curl"))
      .select(col("curl"), col("doc_id").as("keeper"), col("n_dups"))
      .orderBy(col("curl"))
  }
  private val ddUrlDedupSql =
    """WITH c AS (
      |  SELECT doc_id,
      |    'https://docs.example.com/a/' || (doc_id % 100) AS curl
      |  FROM documents
      |)
      |SELECT curl, min(doc_id) AS keeper, CAST(count(*) AS BIGINT) AS n_dups
      |FROM c GROUP BY curl ORDER BY curl""".stripMargin

  // ── deterministic global shuffle (training-shard order) ─────────────────
  // The content-hash permutation behind Corpus.writeShuffled, materialized
  // at test scale: shard = first hex nibble of the shuffle key (16 shards),
  // pos = rank within the shard by (key, doc_id). Lowercase-hex string
  // order is ASCII order in both engines, so the permutation replays
  // exactly.
  private val tShardOrder: Q = (s, dir) => {
    import org.apache.spark.sql.expressions.Window
    val sk = graft.ops.Corpus.shuffleKey(col("text"), "epoch1")
    val w = Window.partitionBy(col("shard")).orderBy(col("__sk"), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), sk.as("__sk"))
      .withColumn("shard",
        (instr(lit("0123456789abcdef"), substring(col("__sk"), 1, 1)) - 1)
          .cast("long"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }
  private val tShardOrderSql =
    """WITH k AS (
      |  SELECT doc_id, md5('epoch1' || text) AS sk FROM documents
      |), s AS (
      |  SELECT doc_id, sk,
      |    CAST(strpos('0123456789abcdef', substring(sk, 1, 1)) - 1 AS BIGINT)
      |      AS shard
      |  FROM k
      |)
      |SELECT doc_id, shard,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY sk, doc_id)
      |    AS BIGINT) AS pos
      |FROM s ORDER BY shard, pos""".stripMargin

  // ── HTML → text extraction ──────────────────────────────────────────────
  // Documents are wrapped in a realistic HTML shell (script with markup
  // chars inside, style, comments, the standard entities incl. the
  // decode-once &amp;lt; trap) and stripped in-engine; the oracle replays
  // the identical RE2-portable regexp/replace chain in DuckDB.
  private val tHtmlExtract: Q = (s, dir) => {
    val html = concat(
      lit("<html><head><title>Doc</title><style>p { color: red; }</style>"),
      lit("<SCRIPT type=\"text/javascript\">if (a < 2 && b > 1) { x = \"<div>\"; }</SCRIPT></head>"),
      lit("<body><!-- header\nblock --><h1>"), col("source"), lit("</h1>"),
      lit("<p>First &amp; second &lt;tag&gt; &amp;lt;literal&amp;gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p><div>"),
      col("text"), lit("</div></body></html>"))
    Tables.documents(s, dir)
      .select(col("doc_id"), TextKit.stripHtml(html).as("clean_text"))
      .orderBy(col("doc_id"))
  }
  private val tHtmlExtractSql =
    """WITH h AS (
      |  SELECT doc_id,
      |    '<html><head><title>Doc</title><style>p { color: red; }</style>' ||
      |    '<SCRIPT type="text/javascript">if (a < 2 && b > 1) { x = "<div>"; }</SCRIPT></head>' ||
      |    '<body><!-- header' || chr(10) || 'block --><h1>' || source || '</h1>' ||
      |    '<p>First &amp; second &lt;tag&gt; &amp;lt;literal&amp;gt; &quot;q&quot; &#39;s&#39; a&nbsp;b</p><div>' ||
      |    text || '</div></body></html>' AS x
      |  FROM documents
      |), s1 AS (
      |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
      |    regexp_replace(x,
      |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
      |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
      |      '(?s)<!--.*?-->', ' ', 'g'),
      |      '(?s)<[^>]*>', ' ', 'g') AS x
      |  FROM h
      |), s2 AS (
      |  SELECT doc_id, replace(replace(replace(replace(replace(replace(x,
      |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      |    '&nbsp;', ' '), '&amp;', '&') AS x
      |  FROM s1
      |)
      |SELECT doc_id, trim(regexp_replace(x, '\s+', ' ', 'g')) AS clean_text
      |FROM s2 ORDER BY doc_id""".stripMargin

  // ── TF-IDF keyword extraction ───────────────────────────────────────────
  // Exact integer-bits IDF (same binary-expansion log2 as t_unigram_lm), so
  // both engines rank identical integer scores; ties break on the token
  // string — a total order per document.
  private val tTfidf: Q = (s, dir) => {
    graft.ops.Corpus.tfidfKeywords(Tables.documents(s, dir), "doc_id", "text",
        topK = 3)
      .orderBy(col("doc_id"), col("rank"))
  }
  private val tTfidfSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), tf AS (
      |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM t GROUP BY 1, 2
      |), dfq AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY w
      |), d AS (
      |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM tf
      |), sc AS (
      |  SELECT tf.doc_id, tf.w, tf.tf,
      |    CAST(tf.tf * (length(bin(d.nd)) - length(bin(dfq.dfc))) AS BIGINT)
      |      AS score
      |  FROM tf JOIN dfq USING (w) CROSS JOIN d
      |), r AS (
      |  SELECT doc_id, w, tf, score,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w)
      |      AS rank
      |  FROM sc
      |)
      |SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS token, tf, score
      |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin

  // ── composite Gopher-style filter verdict ───────────────────────────────
  // The decision step the signal queries feed: keep/drop plus sorted
  // failure-reason codes. Thresholds are tuned so the sf corpus exercises
  // both verdicts and three distinct reason codes.
  private val tDocFilter: Q = (s, dir) => {
    graft.ops.Corpus.gopherFilter(Tables.documents(s, dir), "doc_id", "text",
        minWords = 15L, maxWords = 100000L, maxDupLineFrac = 0.30,
        maxTopWordFrac = 0.20, minQualityBps = 6000L)
      .orderBy(col("doc_id"))
  }
  private val tDocFilterSql =
    """WITH base AS (
      |  SELECT doc_id,
      |    CASE WHEN len(trim(text)) = 0 THEN []
      |         ELSE regexp_split_to_array(trim(text), '\s+') END AS ws,
      |    list_filter(list_transform(string_split(text, chr(10)), l -> trim(l)),
      |                l -> len(l) > 0) AS ls,
      |    CAST(length(text) AS DOUBLE) AS nchars,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS puncts
      |  FROM documents
      |), sig AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS n_words,
      |    CASE WHEN len(ls) > 0
      |      THEN (CAST(len(ls) AS DOUBLE) - len(list_distinct(ls)))
      |             / CAST(len(ls) AS DOUBLE)
      |      ELSE 0 END AS dup_line_frac,
      |    CASE WHEN len(ws) > 0
      |      THEN CAST(list_max(list_transform(list_distinct(ws),
      |             w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE)
      |             / CAST(len(ws) AS DOUBLE)
      |      ELSE 0 END AS top_word_frac,
      |    CAST(round((least(nchars / 200.0, 1.0) * 0.5
      |      + least(stops / greatest(CAST(len(ws) AS DOUBLE), 1.0), 1.0) * 0.3
      |      + (1.0 - least(puncts / greatest(CAST(len(ws) AS DOUBLE), 1.0), 1.0)) * 0.2)
      |      * 10000, 0) AS BIGINT) AS quality_bps
      |  FROM base
      |), r AS (
      |  SELECT doc_id,
      |    coalesce(array_to_string(list_sort(list_filter([
      |      CASE WHEN n_words < 15 THEN 'too_short' END,
      |      CASE WHEN n_words > 100000 THEN 'too_long' END,
      |      CASE WHEN dup_line_frac > 0.30 THEN 'rep_line' END,
      |      CASE WHEN top_word_frac > 0.20 THEN 'rep_word' END,
      |      CASE WHEN quality_bps < 6000 THEN 'low_quality' END],
      |      x -> x IS NOT NULL)), ','), '') AS reasons
      |  FROM sig
      |)
      |SELECT doc_id, reasons = '' AS keep, reasons
      |FROM r ORDER BY doc_id""".stripMargin

  // ── BPE-pair statistics (tokenizer-training kernel) ─────────────────────
  // Top 50 adjacent-char pairs by corpus frequency; integer-only output,
  // ties broken by pair text.
  private val tBpePairs: Q = (s, dir) => {
    graft.ops.Corpus.bpePairStats(Tables.documents(s, dir), "text")
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(50)
  }
  // ── feature-hashed text embedding (hashing trick) ───────────────────────
  // Assertion-row gate: n_docs and n_empty are data-derived SQL; the
  // engine-checked invariants are (a) every nonempty doc's vector is
  // unit-norm (empty → zero vector), (b) the embedding is exactly
  // bag-of-words — reversing token order yields the identical vector.
  private val tHashEmbed: Q = (s, dir) => {
    val dim = 64
    val v = graft.functions.NativeVectorKit.hashEmbed(col("text"), dim)
    val vRev = graft.functions.NativeVectorKit.hashEmbed(
      array_join(reverse(TextKit.tokens(col("text"))), " "), dim)
    val norm2 = aggregate(v, lit(0.0), (acc, x) => acc + x * x)
    val emb = Tables.documents(s, dir).select(col("text"),
      v.as("v"), vRev.as("vr"), norm2.as("n2"))
    emb.agg(
      count(lit(1)).as("n_docs"),
      sum(when(length(trim(col("text"))) === 0, 1L).otherwise(0L)).as("n_empty"),
      sum(when(abs(col("n2") - 1.0) < 1e-9 || col("n2") === 0.0, 0L)
        .otherwise(1L)).as("norm_violations"),
      sum(when(col("v") === col("vr"), 0L).otherwise(1L))
        .as("permutation_mismatch"))
  }
  private val tHashEmbedSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_empty,
      |  CAST(0 AS BIGINT) AS norm_violations,
      |  CAST(0 AS BIGINT) AS permutation_mismatch
      |FROM documents""".stripMargin

  // ── compression-ratio quality signal ────────────────────────────────────
  // Deflate ratio separates REPETITIVE text (LZ77 collapses it) from
  // high-entropy noise (incompressible): 40 planted boilerplate docs (one
  // sentence repeated 80×) must land far below 250,000 ppm, 40 planted
  // hex-noise docs (256 chars of md5 output — a 16-symbol alphabet, so
  // even an entropy-optimal coder cannot go below 500,000) must land above
  // 400,000, and non-empty corpus docs must stay positive. The thresholds
  // hold by construction, SF-independently, so the oracle replays the
  // counting arithmetic.
  private val tCompressionRatio: Q = (s, dir) => {
    val rep = s.range(40).select((col("id") + 3000000L).as("doc_id"),
      lit("rep").as("cls"),
      array_join(array_repeat(
        lit("all work and no play makes jack a dull boy."), 80), " ").as("text"))
    val noise = s.range(40).select((col("id") + 4000000L).as("doc_id"),
      lit("noise").as("cls"),
      concat((0 until 8).map(i =>
        md5(concat(lit(s"salt$i-"), col("id").cast("string")))): _*).as("text"))
    val real = Tables.documents(s, dir)
      .select(col("doc_id"), lit("real").as("cls"), col("text"))
    real.unionByName(rep).unionByName(noise)
      .withColumn("ppm", TextKit.compressionRatioPpm(col("text")))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cls") === "rep" && col("ppm") < 250000L, 1L)
          .otherwise(0L)).as("rep_below"),
        sum(when(col("cls") === "noise" && col("ppm") > 400000L, 1L)
          .otherwise(0L)).as("noise_above"),
        sum(when(length(col("text")) > 0 && col("ppm") <= 0L, 1L)
          .otherwise(0L)).as("nonpos_violations"),
        sum(when(length(col("text")) === 0 && col("ppm") =!= 1000000L, 1L)
          .otherwise(0L)).as("empty_violations"))
  }
  private val tCompressionRatioSql =
    """SELECT CAST(count(*) + 80 AS BIGINT) AS n_docs,
      |  CAST(40 AS BIGINT) AS rep_below,
      |  CAST(40 AS BIGINT) AS noise_above,
      |  CAST(0 AS BIGINT) AS nonpos_violations,
      |  CAST(0 AS BIGINT) AS empty_violations
      |FROM documents""".stripMargin

  // ── corpus health monitoring (the pipeline-ops dashboard queries) ───────
  // One row per (source, lang): doc/token/char counts and mean quality —
  // the partition-level health table a production ingest job publishes
  // after every batch. Pure two-level aggregation, map-side combined.
  private val tCorpusStats: Q = (s, dir) => {
    Tables.documents(s, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextKit.tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        Kit.bps(avg(TextKit.qualityScore(col("text")))).as("mean_quality_bps"))
      .orderBy(col("source"), col("lang"))
  }
  private val tCorpusStatsSql =
    """WITH f AS (
      |  SELECT source, lang, text,
      |    CASE WHEN length(trim(text)) = 0 THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS toks,
      |    CAST(length(text) AS DOUBLE) AS nchars,
      |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS qtoks,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS puncts
      |  FROM documents
      |)
      |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(toks) AS BIGINT) AS n_tokens,
      |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
      |  CAST(round(avg(least(nchars / 200.0, 1.0) * 0.5
      |    + least(stops / qtoks, 1.0) * 0.3
      |    + (1.0 - least(puncts / qtoks, 1.0)) * 0.2) * 10000, 0) AS BIGINT)
      |    AS mean_quality_bps
      |FROM f GROUP BY source, lang ORDER BY source, lang""".stripMargin

  // Sketch-based distinct monitoring: per-source unique-content counts via
  // HLL++ (approx_count_distinct) — at 100 TB the exact distinct is a full
  // shuffle of the key universe while the sketch is KBs per group and
  // mergeable across partitions/days. HLL implementations differ across
  // engines, so the gate is the assertion-row pattern: the exact count
  // (oracle-replayable) plus an in-engine bound check that the
  // deterministic HLL estimate landed within 3×rsd (floored at ±10 for
  // tiny groups); the oracle replays the bound as a literal.
  private val tApproxDistinct: Q = (s, dir) => {
    val fp = md5(col("text").cast("binary"))
    Tables.documents(s, dir)
      .groupBy(col("source"))
      .agg(countDistinct(fp).as("n_exact"),
        approx_count_distinct(fp, rsd = 0.05).as("__n_approx"))
      .select(col("source"), col("n_exact"),
        (abs(col("__n_approx") - col("n_exact")).cast("double") <=
          greatest(col("n_exact").cast("double") * 0.15, lit(10.0)))
          .as("within_bound"))
      .orderBy(col("source"))
  }
  private val tApproxDistinctSql =
    """SELECT source, CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_exact,
      |  true AS within_bound
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // Embedding drift monitoring: per-dimension mean and L2 statistics —
  // the check that catches an upstream encoder change before it poisons
  // every ANN index built on the corpus. posexplode + groupBy(dim):
  // one shuffle on (dim), map-side combined, dim-bounded output.
  private val simEmbeddingStats: Q = (s, dir) => {
    val em = Tables.embeddings(s, dir)
    em.select(posexplode(VectorKit.asDouble(col("embedding"))).as(Seq("dim", "x")))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        Kit.microUnits(avg(col("x"))).as("mean_micro"),
        Kit.microUnits(avg(col("x") * col("x"))).as("meansq_micro"))
      .orderBy(col("dim"))
  }
  private val simEmbeddingStatsSql =
    """WITH v AS (
      |  SELECT unnest(CAST(embedding AS DOUBLE[])) AS x,
      |    generate_subscripts(embedding, 1) - 1 AS dim
      |  FROM embeddings
      |)
      |SELECT dim, CAST(count(*) AS BIGINT) AS n,
      |  CAST(round(avg(x) * 1000000, 0) AS BIGINT) AS mean_micro,
      |  CAST(round(avg(x * x) * 1000000, 0) AS BIGINT) AS meansq_micro
      |FROM v GROUP BY dim ORDER BY dim""".stripMargin

  // ── corpus-relative quality gate (keep top 60% by quality score) ────────
  private val tQualityGate: Q = (s, dir) => {
    val scored = Tables.documents(s, dir)
      .select(col("doc_id"), Kit.bps(TextKit.qualityScore(col("text"))).as("quality_bps"))
    graft.ops.Corpus.quantileGate(scored, col("quality_bps"), q = 0.4)
      .orderBy(col("doc_id"))
  }
  private val tQualityGateSql =
    """WITH f AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS DOUBLE) AS nchars,
      |    greatest(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 1.0) AS toks,
      |    CAST(len(regexp_extract_all(text, '\b(the|a|an|and|or|of|to|in|is|it)\b')) AS DOUBLE) AS stops,
      |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS puncts
      |  FROM documents
      |), q2 AS (
      |  SELECT doc_id,
      |    CAST(round((least(nchars / 200.0, 1.0) * 0.5
      |      + least(stops / toks, 1.0) * 0.3
      |      + (1.0 - least(puncts / toks, 1.0)) * 0.2) * 10000, 0) AS BIGINT)
      |      AS quality_bps
      |  FROM f
      |), h AS (
      |  SELECT quality_bps AS s, count(*) AS c FROM q2 GROUP BY 1
      |), t AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n FROM h
      |), cum AS (
      |  SELECT s, sum(c) OVER (ORDER BY s) AS cum FROM h
      |), thr AS (
      |  SELECT min(s) AS thr FROM cum, t WHERE cum >= ceil(n * 0.4)
      |)
      |SELECT doc_id, quality_bps FROM q2, thr
      |WHERE quality_bps >= thr ORDER BY doc_id""".stripMargin

  // ── overlapping token-window chunking (embedding/RAG prep) ──────────────
  private val tChunk: Q = (s, dir) => {
    graft.ops.Corpus.chunkText(Tables.documents(s, dir), "doc_id", "text",
        chunkTokens = 64, overlapTokens = 16)
      .orderBy(col("doc_id"), col("chunk_idx"))
  }
  private val tChunkSql =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
      |  FROM documents WHERE length(trim(text)) > 0
      |), c AS (
      |  SELECT doc_id, unnest(range(0, greatest(len(tk) - 16, 1), 48)) AS s, tk
      |  FROM d
      |)
      |SELECT doc_id, CAST(s // 48 AS BIGINT) AS chunk_idx,
      |  array_to_string(list_slice(tk, s + 1, s + 64), ' ') AS chunk_text,
      |  CAST(len(list_slice(tk, s + 1, s + 64)) AS BIGINT) AS n_tokens
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ── bigram LM surprisal (conditional bits, self-trained) ────────────────
  private val tBigramLm: Q = (s, dir) => {
    graft.ops.Corpus.bigramSurprisal(Tables.documents(s, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }
  private val tBigramLmSql =
    """WITH d AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
      |  FROM documents WHERE length(trim(text)) > 0
      |), p AS (
      |  SELECT doc_id,
      |    unnest([{'w1': tk[i], 'w2': tk[i + 1]} for i in range(1, len(tk))]) AS pr
      |  FROM d WHERE len(tk) >= 2
      |), tf AS (
      |  SELECT doc_id, pr.w1 AS w1, pr.w2 AS w2, CAST(count(*) AS BIGINT) AS tf
      |  FROM p GROUP BY 1, 2, 3
      |), bg AS (
      |  SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS cnt FROM tf GROUP BY 1, 2
      |), cx AS (
      |  SELECT w1, CAST(sum(cnt) AS BIGINT) AS ctx FROM bg GROUP BY 1
      |)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_pairs,
      |  CAST(sum(tf * (length(bin(cx.ctx)) - length(bin(bg.cnt)))) AS BIGINT)
      |    AS bigram_bits,
      |  CAST((sum(tf * (length(bin(cx.ctx)) - length(bin(bg.cnt)))) * 100)
      |    // sum(tf) AS BIGINT) AS mean_centibits
      |FROM tf JOIN bg USING (w1, w2) JOIN cx USING (w1)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── canonical text normalization (NFC + whitespace) ─────────────────────
  // The dedup-key canonicalization step; casefold off (engine lowercase
  // tables drift across ICU versions — NFC + whitespace is the stable
  // cross-engine contract, and the spec covers casefold + combining marks).
  private val tNormalize: Q = (s, dir) => {
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.functions.NativeTextKit.normalizeText(col("text")).as("norm"),
        (length(col("text")) - length(
          graft.functions.NativeTextKit.normalizeText(col("text"))))
          .cast("long").as("shrunk_chars"))
      .orderBy(col("doc_id"))
  }
  private val tNormalizeSql =
    """WITH n AS (
      |  SELECT doc_id,
      |    trim(regexp_replace(nfc_normalize(text), '\s+', ' ', 'g')) AS norm,
      |    text
      |  FROM documents
      |)
      |SELECT doc_id, norm,
      |  CAST(length(text) - length(norm) AS BIGINT) AS shrunk_chars
      |FROM n ORDER BY doc_id""".stripMargin

  // ── DSIR-style importance weighting (target = English sub-corpus) ───────
  // Gate compares (doc_id, n_tokens, delta_bits) — pure integer sums with
  // exact bin()-length log2 on both engines. mean_centidelta is excluded:
  // delta_bits goes negative for out-of-target docs and Spark `div`
  // truncates toward zero where DuckDB `//` floors.
  private val tImportance: Q = (s, dir) => {
    graft.ops.Corpus.importanceWeights(Tables.documents(s, dir), "doc_id",
        "text", col("lang") === "en")
      .select(col("doc_id"), col("n_tokens"), col("delta_bits"))
      .orderBy(col("doc_id"))
  }
  private val tImportanceSql =
    """WITH t AS (
      |  SELECT doc_id, lang = 'en' AS tgt,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |), tf AS (
      |  SELECT doc_id, tgt, w, CAST(count(*) AS BIGINT) AS tf
      |  FROM t GROUP BY 1, 2, 3
      |), v AS (
      |  SELECT w, CAST(sum(tf) AS BIGINT) AS cnt,
      |    CAST(sum(CASE WHEN tgt THEN tf ELSE 0 END) AS BIGINT) AS tcnt
      |  FROM tf GROUP BY w
      |), n AS (
      |  SELECT CAST(sum(cnt) AS BIGINT) AS total,
      |    CAST(sum(tcnt) AS BIGINT) AS ttotal FROM v
      |)
      |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
      |  CAST(sum(tf * ((length(bin(n.total)) - length(bin(v.cnt))) -
      |    (length(bin(n.ttotal)) - length(bin(greatest(v.tcnt, 1))))))
      |    AS BIGINT) AS delta_bits
      |FROM tf JOIN v USING (w) CROSS JOIN n
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ── full BPE tokenizer training (iterative merge selection) ─────────────
  // 12 distributed training rounds on the documents corpus, gated three
  // ways in one row: n_words and the ROUND-1 argmax (pair + weighted count)
  // are data-derived and SQL-replayed (round 1 of the trainer IS
  // t_bpe_pairs' census top-1, tie-break aligned); encode_mismatch=0
  // asserts the two independent merge-application paths — the chained
  // Catalyst `aggregate`-fold and the imperative native encoder — agree
  // symbol-for-symbol on EVERY distinct word of the corpus.
  private val tBpeTrain: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val merges = graft.ops.Corpus.trainBpeMerges(docs, "text", nMerges = 12)
    val table = merges.map { case (l, r, _) => (l, r) }
    val dict = docs
      .select(explode(TextKit.tokens(col("text"))).as("w")).distinct()
    val sym0 = filter(split(col("w"), ""), s0 => length(s0) > 0)
    val eq = graft.ops.Corpus.applyBpeMerges(sym0, table) ===
      graft.functions.NativeTextKit.bpeEncodeWord(col("w"), table)
    dict.agg(
      count(lit(1)).as("n_words"),
      sum(when(eq, 0L).otherwise(1L)).as("encode_mismatch"))
      .select(col("n_words"),
        lit(merges.head._1 + " " + merges.head._2).as("first_pair"),
        lit(merges.head._3).as("first_count"),
        lit(merges.length.toLong).as("n_merges"),
        col("encode_mismatch"))
  }
  private val tBpeTrainSql =
    """WITH t AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0
      |), v AS (
      |  SELECT tok, count(*) AS c FROM t GROUP BY tok
      |), p AS (
      |  SELECT unnest([substring(tok, i, 1) || ' ' || substring(tok, i + 1, 1)
      |                 for i in range(1, length(tok))]) AS pair, c
      |  FROM v WHERE length(tok) >= 2
      |), top1 AS (
      |  SELECT pair, CAST(sum(c) AS BIGINT) AS pc FROM p
      |  GROUP BY pair ORDER BY sum(c) DESC, pair LIMIT 1
      |)
      |SELECT (SELECT CAST(count(DISTINCT tok) AS BIGINT) FROM t) AS n_words,
      |  (SELECT pair FROM top1) AS first_pair,
      |  (SELECT pc FROM top1) AS first_count,
      |  CAST(12 AS BIGINT) AS n_merges,
      |  CAST(0 AS BIGINT) AS encode_mismatch""".stripMargin

  // ── whole-corpus BPE encoding (trained merges applied per document) ─────
  // Trains 6 merges, encodes the corpus (vocab-bound: one native encode per
  // DISTINCT word, multiplied back through the (doc, word, tf) aggregate),
  // and gates on theorem-backed invariants the oracle replays as counting
  // arithmetic: total word count (SQL-replayed), native ≡ fold encoder
  // agreement over the full vocabulary, and per-word length conservation
  // (BPE merges only concatenate, so encoded symbol lengths must sum to
  // the word length — any drift in either encoder breaks it).
  private val tBpeEncode: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val merges = graft.ops.Corpus.trainBpeMerges(docs, "text", nMerges = 6)
      .map { case (l, r, _) => (l, r) }
    val enc = graft.ops.Corpus.bpeEncodeDocs(docs, "doc_id", "text", merges)
    val dict = docs
      .select(explode(TextKit.tokens(col("text"))).as("w")).distinct()
    val sym0 = filter(split(col("w"), ""), s0 => length(s0) > 0)
    val nat = graft.functions.NativeTextKit.bpeEncodeWord(col("w"), merges)
    val lenOk = aggregate(nat, lit(0L), (a, x) => a + length(x)) ===
      length(col("w")).cast("long")
    val vStats = dict.agg(
      sum(when(nat === graft.ops.Corpus.applyBpeMerges(sym0, merges), 0L)
        .otherwise(1L)).as("encode_mismatch"),
      sum(when(lenOk, 0L).otherwise(1L)).as("len_violation"))
    val dStats = enc.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_words")).as("total_words"))
    dStats.crossJoin(vStats)
  }
  private val tBpeEncodeSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      |  FROM documents WHERE length(trim(text)) > 0
      |)
      |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS total_words,
      |  CAST(0 AS BIGINT) AS encode_mismatch,
      |  CAST(0 AS BIGINT) AS len_violation
      |FROM t""".stripMargin

  private val tBpePairsSql =
    """WITH t AS (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0
      |), v AS (
      |  SELECT tok, count(*) AS c FROM t GROUP BY tok
      |), p AS (
      |  SELECT unnest([substring(tok, i, 1) || ' ' || substring(tok, i + 1, 1)
      |                 for i in range(1, length(tok))]) AS pair, c
      |  FROM v WHERE length(tok) >= 2
      |)
      |SELECT pair, CAST(sum(c) AS BIGINT) AS pair_count
      |FROM p GROUP BY pair
      |ORDER BY pair_count DESC, pair LIMIT 50""".stripMargin

  // ── deterministic per-key quota sampling (domain caps) ──────────────────
  // source plays the domain role; quota 20 < the ~25 docs/source, so every
  // key is thinned by the content-hash rule and the kept multiset is
  // engine-exact (md5 parity + integer-div threshold).
  private val tDomainQuota: Q = (s, dir) => {
    graft.ops.Corpus.quotaSample(Tables.documents(s, dir), "source", "text",
        quota = 20L, salt = "dq")
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }
  private val tDomainQuotaSql =
    """WITH c AS (
      |  SELECT source, count(*) AS n FROM documents GROUP BY source
      |), k AS (
      |  SELECT doc_id, d.source, n, substring(md5('dq' || text), 1, 4) AS h
      |  FROM documents d JOIN c USING (source)
      |)
      |SELECT doc_id, source FROM k
      |WHERE n <= 20 OR h < printf('%04x', (20 * 65536) // n)
      |ORDER BY doc_id""".stripMargin

  // ── near-dup-aware split (leakage-proof across near-dup families) ───────
  // Every document takes the split of its cluster canonical's text; the
  // oracle replays the recursive-CTE transitive closure and the md5 carve.
  private val tClusterSplit: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      threshold = 0.8, numHashes = 128, shingleLen = 5, bands = 16, oph = true)
    graft.ops.Corpus.clusterAwareSplit(docs, "doc_id", "text",
        Dedup.nearDupClusters(pairs))
      .orderBy(col("doc_id"))
  }
  private val tClusterSplitSql =
    """WITH RECURSIVE g AS (
      |  SELECT doc_id,
      |    list_distinct([substring(text, x, 5) for x in range(1, length(text) - 3)]) AS gs
      |  FROM documents
      |), p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gs AS ga, b.gs AS gb
      |  FROM g a JOIN g b ON a.doc_id < b.doc_id
      |    AND len(a.gs) * 5 >= len(b.gs) * 4 AND len(b.gs) * 5 >= len(a.gs) * 4
      |), j AS (
      |  SELECT doc_a, doc_b,
      |    CASE WHEN len(ga) + len(gb) = 0 THEN 0.0
      |         ELSE CAST(len(list_intersect(ga, gb)) AS DOUBLE) /
      |      (CAST(len(ga) + len(gb) AS DOUBLE) - CAST(len(list_intersect(ga, gb)) AS DOUBLE)) END AS jac
      |  FROM p
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM j WHERE jac >= 0.8
      |), edges AS (
      |  SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |), cc(node, label) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT e.a, cc.label FROM edges e JOIN cc ON cc.node = e.b
      |), cmap AS (
      |  SELECT node, min(label) AS canonical FROM cc GROUP BY node
      |), canon AS (
      |  SELECT d.doc_id, coalesce(cmap.canonical, d.doc_id) AS cid
      |  FROM documents d LEFT JOIN cmap ON d.doc_id = cmap.node
      |)
      |SELECT canon.doc_id,
      |  CASE WHEN substring(md5(t.text), 1, 1) < 'd' THEN 'train'
      |       WHEN substring(md5(t.text), 1, 1) < 'f' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM canon JOIN documents t ON t.doc_id = canon.cid
      |ORDER BY canon.doc_id""".stripMargin

  // ── full-text search: positional inverted index, AND + phrase query ─────
  // ops/Search.scala: O(corpus) one-time index build, O(postings) query —
  // the leak-hunting / contamination-triage shape a 100 TB corpus cannot
  // serve by regex scan. Oracles replay the token/position construction.
  private val tSearchAnd: Q = (s, dir) => {
    val idx = graft.ops.Search.invertedIndex(
      Tables.documents(s, dir), "doc_id", "text")
    graft.ops.Search.andQuery(idx, Seq("hash", "join", "scan"))
      .withColumnRenamed("doc", "doc_id")
      .orderBy(col("doc_id"))
  }
  private val tSearchAndSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0
      |)
      |SELECT doc_id FROM t WHERE tok IN ('hash', 'join', 'scan')
      |GROUP BY doc_id HAVING count(DISTINCT tok) = 3
      |ORDER BY doc_id""".stripMargin

  private val tSearchPhrase: Q = (s, dir) => {
    val idx = graft.ops.Search.invertedIndex(
      Tables.documents(s, dir), "doc_id", "text")
    graft.ops.Search.phraseQuery(idx, Seq("hash", "join"))
      .withColumnRenamed("doc", "doc_id")
      .orderBy(col("doc_id"))
  }
  private val tSearchPhraseSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
      |    generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) - 1
      |      AS pos
      |  FROM documents WHERE length(trim(text)) > 0
      |), a AS (
      |  SELECT doc_id, pos AS anchor FROM t WHERE tok = 'hash'
      |  UNION ALL
      |  SELECT doc_id, pos - 1 AS anchor FROM t WHERE tok = 'join'
      |), m AS (
      |  SELECT doc_id, anchor FROM a WHERE anchor >= 0
      |  GROUP BY doc_id, anchor HAVING count(*) = 2
      |)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // BM25 ranked retrieval on the same index: Lucene-form idf, micro-
  // quantized scores; only query-term postings + two corpus scalars flow.
  private val tSearchRanked: Q = (s, dir) => {
    val idx = graft.ops.Search.invertedIndex(
      Tables.documents(s, dir), "doc_id", "text")
    graft.ops.Search.bm25Query(idx, Seq("hash", "join", "scan"))
      .withColumnRenamed("doc", "doc_id")
      .orderBy(col("score_micro").desc, col("doc_id"))
  }
  private val tSearchRankedSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents WHERE length(trim(text)) > 0
      |), dl AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY 1
      |), corpus AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl FROM dl
      |), posting AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks
      |  WHERE tok IN ('hash', 'join', 'scan') GROUP BY 1, 2
      |), dfs AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS df FROM posting GROUP BY 1
      |)
      |SELECT doc_id,
      |  CAST(round(sum(
      |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
      |      * tf * (1.2 + 1.0)
      |      / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      |  ) * 1000000.0, 0) AS BIGINT) AS score_micro
      |FROM posting JOIN dfs USING (tok) JOIN dl USING (doc_id)
      |CROSS JOIN corpus
      |GROUP BY doc_id
      |ORDER BY score_micro DESC, doc_id""".stripMargin

  // ── multi-pattern blocklist counting (Aho–Corasick, one pass) ───────────
  // Per doc, occurrence counts of every tracked phrase from ONE automaton
  // pass ([[graft.functions.MultiMatch]]); the oracle replays each count
  // with replace-arithmetic (patterns chosen borderless w.r.t. the corpus,
  // so non-overlapping replace counting equals all-occurrence counting).
  private val blockPats =
    Seq("table", "hash", "agg query", "window merge", "zz absent zz")
  private val tBlocklist: Q = (s, dir) => {
    val c = graft.functions.MultiMatch.patternCounts(col("text"), blockPats)
    Tables.documents(s, dir)
      .select(col("doc_id"), c.as("__c"))
      .select(col("doc_id"),
        element_at(col("__c"), 1).as("n_table"),
        element_at(col("__c"), 2).as("n_hash"),
        element_at(col("__c"), 3).as("n_aggq"),
        element_at(col("__c"), 4).as("n_wm"),
        element_at(col("__c"), 5).as("n_absent"),
        expr("aggregate(__c, 0L, (a, x) -> a + x)").as("hits"),
        expr("size(filter(__c, x -> x > 0))").as("n_pats"))
      .orderBy(col("doc_id"))
  }
  private val tBlocklistSql = {
    def cnt(p: String, as: String) =
      s"(length(text) - length(replace(text, '$p', ''))) // ${p.length} AS $as"
    s"""SELECT doc_id,
       |  ${cnt("table", "n_table")},
       |  ${cnt("hash", "n_hash")},
       |  ${cnt("agg query", "n_aggq")},
       |  ${cnt("window merge", "n_wm")},
       |  ${cnt("zz absent zz", "n_absent")},
       |  n_table + n_hash + n_aggq + n_wm + n_absent AS hits,
       |  CAST((n_table > 0)::INT + (n_hash > 0)::INT + (n_aggq > 0)::INT
       |    + (n_wm > 0)::INT + (n_absent > 0)::INT AS INT) AS n_pats
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ── preference-pair construction (DPO/RLHF data prep) ────────────────
  // Per (source, lang) bucket: the highest-scoring document (lexical
  // diversity = distinct whitespace tokens; ties broken by doc_id) is
  // the CHOSEN response; every bucket-mate at least `margin` below it
  // becomes a REJECTED partner. One hash shuffle on the bucket key for
  // the argmax, then a broadcast join of the per-bucket winner back —
  // the preference-mining shape that scales to a 100 TB corpus (the
  // winners table is one row per bucket, KB-sized).
  private val tPreferencePairs: Q = (s, dir) => {
    val margin = 8L
    val scored = Tables.documents(s, dir).select(
      col("doc_id"), col("source"), col("lang"),
      size(array_distinct(split(col("text"), " "))).cast("long").as("score"))
    val chosen = scored.groupBy("source", "lang")
      .agg(max(struct(col("score"), col("doc_id"))).as("c"))
      .select(col("source"), col("lang"),
        col("c.score").as("c_score"), col("c.doc_id").as("chosen_id"))
    scored.join(broadcast(chosen), Seq("source", "lang"))
      .filter(col("doc_id") =!= col("chosen_id") &&
        col("score") <= col("c_score") - margin)
      .select(col("source"), col("lang"), col("chosen_id"),
        col("doc_id").as("rejected_id"),
        (col("c_score") - col("score")).as("margin"))
      .orderBy("source", "lang", "rejected_id")
  }
  private val tPreferencePairsSql =
    """WITH scored AS (
      |  SELECT doc_id, source, lang,
      |         CAST(length(list_distinct(string_split(text, ' '))) AS BIGINT)
      |           AS score
      |  FROM documents
      |), chosen AS (
      |  SELECT source, lang, score AS c_score, doc_id AS chosen_id
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source, lang
      |                   ORDER BY score DESC, doc_id DESC) AS rn
      |        FROM scored)
      |  WHERE rn = 1
      |)
      |SELECT s.source, s.lang, c.chosen_id, s.doc_id AS rejected_id,
      |       c.c_score - s.score AS margin
      |FROM scored s JOIN chosen c USING (source, lang)
      |WHERE s.doc_id <> c.chosen_id AND s.score <= c.c_score - 8
      |ORDER BY source, lang, rejected_id""".stripMargin

  val all: Map[String, Q] = Map(
    "t_preference_pairs" -> tPreferencePairs,
    "t_blocklist" -> tBlocklist,
    "t_search_and" -> tSearchAnd,
    "t_search_phrase" -> tSearchPhrase,
    "t_search_ranked" -> tSearchRanked,
    "dd_exact_hash" -> ddExact,
    "dd_ngram_jaccard" -> ddNgram,
    "dd_minhash_lsh" -> ddMinhash,
    "dd_incremental" -> ddIncremental,
    "dd_cluster_canonical" -> ddCluster,
    "dd_simhash" -> ddSimhash,
    "dd_embedding_neardup" -> ddEmbedding,
    "dd_embedding_threshold" -> ddEmbeddingThreshold,
    "sim_topk_bruteforce" -> simTopK,
    "sim_topk_lsh" -> simLsh,
    "sim_topk_ivf" -> simIvf,
    "sim_topk_ivf_persisted" -> simIvfPersisted,
    "sim_topk_ivfpq" -> simIvfPq,
    "sim_int8_quant" -> simInt8,
    "sim_negatives" -> simNegatives,
    "t_diversity" -> tDiversity,
    "t_span_corrupt" -> tSpanCorrupt,
    "dd_set_jaccard" -> ddSetJaccard,
    "dd_semantic_dedup" -> ddSemantic,
    "t_bpe_train" -> tBpeTrain,
    "t_bpe_encode" -> tBpeEncode,
    "t_importance_weight" -> tImportance,
    "t_normalize" -> tNormalize,
    "t_bigram_lm" -> tBigramLm,
    "t_chunk_windows" -> tChunk,
    "t_quality_gate" -> tQualityGate,
    "t_corpus_stats" -> tCorpusStats,
    "t_approx_distinct" -> tApproxDistinct,
    "t_hash_embed" -> tHashEmbed,
    "sim_embedding_stats" -> simEmbeddingStats,
    "t_token_count" -> tTokens,
    "t_quality_score" -> tQuality,
    "t_quality_card" -> tQualityCard,
    "t_repetition" -> tRepetition,
    "t_compression_ratio" -> tCompressionRatio,
    "t_mixture_sample" -> tMixture,
    "t_temperature_mixture" -> tTemperatureMixture,
    "dd_line_dedup" -> ddLineDedup,
    "t_pii_redact" -> tPiiRedact,
    "t_url_kit" -> tUrlKit,
    "dd_span_dedup" -> ddSpanDedup,
    "dd_span_removal" -> ddSpanRemoval,
    "t_tfidf" -> tTfidf,
    "t_html_extract" -> tHtmlExtract,
    "t_shard_order" -> tShardOrder,
    "dd_url_dedup" -> ddUrlDedup,
    "dd_containment" -> ddContainment,
    "dd_bloom_antijoin" -> ddBloomAntijoin,
    "t_unigram_lm" -> tUnigramLm,
    "t_doc_filter" -> tDocFilter,
    "t_bpe_pairs" -> tBpePairs,
    "t_domain_quota" -> tDomainQuota,
    "t_cluster_split" -> tClusterSplit,
    "t_lang_id" -> tLang,
    "t_script_profile" -> tScriptProfile,
    "t_sentence_split" -> tSentenceSplit,
    "t_link_extract" -> tLinkExtract,
    "t_fingerprint" -> tFingerprint,
    "t_corpus_split" -> tSplit,
    "dd_decontaminate" -> ddDecontaminate,
    "t_novelty" -> tNovelty,
    "t_pack_chunks" -> tPack,
    "t_vocab" -> tVocab)

  val oracles: Map[String, String] = Map(
    "t_preference_pairs" -> tPreferencePairsSql,
    "t_blocklist" -> tBlocklistSql,
    "t_search_and" -> tSearchAndSql,
    "t_search_phrase" -> tSearchPhraseSql,
    "t_search_ranked" -> tSearchRankedSql,
    "dd_exact_hash" -> ddExactSql,
    "dd_ngram_jaccard" -> ddNgramSql,
    "dd_minhash_lsh" -> ddMinhashSql,
    "dd_incremental" -> ddIncrementalSql,
    "dd_cluster_canonical" -> ddClusterSql,
    "dd_simhash" -> ddSimhashSql,
    "dd_embedding_neardup" -> ddEmbeddingSql,
    "dd_embedding_threshold" -> ddEmbeddingThresholdSql,
    "sim_topk_bruteforce" -> simTopKSql,
    "sim_topk_ivf" -> simIvfSql,
    "sim_topk_ivf_persisted" -> simIvfPersistedSql,
    "sim_topk_lsh" -> simLshSql,
    "sim_topk_ivfpq" -> simIvfPqSql,
    "sim_int8_quant" -> simInt8Sql,
    "sim_negatives" -> simNegativesSql,
    "t_diversity" -> tDiversitySql,
    "t_span_corrupt" -> tSpanCorruptSql,
    "dd_set_jaccard" -> ddSetJaccardSql,
    "dd_semantic_dedup" -> ddSemanticSql,
    "t_bpe_train" -> tBpeTrainSql,
    "t_bpe_encode" -> tBpeEncodeSql,
    "t_importance_weight" -> tImportanceSql,
    "t_normalize" -> tNormalizeSql,
    "t_bigram_lm" -> tBigramLmSql,
    "t_chunk_windows" -> tChunkSql,
    "t_quality_gate" -> tQualityGateSql,
    "t_corpus_stats" -> tCorpusStatsSql,
    "t_approx_distinct" -> tApproxDistinctSql,
    "t_hash_embed" -> tHashEmbedSql,
    "sim_embedding_stats" -> simEmbeddingStatsSql,
    "t_token_count" -> tTokensSql,
    "t_quality_score" -> tQualitySql,
    "t_quality_card" -> tQualityCardSql,
    "t_repetition" -> tRepetitionSql,
    "t_compression_ratio" -> tCompressionRatioSql,
    "t_mixture_sample" -> tMixtureSql,
    "t_temperature_mixture" -> tTemperatureMixtureSql,
    "dd_line_dedup" -> ddLineDedupSql,
    "t_pii_redact" -> tPiiRedactSql,
    "t_url_kit" -> tUrlKitSql,
    "dd_span_dedup" -> ddSpanDedupSql,
    "dd_span_removal" -> ddSpanRemovalSql,
    "t_tfidf" -> tTfidfSql,
    "t_html_extract" -> tHtmlExtractSql,
    "t_shard_order" -> tShardOrderSql,
    "dd_url_dedup" -> ddUrlDedupSql,
    "dd_containment" -> ddContainmentSql,
    "dd_bloom_antijoin" -> ddBloomAntijoinSql,
    "t_unigram_lm" -> tUnigramLmSql,
    "t_doc_filter" -> tDocFilterSql,
    "t_bpe_pairs" -> tBpePairsSql,
    "t_domain_quota" -> tDomainQuotaSql,
    "t_cluster_split" -> tClusterSplitSql,
    "t_lang_id" -> tLangSql,
    "t_script_profile" -> tScriptProfileSql,
    "t_sentence_split" -> tSentenceSplitSql,
    "t_link_extract" -> tLinkExtractSql,
    "t_fingerprint" -> tFingerprintSql,
    "t_corpus_split" -> tSplitSql,
    "dd_decontaminate" -> ddDecontaminateSql,
    "t_novelty" -> tNoveltySql,
    "t_pack_chunks" -> tPackSql,
    "t_vocab" -> tVocabSql)
}
