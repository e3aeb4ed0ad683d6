package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Multi-batch admission invariants for the streaming corpus ingestion:
 * no document is admitted twice (exactly or as a near-dup), across batches
 * AND within a batch, and the accumulated corpus never contains a residual
 * near-dup pair.
 */
class CorpusIngestSpec extends SparkSpec {

  private val base1 =
    "the quick brown fox jumps over the lazy dog while seventeen astronauts " +
      "practice orbital mechanics in the hangar and discuss the finer points " +
      "of compiler construction over lukewarm coffee every tuesday morning"
  private val base2 =
    "in a distributed system the only things that are certain are partial " +
      "failure clock skew and the eventual arrival of a duplicate message " +
      "long after everyone involved has stopped expecting it to show up"
  private val base3 =
    "training corpora accumulate boilerplate at a rate proportional to the " +
      "popularity of the underlying template which is why capped bucketed " +
      "near duplicate detection is the first stage of every serious pipeline"
  private val base4 =
    "completely unrelated content about tidal patterns in shallow estuaries " +
      "and the migratory preferences of arctic terns measured across four " +
      "decades of increasingly automated ornithological field studies"

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("multi-batch ingestion admits each document once and leaves no residual near-dups") {
    val root = Files.createTempDirectory("corpus_ingest").toString
    val (inputDir, corpusDir, ckpt) = (s"$root/in", s"$root/corpus", s"$root/ckpt")
    val cfg = CorpusIngest.Config()

    // bootstrap: seeded corpus = {1: base1, 2: base2}
    CorpusIngest.seed(docs(1L -> base1, 2L -> base2), corpusDir, cfg = cfg)
    assert(CorpusIngest.corpus(spark, corpusDir).get.count() == 2)

    val schema = docs(0L -> "").schema
    // batch drops land as files; each processAllAvailable() drains one drop
    docs(
      10L -> (base1 + " with a tiny appended edit"), // near-dup of seeded 1 → reject
      11L -> base2,                                  // exact copy of seeded 2 → reject
      12L -> base3,                                  // novel → admit
      13L -> (base3 + " trailing tweak"),            // near-dup of 12 IN THE SAME BATCH → one survivor
      14L -> base4                                   // novel → admit
    ).write.mode("append").parquet(inputDir)

    val query = CorpusIngest.start(spark, inputDir, corpusDir, ckpt, schema, cfg = cfg)
    try {
      query.processAllAvailable()
      val afterB1 = CorpusIngest.corpus(spark, corpusDir).get
      val idsB1 = afterB1.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(idsB1 == Set(1L, 2L, 12L, 14L), s"batch 1 admitted: $idsB1")

      docs(
        20L -> (base3 + " another small tweak"),     // near-dup of 12 (admitted batch 1) → reject
        21L -> base4,                                // exact copy of 14 → reject
        22L -> (base2 + " slightly edited tail"),    // near-dup of seeded 2 → reject
        23L -> ("fresh and genuinely novel material about the economics of " +
          "caching intermediate shuffle data on spot instances with varied " +
          "eviction horizons and the resulting bid price dynamics")
      ).write.mode("append").parquet(inputDir)
      query.processAllAvailable()

      val finalCorpus = CorpusIngest.corpus(spark, corpusDir).get
      val ids = finalCorpus.select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 12L, 14L, 23L), s"final corpus: $ids")
      assert(ids.distinct.size == ids.size, "no doc admitted twice")

      // zero-residual invariant: the accumulated corpus has no near-dup pair
      val residual = Dedup.minhashNearDupPairs(finalCorpus, "doc_id", "text",
        cfg.threshold, cfg.numHashes, cfg.shingleLen, cfg.bands, oph = cfg.oph)
      assert(residual.isEmpty, s"residual near-dups: ${residual.collect().mkString(",")}")
    } finally query.stop()
  }

  test("crossDedup stage 3 prunes the reference with a bloom of the batch's " +
    "hashes (no per-batch corpus-wide distinct shuffle)") {
    val fresh = docs(1L -> base1, 2L -> base4)
    val ref = docs(10L -> base1, 11L -> base2, 12L -> base3)
    val out = CorpusIngest.crossDedup(fresh, ref, "doc_id", "text",
      CorpusIngest.Config())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prune in plan:\n$plan")
    // exact cross-dup (base1) dies in stage 3; base4 is novel and survives
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("quality gate (stage 0) rejects junk before dedup, in seed and batches") {
    val root = Files.createTempDirectory("corpus_gate").toString
    val corpusDir = s"$root/corpus"
    val cfg = CorpusIngest.Config(
      quality = Some(graft.ops.Corpus.GopherThresholds(
        minWords = 10L, minQualityBps = 0L)))
    // seed: one good doc, one 3-word junk doc → only the good one lands
    CorpusIngest.seed(docs(1L -> base1, 2L -> "tiny junk doc"), corpusDir, cfg = cfg)
    val seeded = CorpusIngest.corpus(spark, corpusDir).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(seeded == Set(1L), s"seed admitted: $seeded")
    // batch: junk, a near-dup of the seed, and a novel doc
    val n = CorpusIngest.admitBatch(
      docs(10L -> "more tiny junk", 11L -> (base1 + " edited"), 12L -> base4),
      0L, corpusDir, "doc_id", "text", cfg)
    assert(n == 1L, s"batch admitted $n")
    val ids = CorpusIngest.corpus(spark, corpusDir).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 12L), s"corpus: $ids")
  }

  test("admitBatch is idempotent under micro-batch replay (same batch id overwrites)") {
    val root = Files.createTempDirectory("corpus_replay").toString
    val corpusDir = s"$root/corpus"
    val cfg = CorpusIngest.Config()
    CorpusIngest.seed(docs(1L -> base1), corpusDir, cfg = cfg)
    val batch = docs(30L -> base2, 31L -> base3)
    val n1 = CorpusIngest.admitBatch(batch, 0L, corpusDir, "doc_id", "text", cfg)
    // a retried epoch re-runs the SAME batch id: the partition is rewritten,
    // not double-appended — corpus count is unchanged
    val n2 = CorpusIngest.admitBatch(batch, 0L, corpusDir, "doc_id", "text", cfg)
    assert(n1 == 2L)
    // the replayed epoch must not reject its docs against its OWN prior
    // write (the reference excludes the batch's partition), and must not
    // double-append them either (same partition dir is overwritten)
    assert(n2 == 2L, s"replay admitted $n2")
    val ids = CorpusIngest.corpus(spark, corpusDir).get
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 30L, 31L), s"corpus after replay: $ids")
  }
}
