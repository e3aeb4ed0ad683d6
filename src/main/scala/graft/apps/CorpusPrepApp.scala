package graft.apps

import graft.functions.TextKit
import graft.ops.{Corpus, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-corpus preparation: the batch pipeline a user runs to
 * turn a raw crawled document table into packed training shards. Composes
 * the engine's corpus operators in their production order:
 *
 *   -2. HTML extraction — (opt-in) WET-style markup stripping, so raw
 *                         crawl pages and plain-text twins unify,
 *   0. quality gate     — (opt-in) Gopher-style keep verdict: junk dropped
 *                         at scan speed before anything is paid for it,
 *   0b. line dedup      — (opt-in) cross-document boilerplate lines
 *                         stripped and text rewritten, so the dedup stages
 *                         hash CONTENT, not shared chrome,
 *   1. exact dedup      — one survivor per byte-identical text (md5 hash
 *                         groupBy; min doc id wins, deterministic),
 *   2. near-dup dedup   — MinHash-LSH pairs verified by exact Jaccard,
 *                         clustered (connected components), only each
 *                         cluster's canonical (min id) survives,
 *   3. decontamination  — any document sharing ≥ `minSharedNgrams` distinct
 *                         8-grams with the benchmark set is dropped,
 *   3b. domain quota    — (opt-in) per-source cap by deterministic
 *                         content-hash thinning (no per-key ordering —
 *                         hot domains cannot straggle),
 *   4. split            — deterministic content-hash train/val/test
 *                         (duplicate texts can't straddle splits),
 *   5. packing          — per-(split, shard) greedy contiguous chunks of
 *                         ~`tokenBudget` whitespace tokens.
 *
 * Stage order matters at scale: filtering and boilerplate removal come
 * first (the reject fraction is paid at scan speed, and line-deduped text
 * is what exact/near-dup should hash — two docs differing only in chrome
 * ARE duplicates); exact dedup then shrinks every later stage's input for
 * free (one hash shuffle); near-dup next so decontamination and packing
 * see each cluster once; the quota caps the POST-dedup distribution
 * (capping pre-dedup would let duplicates eat a domain's budget);
 * splitting before packing so chunks never mix splits.
 *
 * Every stage is lazily composed into ONE DataFrame program per output —
 * no driver-side materialization beyond what the near-dup CC loop and the
 * LSH verify already do internally (both documented at their definitions).
 */
object CorpusPrepApp {

  /** Pipeline knobs; defaults match the driver-gated query parameters. */
  case class Config(
      jaccardThreshold: Double = 0.8,
      numHashes: Int = 128,
      shingleLen: Int = 5,
      bands: Int = 16,
      decontamNgram: Int = 8,
      minSharedNgrams: Long = 1L,
      tokenBudget: Long = 512L,
      // 1/256-cell split carve; 208/32 ≡ the coarse 13/2/1-sixteenths
      // default (equivalence spec-proven in CorpusSpec)
      trainCells: Int = 208,
      valCells: Int = 32,
      // opt-in round-6 stages (None/absent = stage skipped)
      quality: Option[Corpus.GopherThresholds] = None,
      lineDedupMinDocs: Option[Int] = None,
      domainQuota: Option[Long] = None,
      // raw crawled HTML in the text column: strip markup first (WET-style
      // extraction), so every later stage sees prose, not tags
      htmlInput: Boolean = false,
      // canonicalize text (NFC + whitespace) before any hashing stage, so
      // byte-variant encodings of the same content dedup together
      normalize: Boolean = false,
      // corpus-RELATIVE quality floor: drop the worst q fraction by
      // quality score (complements the absolute Gopher thresholds)
      qualityQuantile: Option[Double] = None,
      // SemDeDup stage on feature-hashed text embeddings:
      // (cosineThreshold, embedDim) — catches paraphrase-level semantic
      // duplicates the token-level MinHash stage cannot. semanticCentroids
      // dials expected cluster size (n / k) on real corpora.
      semantic: Option[(Double, Int)] = None,
      semanticCentroids: Int = 8,
      // denoising-objective output: (spanLen, pctMasked) — emit a
      // (corrupted, target) pair per TRAIN document, reproducible from
      // the raw corpus (deterministic keyed masking, no stored RNG)
      denoise: Option[(Int, Int)] = None)

  /** Per-stage outputs, each a complete lazily-composed plan. */
  case class Prepared(
      deduped: DataFrame, // post exact+near-dup: doc_id, text, source
      clean: DataFrame, // post decontamination (+ quota when configured)
      labeled: DataFrame, // + split column
      chunks: DataFrame, // (split, source, chunk_id, n_docs, chunk_tokens)
      denoised: Option[DataFrame]) // (doc_id, corrupted, target, …) on train

  /**
   * @param documents corpus table with (doc_id, text, source) columns
   * @param benchmark eval-suite documents to decontaminate against
   *                  (small — its distinct n-grams are broadcast)
   */
  def prepare(documents: DataFrame, benchmark: DataFrame,
      cfg: Config = Config()): Prepared = {
    // -2. HTML extraction: crawled markup → prose at scan speed, so a page
    // and its plain-text twin become the same document for every stage
    // below (dedup hashes content, not chrome)
    val extracted =
      if (!cfg.htmlInput) documents
      else documents.withColumn("text", TextKit.stripHtml(col("text")))

    // -1. canonicalization: every later stage (quality, line/exact/near
    // dedup, split) hashes or compares text — normalize FIRST so NFC
    // variants and whitespace-formatting twins are the same document
    val canon =
      if (!cfg.normalize) extracted
      else extracted.withColumn("text",
        graft.functions.NativeTextKit.normalizeText(col("text")))

    // 0. quality gate: scan-speed keep verdict, before any hash work
    val absGated = cfg.quality.fold(canon)(t =>
      canon.filter(Corpus.gopherKeep(col("text"), t)))

    // 0a. corpus-relative floor: keep docs at/above the corpus q-quantile
    // of the quality score (histogram-quantile — no corpus sort)
    val gated = cfg.qualityQuantile.fold(absGated)(q =>
      Corpus.quantileGate(absGated,
        graft.functions.Kit.bps(TextKit.qualityScore(col("text"))), q))

    // 0b. boilerplate line dedup: rewrite text to its surviving lines so
    // the dedup stages hash content; docs reduced to nothing are dropped
    val boiled = cfg.lineDedupMinDocs.fold(gated) { m =>
      val cleaned = Corpus.dedupLines(gated, "doc_id", "text", m)
        .filter(col("clean_text").isNotNull)
        .select(col("doc_id"), col("clean_text"))
      gated.join(cleaned, Seq("doc_id"))
        .withColumn("text", col("clean_text")).drop("clean_text")
    }

    // 1. exact dedup: smallest doc_id per byte-identical text survives
    val exactCanonical = boiled
      .withColumn("__h", md5(col("text").cast("binary")))
    val exact = Dedup.exactDedup(exactCanonical, Seq("__h"), Seq("doc_id"))
      .drop("__h")

    // 2. near-dup dedup: keep only cluster canonicals (nearDupClusters
    // labels every clustered doc; docs in no cluster are untouched)
    val pairs = Dedup.minhashNearDupPairs(exact, "doc_id", "text",
      cfg.jaccardThreshold, cfg.numHashes, cfg.shingleLen, cfg.bands,
      oph = true)
    // anti-join WITHOUT a broadcast hint: the loser set is corpus-dependent
    // (a heavily re-crawled corpus can lose most of its docs here) — AQE
    // broadcasts it at runtime when it is actually small
    val losers = Dedup.nearDupClusters(pairs)
      .filter(col("doc_id") =!= col("canonical"))
      .select(col("doc_id"))
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 2b. semantic dedup (opt-in): k-means-blocked cosine near-dups on
    // feature-hashed embeddings — text-only corpora need no embedding
    // table ([[graft.functions.HashEmbed]] rides the scan). nCentroids
    // sizes clusters at ~1k docs each; the smaller-id survivor rule keeps
    // determinism aligned with the exact/near-dup stages.
    val deduped = cfg.semantic.fold(nearDeduped) { case (thr, dim) =>
      val withVec = nearDeduped.withColumn("__vec",
        graft.functions.NativeVectorKit.hashEmbed(col("text"), dim))
      Dedup.semanticDedup(withVec, "doc_id", "__vec", thr,
          nCentroids = cfg.semanticCentroids)
        .drop("__vec")
    }

    // 3. decontamination: drop docs overlapping the benchmark set
    val contaminated = Corpus.contaminationCounts(deduped, benchmark,
        "doc_id", "text", cfg.decontamNgram)
      .filter(col("n_shared") >= cfg.minSharedNgrams)
      .select(col("doc_id"))
    val decontaminated = deduped.join(contaminated, Seq("doc_id"), "left_anti")

    // 3b. per-source quota: cap the post-dedup distribution
    val clean = cfg.domainQuota.fold(decontaminated)(q =>
      Corpus.quotaSample(decontaminated, "source", "text", q, salt = "prep"))

    // 4. deterministic content-hash split (1/256-cell carve)
    val labeled = clean.withColumn("split",
      Corpus.splitLabelFine(col("text"), cfg.trainCells, cfg.valCells))

    // 5. pack per (split, source) shard
    val chunks = Corpus.packChunks(
        labeled.withColumn("__shard", concat_ws("/", col("split"), col("source"))),
        "__shard", "doc_id", TextKit.tokenCount(col("text")).cast("long"),
        cfg.tokenBudget)
      .withColumn("split", split_part(col("__shard"), lit("/"), lit(1)))
      .withColumn("source", split_part(col("__shard"), lit("/"), lit(2)))
      .select("split", "source", "chunk_id", "n_docs", "chunk_tokens")

    // 6. denoising pairs (opt-in): train-split documents only — eval
    // splits must never leak masked reconstructions of their own text
    val denoised = cfg.denoise.map { case (spanLen, pct) =>
      labeled.filter(col("split") === "train")
        .select(col("doc_id"),
          Corpus.spanCorrupt(col("doc_id"), col("text"), spanLen, pct).as("__c"))
        .select(col("doc_id"), col("__c.corrupted").as("corrupted"),
          col("__c.target").as("target"), col("__c.n_tokens").as("n_tokens"),
          col("__c.n_masked").as("n_masked"))
    }

    Prepared(deduped, clean, labeled, chunks, denoised)
  }
}
