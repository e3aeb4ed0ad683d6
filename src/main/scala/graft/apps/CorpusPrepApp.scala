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
 *   1. exact dedup      — one survivor per byte-identical text (md5 hash
 *                         groupBy; min doc id wins, deterministic),
 *   2. near-dup dedup   — MinHash-LSH pairs verified by exact Jaccard,
 *                         clustered (connected components), only each
 *                         cluster's canonical (min id) survives,
 *   3. decontamination  — any document sharing ≥ `minSharedNgrams` distinct
 *                         8-grams with the benchmark set is dropped,
 *   4. split            — deterministic content-hash train/val/test
 *                         (duplicate texts can't straddle splits),
 *   5. packing          — per-(split, shard) greedy contiguous chunks of
 *                         ~`tokenBudget` whitespace tokens.
 *
 * Stage order matters at scale: exact dedup first shrinks every later
 * stage's input for free (one hash shuffle); near-dup next so
 * decontamination and packing see each cluster once; splitting before
 * packing so chunks never mix splits.
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
      valCells: Int = 32)

  /** Per-stage outputs, each a complete lazily-composed plan. */
  case class Prepared(
      deduped: DataFrame, // post exact+near-dup: doc_id, text, source
      clean: DataFrame, // post decontamination
      labeled: DataFrame, // + split column
      chunks: DataFrame) // (split, source, chunk_id, n_docs, chunk_tokens)

  /**
   * @param documents corpus table with (doc_id, text, source) columns
   * @param benchmark eval-suite documents to decontaminate against
   *                  (small — its distinct n-grams are broadcast)
   */
  def prepare(documents: DataFrame, benchmark: DataFrame,
      cfg: Config = Config()): Prepared = {
    // 1. exact dedup: smallest doc_id per byte-identical text survives
    val exactCanonical = documents
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
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 3. decontamination: drop docs overlapping the benchmark set
    val contaminated = Corpus.contaminationCounts(deduped, benchmark,
        "doc_id", "text", cfg.decontamNgram)
      .filter(col("n_shared") >= cfg.minSharedNgrams)
      .select(col("doc_id"))
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")

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

    Prepared(deduped, clean, labeled, chunks)
  }
}
