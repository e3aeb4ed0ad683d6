package graft.streaming

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Streaming corpus ingestion: the production shape the reference's
 * bootstrap+stream design maps to (mediation/MediationService.scala:89-141 —
 * seed state from a bounded historical read, then admit an unbounded feed
 * against it). Here the "feed" is crawl drops landing as parquet files and
 * the "state" is the accumulated reference corpus on disk:
 *
 *   file stream → foreachBatch:
 *     0. quality gate (optional)             (Gopher-style keep verdict —
 *        junk dropped at scan speed before any sketch work is paid)
 *     1. exact self-dedup within the batch   (md5 groupBy, min doc_id wins)
 *     2. near-dup self-dedup within the batch (MinHash-LSH pairs → connected
 *        components → only cluster canonicals survive)
 *     3. exact cross-dedup vs the corpus      (md5 anti-join — catches
 *        byte-identical docs whose texts are too short to shingle)
 *     4. near-dup cross-dedup vs the corpus   ([[Dedup.incrementalNearDupPairs]]
 *        fresh×reference banded join → anti-join on the fresh id)
 *     5. append survivors to the corpus as a batch-id partition
 *
 * Scale posture: each micro-batch pays |batch| sketch work plus banded
 * joins against the corpus — never an all-pairs or a corpus rescan beyond
 * the (band,bucket)-pruned incremental join (the corpus side is bucket-
 * capped, see [[Dedup.incrementalNearDupPairs]]). The admission write is
 * IDEMPOTENT under micro-batch retry: each batch overwrites its own
 * `batch=<id>` partition directory, so a replayed epoch rewrites the same
 * files instead of double-appending — the same exactly-once contract a
 * file-sink commit log provides, but compatible with the corpus also being
 * the join state for later batches.
 *
 * The within-batch order (self-dedup BEFORE cross-dedup) matters for the
 * invariant: two near-dup docs arriving in ONE batch must collapse to one
 * survivor before either is tested against the corpus, or both could be
 * admitted (neither is in the corpus yet).
 */
object CorpusIngest {

  /** Near-dup admission knobs; defaults match the gated incremental query.
    * `quality` (optional) switches on a stage-0 Gopher-style quality gate
    * ([[graft.ops.Corpus.gopherKeep]]): junk is dropped BEFORE any sketch
    * or join work is paid for it — at production scale the crawl's reject
    * fraction is large, so filtering first is the cheapest stage ordering.
    */
  case class Config(
      threshold: Double = 0.8,
      numHashes: Int = 128,
      shingleLen: Int = 5,
      bands: Int = 16,
      maxBucketSize: Int = 1000,
      oph: Boolean = true,
      quality: Option[graft.ops.Corpus.GopherThresholds] = None,
      // sizing for the stage-3 bloom over the batch's content hashes (see
      // Lookup.bloomSemiAntiSplit — batches beyond Spark's 4M-item clamp
      // need the runtime.bloomFilter confs raised)
      expectedBatchDocs: Long = 1000000L)

  /** The corpus as one DataFrame (all admitted batches), or None before any
    * batch has been admitted. The `batch` partition column is internal
    * bookkeeping and is dropped.
    */
  def corpus(spark: SparkSession, corpusDir: String): Option[DataFrame] =
    corpusRaw(spark, corpusDir).map(_.drop("batch"))

  /** Like [[corpus]] but keeps the `batch` partition column (admission-time
    * bookkeeping: replay exclusion, provenance).
    */
  def corpusRaw(spark: SparkSession, corpusDir: String): Option[DataFrame] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(corpusDir)
    if (fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("batch=")))
      Some(spark.read.parquet(corpusDir))
    else None
  }

  /** Seed the corpus from a bounded historical read (batch id -1) — the
    * bootstrap half of the reference's bootstrap+stream design. The seed is
    * self-deduped with the same stages a streamed batch gets, so the
    * no-near-dup invariant holds from batch zero.
    */
  def seed(docs: DataFrame, corpusDir: String, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config()): Unit =
    selfDedup(qualityGate(docs, textCol, cfg), idCol, textCol, cfg)
      .write.mode("overwrite").parquet(s"$corpusDir/batch=-1")

  /** Stage 0 (optional): drop documents failing the quality thresholds —
    * scan-speed pure expressions, before any sketch work.
    */
  def qualityGate(batch: DataFrame, textCol: String, cfg: Config): DataFrame =
    cfg.quality.fold(batch)(t =>
      batch.filter(graft.ops.Corpus.gopherKeep(col(textCol), t)))

  /** Stages 1–2: one survivor per exact text, then per near-dup cluster. */
  def selfDedup(batch: DataFrame, idCol: String, textCol: String,
      cfg: Config): DataFrame = {
    val exact = Dedup.exactDedup(
        batch.withColumn("__h", md5(col(textCol).cast("binary"))),
        Seq("__h"), Seq(idCol))
      .drop("__h")
    val pairs = Dedup.minhashNearDupPairs(exact, idCol, textCol,
      cfg.threshold, cfg.numHashes, cfg.shingleLen, cfg.bands, oph = cfg.oph)
    val losers = Dedup.nearDupClusters(pairs)
      .filter(col("doc_id") =!= col("canonical"))
      .select(col("doc_id").as(idCol))
    exact.join(losers, Seq(idCol), "left_anti")
  }

  /** Stages 3–4: drop batch docs that exact- or near-duplicate the corpus.
    * Both anti-join keys come from banded/hashed joins — the corpus is
    * never scanned all-pairs.
    *
    * The exact half is [[graft.ops.Lookup.bloomSemiAntiSplit]]: a bloom
    * over the BATCH's content hashes prunes the reference at its scan, so
    * the per-batch shuffle is batch-sized — the naive
    * `reference.hashes.distinct()` anti-join would re-shuffle the whole
    * accumulated corpus on every micro-batch.
    */
  def crossDedup(fresh: DataFrame, reference: DataFrame, idCol: String,
      textCol: String, cfg: Config): DataFrame = {
    val freshHashed = fresh.withColumn("__h", md5(col(textCol).cast("binary")))
    val refHashed = reference.select(md5(col(textCol).cast("binary")).as("__h"))
    val (novelExact0, _) = graft.ops.Lookup.bloomSemiAntiSplit(
      freshHashed, refHashed, "__h", cfg.expectedBatchDocs)
    val novelExact = novelExact0.drop("__h")
    val nearDupIds = Dedup.incrementalNearDupPairs(novelExact, reference,
        idCol, textCol, cfg.threshold, cfg.numHashes, cfg.shingleLen,
        cfg.bands, cfg.maxBucketSize, cfg.oph)
      .select(col("doc_a").as(idCol)).distinct()
    novelExact.join(nearDupIds, Seq(idCol), "left_anti")
  }

  /** One micro-batch admission (stages 1–5), callable from any batch
    * context too (backfills, tests). Returns the admitted row count.
    */
  def admitBatch(batch: DataFrame, batchId: Long, corpusDir: String,
      idCol: String, textCol: String, cfg: Config): Long = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return 0L
    val gated = qualityGate(batch, textCol, cfg)
    val self = selfDedup(gated, idCol, textCol, cfg)
    // a REPLAYED epoch must not see its own prior partial write as corpus —
    // it would reject every doc against itself and overwrite the partition
    // with nothing — so the reference excludes this batch's partition
    // (partition pruning: the excluded directory is never read)
    val reference = corpusRaw(spark, corpusDir)
      .map(_.filter(col("batch") =!= batchId).drop("batch"))
    val admitted = reference match {
      case Some(ref) => crossDedup(self, ref, idCol, textCol, cfg)
      case None => self
    }
    // localCheckpoint: `admitted`'s plan is re-executed by the write AND the
    // count; checkpointing also severs the plan from the corpus read, which
    // the write below is about to extend
    val out = admitted.localCheckpoint(eager = true)
    out.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
    out.count()
  }

  /**
   * Start the unbounded ingestion: `inputDir` is watched for new parquet
   * drops; every micro-batch runs the admission stages against the corpus
   * accumulated so far and appends its survivors.
   */
  def start(spark: SparkSession, inputDir: String, corpusDir: String,
      checkpointDir: String, schema: StructType, idCol: String = "doc_id",
      textCol: String = "text", cfg: Config = Config(),
      trigger: Trigger = Trigger.ProcessingTime(0L)): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(inputDir)
      .writeStream
      .queryName("corpus-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitBatch(batch, batchId, corpusDir, idCol, textCol, cfg)
        ()
      }
      .start()
}
