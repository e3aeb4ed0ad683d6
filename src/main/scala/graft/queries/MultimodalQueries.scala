package graft.queries

import graft.ops.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column queries: the `documents` text payload re-encoded as an
 * opaque binary media blob (plus synthesized container magic bytes), then
 * run through the engine's binary operators — MIME sniff, frame sampling,
 * feature extraction. Corpus text is pure ASCII at every SF (verified), so
 * the DuckDB oracle mirrors byte slices with char slices exactly.
 */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  /** doc_id-keyed synthetic container prefix: 5 families of magic bytes. */
  private def magic = expr("doc_id % 5") // 0 png, 1 jpeg, 2 gif, 3 wav, 4 mp4
  private def magicBytes =
    when(magic === 0, unhex(lit("89504E47")))
      .when(magic === 1, unhex(lit("FFD8")))
      .when(magic === 2, unhex(lit("474946")))
      .when(magic === 3, unhex(lit("52494646")))
      .otherwise(concat(unhex(lit("00000018")), lit("ftyp").cast("binary")))

  // ── metadata extraction: sniffed mime + byte length + content hash ──────
  private val mmMeta: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("media", concat(magicBytes, col("text").cast("binary")))
      .select(col("doc_id"),
        Multimodal.sniffMime(col("media")).as("mime"),
        octet_length(col("media")).as("n_bytes"),
        md5(col("text").cast("binary")).as("body_md5"))
      .orderBy(col("doc_id"))
  }
  private val mmMetaSql =
    """SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |                  WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
      |                  ELSE 'video/mp4' END AS mime,
      |  length(text) + (CASE doc_id % 5 WHEN 0 THEN 4 WHEN 1 THEN 2
      |                  WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 8 END) AS n_bytes,
      |  md5(text) AS body_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  // ── frame sampling: fixed-size byte windows, per-frame hash ─────────────
  private val mmFrames: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("media", col("text").cast("binary"))
      .select(col("doc_id"),
        posexplode(Multimodal.frameSample(col("media"),
          frameBytes = 64, strideBytes = 48, maxFrames = 4))
          .as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))
  }
  private val mmFramesSql =
    """SELECT doc_id, i AS frame_idx,
      |  length(substring(text, 1 + 48 * i, 64)) AS frame_bytes,
      |  md5(substring(text, 1 + 48 * i, 64)) AS frame_md5
      |FROM documents, (SELECT unnest(range(4)) AS i)
      |WHERE 1 + 48 * i <= length(text)
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ── feature extraction (decode STUB → no SQL oracle; rows-only check +
  //    determinism/shape asserted in MultimodalSpec) ───────────────────────
  private val mmFeatures: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("media", concat(magicBytes, col("text").cast("binary")))
      .select(col("doc_id"),
        Multimodal.sniffMime(col("media")).as("mime"),
        Multimodal.features(col("media"), dim = 16).as("features"))
      .select(col("doc_id"), col("mime"),
        size(col("features")).as("dim"),
        round(aggregate(col("features"), lit(0.0d),
          (acc, x) => acc + x * x) * 1000000, 0).cast("long").as("sqnorm_micro"))
      .orderBy(col("doc_id"))
  }

  val all: Map[String, Q] = Map(
    "mm_meta" -> mmMeta,
    "mm_frame_sample" -> mmFrames,
    "mm_features" -> mmFeatures)

  val oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_frame_sample" -> mmFramesSql)
}
