package graft.ops

import graft.functions.NativeBinaryKit
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/**
 * Multimodal column operators: image/audio/video carried as opaque `binary`
 * columns with typed metadata, plus decode / feature-extract / frame-sample
 * stages. (Engine extension beyond the reference — SURVEY §2.12/§7.1-8;
 * the reference's closest shape is its Avro-bytes codec layer,
 * utils/core/AvroUtils.scala:40-62.)
 *
 * IMAGE decode is REAL (the JDK's `javax.imageio` reads PNG/GIF/BMP/JPEG
 * with no external library — see [[graft.functions.ImageCodec]]):
 * [[decodeImage]] emits decoded width/height/pixel-checksum and
 * [[features]] pools decoded luminance into a unit-norm vector. AUDIO and
 * VIDEO decode remain codec-less in the JDK, so non-image blobs get a
 * deterministic byte-hash feature fallback with the same contract. The
 * surrounding plumbing — schema, binary columns, magic-byte dispatch,
 * frame slicing, bounded-batch execution — is what matters at 100 TB:
 * media blobs dominate row size, so operators here never shuffle the blob
 * more than once and push metadata-only projections to the scan.
 */
object Multimodal {

  /** Typed media metadata (decode output / catalog side data). */
  final case class MediaMeta(width: Int, height: Int, durationMs: Long, codec: String)

  /** The canonical multimodal row: id + mime + opaque payload + metadata. */
  final case class MediaRecord(media_id: Long, mime: String,
      media: Array[Byte], meta: MediaMeta)

  /** A media row with its extracted feature vector. */
  final case class MediaFeatures(media_id: Long, mime: String,
      features: Array[Float])

  // ── magic-byte MIME sniff ────────────────────────────────────────────────

  /** Content-type dispatch on leading magic bytes (PNG / JPEG / GIF / RIFF-
    * WAV / MP4-ftyp), else `application/octet-stream`. Pure column
    * expression over the first bytes — the scan reads only the blob head
    * when the source supports predicate/column pruning on it.
    */
  def sniffMime(blob: Column): Column = {
    def head(n: Int): Column = hex(substring(blob, 1, n))
    when(head(4) === "89504E47", "image/png")
      .when(head(2) === "FFD8", "image/jpeg")
      .when(head(3) === "474946", "image/gif")
      .when(head(4) === "52494646", "audio/wav") // RIFF container
      .when(hex(substring(blob, 5, 4)) === "66747970", "video/mp4") // ....ftyp
      .otherwise("application/octet-stream")
  }

  /** PNG IHDR dimensions parsed straight from header bytes — real metadata
    * extraction with no decoder: a PNG stream is signature (8 B) + IHDR
    * chunk whose first payload bytes are width/height as big-endian u32
    * (offsets 17-20 / 21-24, 1-based). Pure codegen'd expressions; null for
    * non-PNG blobs, so stored metadata can be cross-checked (or replaced)
    * from bytes the scan already read.
    */
  def pngWidth(blob: Column): Column =
    when(hex(substring(blob, 1, 8)) === "89504E470D0A1A0A",
      conv(hex(substring(blob, 17, 4)), 16, 10).cast("int"))

  def pngHeight(blob: Column): Column =
    when(hex(substring(blob, 1, 8)) === "89504E470D0A1A0A",
      conv(hex(substring(blob, 21, 4)), 16, 10).cast("int"))

  // ── frame sampling ───────────────────────────────────────────────────────

  /**
   * Sample fixed-length byte windows from a blob — the video-frame /
   * audio-window sampling shape: frame i covers bytes
   * `[1 + i*strideBytes, +frameBytes)`, up to `maxFrames`, only while the
   * window start lies inside the blob. `transform(sequence(...))` keeps it
   * codegen'd; no UDF, no per-frame row explosion until the caller asks.
   */
  def frameSample(blob: Column, frameBytes: Int, strideBytes: Int,
      maxFrames: Int): Column = {
    // integer frame count: floor((len-1)/stride)+1 windows start in-blob
    val lastStart = octet_length(blob) - 1
    val nFrames = least(lit(maxFrames),
      floor(lastStart.cast("double") / strideBytes).cast("int") + 1)
    when(octet_length(blob) === 0, array().cast("array<binary>"))
      .otherwise(transform(sequence(lit(0), nFrames - 1, lit(1)),
        i => substring(blob, (i * strideBytes) + 1, lit(frameBytes))))
  }

  // ── feature extraction (decode STUB + real batch plumbing) ──────────────

  /** Feature vector from the blob: REAL grid-pooled luminance features for
    * JDK-decodable images (PNG/GIF/BMP/JPEG), deterministic byte-hash
    * fallback otherwise (see [[graft.functions.BinaryFeatures]]).
    */
  def features(blob: Column, dim: Int): Column =
    NativeBinaryKit.binaryFeatures(blob, dim)

  /** Decoded image metadata via the JDK codecs
    * ([[graft.functions.ImageDecodeMeta]]): struct(width, height,
    * px_checksum), null for non-decodable blobs — the filter-corrupt-blobs
    * shape.
    */
  def decodeImage(blob: Column): Column =
    graft.functions.NativeImageKit.imageDecodeMeta(blob)

  /** Decoded audio metadata via the JDK PCM readers
    * ([[graft.functions.AudioDecodeMeta]]): struct(sample_rate, bits,
    * channels, n_bytes, pcm_checksum), null for non-decodable blobs.
    */
  def decodeAudio(blob: Column): Column =
    graft.functions.NativeAudioKit.audioDecodeMeta(blob)

  /** Nearest-neighbor image resize metadata
    * ([[graft.functions.ImageResizeMeta]]): struct(width, height,
    * px_checksum) of the resampled raster — the thumbnail/normalization
    * step, with exact integer source mapping so the result is mirrorable
    * from a known pattern. Null for non-decodable blobs.
    */
  def resizeImage(blob: Column, outW: Int, outH: Int): Column =
    graft.functions.NativeImageKit.imageResizeMeta(blob, outW, outH)

  /** Per-window integer PCM energies
    * ([[graft.functions.AudioWindowEnergy]]): array<long> of
    * Σ(sample-128)² per `windowSamples` — the silence/activity
    * segmentation primitive, exact integer arithmetic. Null for
    * non-decodable blobs.
    */
  def audioWindowEnergy(blob: Column, windowSamples: Int,
      maxWindows: Int = 4096): Column =
    graft.functions.NativeAudioKit.audioWindowEnergy(blob, windowSamples,
      maxWindows)

  /** 64-bit perceptual difference hash of an image blob (decoded with the
    * JDK codecs; [[graft.functions.ImageCodec.dHash64]]): a gradient-sign
    * fingerprint invariant under uniform brightness shift and lossless
    * re-encoding. Null for non-decodable blobs.
    */
  def imageDHash(blob: Column): Column =
    graft.functions.NativeImageKit.imageDHash(blob)

  /**
   * Perceptual image near-duplicate pairs: dHash each blob once in the
   * scan, then find id pairs whose hashes differ in at most `maxDist` of
   * 64 bits — the image twin of the SimHash text path, sharing its
   * pigeonhole blocking: the hash splits into four 16-bit chunks, and two
   * hashes within Hamming distance ≤ 3 MUST agree on at least one chunk,
   * so candidates are exact-match joins per (chunk, value) bucket and
   * recall is 1 by construction for `maxDist` ≤ 3. Buckets are size-capped
   * with the same skew-safe partial-agg counter as the text sketches (a
   * solid-color thumbnail is the hot-bucket hazard here — dHash 0 for
   * every flat image). Output: (img_a, img_b, dist), `img_a < img_b`.
   *
   * Scale posture: one decode per blob inside the scan projection (8-byte
   * hashes shuffle, pixels never do), 4× chunk explode, per-bucket
   * equi-join with cap, `bit_count(xor)` verify, distinct on the id pair.
   */
  def imageNearDupPairs(df: DataFrame, idCol: String, blobCol: String,
      maxDist: Int = 2, maxBucketSize: Int = 1000): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4-chunk pigeonhole blocking guarantees recall only for maxDist <= 3")
    val hashed = df
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("img"), imageDHash(col(blobCol)).as("ph"))
      .filter(col("ph").isNotNull)
      .select(col("img"), col("ph"),
        explode(sequence(lit(0), lit(3))).as("chunk"))
      .withColumn("ckey", expr("shiftright(ph, chunk * 16) & 65535"))
    val eligible = Dedup.sizeBandedBuckets(hashed, Seq("chunk", "ckey"),
      2L, maxBucketSize)
    val l = eligible.select(col("chunk"), col("ckey"),
      col("img").as("img_a"), col("ph").as("ph_a"))
    val r = eligible.select(col("chunk"), col("ckey"),
      col("img").as("img_b"), col("ph").as("ph_b"))
    l.join(r, Seq("chunk", "ckey"))
      .filter(col("img_a") < col("img_b"))
      .withColumn("dist", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("dist") <= maxDist)
      .select("img_a", "img_b", "dist")
      .distinct()
  }

  /**
   * Bounded-batch feature extraction over a typed Dataset — the Scala twin
   * of a `mapInPandas` decode stage: partitions are processed in batches of
   * `batchSize` records so a real decoder could amortize model/codec setup
   * per batch while bounding peak memory (batch of blobs, not a partition
   * of blobs, resident at once). The per-batch hook is where a real
   * vectorized decode goes; the stub derives the same deterministic
   * features as [[features]].
   */
  def extractFeaturesBatched(ds: Dataset[MediaRecord], dim: Int,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc: Encoder[MediaFeatures] = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // vectorized-decode hook: one call per batch, not per record
        batch.map { r =>
          MediaFeatures(r.media_id, r.mime,
            graft.functions.BinaryFeatures.compute(r.media, dim))
        }
      }
    }
  }
}
