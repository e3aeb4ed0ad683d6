package graft.queries

import graft.ops.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** doc_id-keyed synthetic container prefix: 5 families of magic bytes.
    * The PNG family carries a REAL header — 8-byte signature + IHDR chunk
    * length/type/width/height (24 bytes total), width/height derived from
    * doc_id — so the header-parsing expressions below work on genuine PNG
    * byte layout, not trusted stored metadata.
    */
  private def magic = expr("doc_id % 5") // 0 png, 1 jpeg, 2 gif, 3 wav, 4 mp4
  private def beU32(v: Column) = unhex(lpad(hex(v.cast("int")), 8, "0"))
  private def pngHeader =
    concat(unhex(lit("89504E470D0A1A0A")), unhex(lit("0000000D")),
      lit("IHDR").cast("binary"),
      beU32(col("doc_id") % 640 + 1), beU32(col("doc_id") % 480 + 1))
  private def magicBytes =
    when(magic === 0, pngHeader)
      .when(magic === 1, unhex(lit("FFD8")))
      .when(magic === 2, unhex(lit("474946")))
      .when(magic === 3, unhex(lit("52494646")))
      .otherwise(concat(unhex(lit("00000018")), lit("ftyp").cast("binary")))

  // ── metadata extraction: sniffed mime + byte length + content hash +
  //    dimensions parsed from real PNG header bytes ────────────────────────
  private val mmMeta: Q = (s, dir) => {
    Tables.documents(s, dir)
      .withColumn("media", concat(magicBytes, col("text").cast("binary")))
      .select(col("doc_id"),
        Multimodal.sniffMime(col("media")).as("mime"),
        octet_length(col("media")).cast("long").as("n_bytes"),
        Multimodal.pngWidth(col("media")).as("png_width"),
        Multimodal.pngHeight(col("media")).as("png_height"),
        md5(col("text").cast("binary")).as("body_md5"))
      .orderBy(col("doc_id"))
  }
  private val mmMetaSql =
    """SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
      |                  WHEN 2 THEN 'image/gif' WHEN 3 THEN 'audio/wav'
      |                  ELSE 'video/mp4' END AS mime,
      |  length(text) + (CASE doc_id % 5 WHEN 0 THEN 24 WHEN 1 THEN 2
      |                  WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 8 END) AS n_bytes,
      |  CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 640 + 1 AS INTEGER) END AS png_width,
      |  CASE WHEN doc_id % 5 = 0 THEN CAST(doc_id % 480 + 1 AS INTEGER) END AS png_height,
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
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
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

  // ── feature extraction — driver-visible invariant gate ──────────────────
  // The decode kernel is a declared stub (no codecs in this container), so
  // the feature VALUES have no SQL oracle; what the driver gate pins is
  // everything around it: every document yields a vector (n_rows = corpus
  // count, SQL-derived), every vector is 16-dim and unit-norm (the kernel's
  // contract), and the codegen'd column expression and the batched
  // mapPartitions twin (encoder + bounded-batch plumbing, the real decode
  // integration path) produce bit-identical vectors. Norm tolerance is 100
  // micro — float32 components bound the true deviation well under that.
  private val mmFeatures: Q = (s, dir) => {
    val base = Tables.documents(s, dir)
      .withColumn("media", concat(magicBytes, col("text").cast("binary")))
    val native = base.select(col("doc_id"),
      Multimodal.features(col("media"), dim = 16).as("features"))
    import s.implicits._
    val records = base.select(col("doc_id").as("media_id"),
        Multimodal.sniffMime(col("media")).as("mime"), col("media"),
        struct(lit(0).as("width"), lit(0).as("height"),
          lit(0L).as("durationMs"), lit("").as("codec")).as("meta"))
      .as[Multimodal.MediaRecord]
    val twin = Multimodal.extractFeaturesBatched(records, dim = 16)
      .toDF().select(col("media_id").as("doc_id"),
        col("features").as("features_twin"))
    val sqnormMicro = aggregate(col("features"), lit(0.0d),
      (acc, x) => acc + x * x) * 1000000
    native.join(twin, "doc_id").agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(size(col("features")) =!= 16, 1).otherwise(0)), lit(0))
        .cast("long").as("n_dim_bad"),
      coalesce(sum(when(abs(sqnormMicro - 1000000.0) > 100.0, 1).otherwise(0)), lit(0))
        .cast("long").as("n_norm_bad"),
      coalesce(sum(when(col("features") =!= col("features_twin"), 1).otherwise(0)), lit(0))
        .cast("long").as("n_twin_mismatch"))
  }
  private val mmFeaturesSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_dim_bad,
      |  CAST(0 AS BIGINT) AS n_norm_bad, CAST(0 AS BIGINT) AS n_twin_mismatch
      |FROM documents""".stripMargin

  // ── REAL image decode — roundtrip gate over complete encoded PNGs ───────
  // K tiny PNGs are ENCODED with the JDK at query build (javax.imageio is
  // part of every JRE — no external codec); the pixel pattern is pure
  // arithmetic, so width/height/pixel-checksum ground truth is computed
  // WITHOUT any codec. The gate decodes each blob in-engine
  // (ImageDecodeMeta) and asserts decode(encode(pattern)) == pattern —
  // a non-circular roundtrip: one side is the generator's arithmetic, the
  // other is the real decoder. Also pins the decoded-luminance feature
  // path's dim/unit-norm contract on genuinely decodable input.
  private val K = 16
  private def tplW(i: Int) = 4 + i
  private def tplH(i: Int) = 3 + (i % 5)
  private def tplGray(i: Int, x: Int, y: Int) = (x * 7 + y * 13 + i * 29) % 256
  private lazy val pngTemplates: Seq[Array[Byte]] = (0 until K).map { i =>
    val img = new java.awt.image.BufferedImage(tplW(i), tplH(i),
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until tplH(i); x <- 0 until tplW(i)) {
      val g = tplGray(i, x, y)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private lazy val truthChecksum: Seq[Long] = (0 until K).map { i =>
    var sum = 0L
    for (y <- 0 until tplH(i); x <- 0 until tplW(i)) {
      val g = tplGray(i, x, y)
      sum += ((x * 31L + y * 17L) ^ ((g << 16) | (g << 8) | g).toLong)
    }
    sum
  }
  private val mmDecode: Q = (s, dir) => {
    val tpl = (col("doc_id") % K).cast("int")
    val df = Tables.documents(s, dir)
      .withColumn("media", element_at(typedLit(pngTemplates), tpl + 1))
      .withColumn("m", Multimodal.decodeImage(col("media")))
      .withColumn("feat", Multimodal.features(col("media"), 16))
    val sqnormMicro = aggregate(col("feat"), lit(0.0d),
      (acc, x) => acc + x * x) * 1000000
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(col("m").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("n_undecodable"),
      coalesce(sum(when(col("m.width") =!= element_at(
        typedLit((0 until K).map(tplW)), tpl + 1) ||
        col("m.height") =!= element_at(
          typedLit((0 until K).map(tplH)), tpl + 1), 1).otherwise(0)), lit(0))
        .cast("long").as("n_dim_mismatch"),
      coalesce(sum(when(col("m.px_checksum") =!= element_at(
        typedLit(truthChecksum), tpl + 1), 1).otherwise(0)), lit(0))
        .cast("long").as("n_px_mismatch"),
      coalesce(sum(when(abs(sqnormMicro - 1000000.0) > 100.0, 1).otherwise(0)), lit(0))
        .cast("long").as("n_norm_bad"))
  }
  private val mmDecodeSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(0 AS BIGINT) AS n_dim_mismatch, CAST(0 AS BIGINT) AS n_px_mismatch,
      |  CAST(0 AS BIGINT) AS n_norm_bad
      |FROM documents""".stripMargin

  // ── image resize (nearest-neighbor thumbnail) — roundtrip gate ──────────
  // Every template resized through decode → integer nearest-neighbor to
  // 3×2; the expected resized checksum is PURE ARITHMETIC from the pattern
  // formula (sx = x·srcW/3, sy = y·srcH/2 integer division — no filter
  // kernels, no float rounding), so the gate pins the whole decode+resample
  // path without the oracle needing a codec.
  private lazy val truthResizeChecksum: Seq[Long] = (0 until K).map { i =>
    var sum = 0L
    for (y <- 0 until 2; x <- 0 until 3) {
      val g = tplGray(i, x * tplW(i) / 3, y * tplH(i) / 2)
      sum += ((x * 31L + y * 17L) ^ ((g << 16) | (g << 8) | g).toLong)
    }
    sum
  }
  private val mmResize: Q = (s, dir) => {
    val tpl = (col("doc_id") % K).cast("int")
    val df = Tables.documents(s, dir)
      .withColumn("media", element_at(typedLit(pngTemplates), tpl + 1))
      .withColumn("r", Multimodal.resizeImage(col("media"), 3, 2))
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(col("r").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("n_undecodable"),
      coalesce(sum(when(col("r.width") =!= 3 || col("r.height") =!= 2, 1)
        .otherwise(0)), lit(0)).cast("long").as("n_dim_mismatch"),
      coalesce(sum(when(col("r.px_checksum") =!= element_at(
        typedLit(truthResizeChecksum), tpl + 1), 1).otherwise(0)), lit(0))
        .cast("long").as("n_px_mismatch"))
  }
  private val mmResizeSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(0 AS BIGINT) AS n_dim_mismatch,
      |  CAST(0 AS BIGINT) AS n_px_mismatch
      |FROM documents""".stripMargin

  // ── perceptual image near-dup (dHash) — invariance + pair-recall gate ───
  // KP pixel patterns, each shipped as THREE blobs: PNG, BMP re-encode of
  // the same pixels, and a PNG with every gray value shifted +20. dHash is
  // a gradient-sign pattern, so all three PROVABLY share one hash (lossless
  // re-encode preserves pixels; a uniform unclamped shift preserves every
  // cell comparison — the pattern stays < 200 so nothing clamps). The gate
  // asserts: zero undecodable, exactly one hash per pattern, KP hashes
  // corpus-wide, and the pair op finds exactly Σ C(n_t, 2) same-pattern
  // pairs with zero cross-pattern pairs — pair recall is 1 by pigeonhole
  // (identical hashes agree on every chunk), so the expected count is pure
  // counting arithmetic the oracle replays from doc_id residues.
  private val KP = 8
  private def phGray(i: Int, x: Int, y: Int) = (x * 7 + y * 13 + i * 37) % 200
  private lazy val phashTemplates: Seq[Array[Byte]] = (0 until KP).flatMap { i =>
    def img(shift: Int): java.awt.image.BufferedImage = {
      val im = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16) {
        val g = phGray(i, x, y) + shift
        im.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      im
    }
    def enc(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, fmt, bos)
      bos.toByteArray
    }
    Seq(enc(img(0), "png"), enc(img(0), "bmp"), enc(img(20), "png"))
  }
  private val mmImageNearDup: Q = (s, dir) => {
    val idx = ((col("doc_id") % KP) * 3 + col("doc_id") % 3 + 1).cast("int")
    val media = Tables.documents(s, dir).select(col("doc_id"))
      .withColumn("media", element_at(typedLit(phashTemplates), idx))
    val hashed = media.withColumn("ph", Multimodal.imageDHash(col("media")))
    val stats = hashed.agg(
      count(lit(1)).cast("long").as("n_images"),
      coalesce(sum(when(col("ph").isNull, 1L).otherwise(0L)), lit(0L))
        .as("n_undecodable"),
      countDistinct(col("ph")).as("n_distinct_hashes"))
    val tplStats = hashed.groupBy((col("doc_id") % KP).as("t"))
      .agg(countDistinct(col("ph")).as("nd"))
      .agg(max(col("nd")).as("max_within_tpl_distinct"))
    val pairs = Multimodal.imageNearDupPairs(media, "doc_id", "media",
      maxDist = 2)
    val pairStats = pairs.agg(
      coalesce(count(lit(1)), lit(0L)).cast("long").as("n_pairs"),
      coalesce(sum(when(col("img_a") % KP =!= col("img_b") % KP, 1L)
        .otherwise(0L)), lit(0L)).as("n_cross_pairs"))
    stats.crossJoin(tplStats).crossJoin(pairStats)
  }
  private val mmImageNearDupSql =
    """WITH g AS (SELECT doc_id % 8 AS t FROM documents),
      |c AS (SELECT t, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY t)
      |SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_images,
      |  CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST((SELECT count(DISTINCT t) FROM g) AS BIGINT) AS n_distinct_hashes,
      |  CAST(1 AS BIGINT) AS max_within_tpl_distinct,
      |  CAST((SELECT sum(n * (n - 1) // 2) FROM c) AS BIGINT) AS n_pairs,
      |  CAST(0 AS BIGINT) AS n_cross_pairs""".stripMargin

  // ── perceptual dedup end-to-end: dHash pairs → connected components ─────
  // Composes imageNearDupPairs with the shared CC clusterer on a 1-in-10
  // doc subset (keeps the within-template pair set small at every SF).
  // Ground truth is pure counting arithmetic: each pattern with ≥2 members
  // forms exactly one cluster whose canonical is its min doc_id; patterns
  // with 1 member produce no pair, hence no cluster.
  private val mmImageClusters: Q = (s, dir) => {
    val idx = ((col("doc_id") % KP) * 3 + col("doc_id") % 3 + 1).cast("int")
    val media = Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 10 === 0)
      .withColumn("media", element_at(typedLit(phashTemplates), idx))
    val pairs = Multimodal.imageNearDupPairs(media, "doc_id", "media",
        maxDist = 2)
      .select(col("img_a").as("doc_a"), col("img_b").as("doc_b"))
    val clusters = graft.ops.Dedup.nearDupClusters(pairs)
    val mins = media.select(col("doc_id"), (col("doc_id") % KP).as("t"))
      .groupBy(col("t")).agg(min(col("doc_id")).as("mn"))
    val sizes = clusters.groupBy(col("canonical")).agg(count(lit(1)).as("sz"))
    clusters.withColumn("t", col("doc_id") % KP)
      .join(mins, Seq("t"))
      .agg(
        count(lit(1)).as("n_nodes"),
        countDistinct(col("canonical")).as("n_clusters"),
        coalesce(sum(when(col("canonical") =!= col("mn"), 1L).otherwise(0L)),
          lit(0L)).as("canon_mismatch"))
      .crossJoin(sizes.agg(max(col("sz")).as("max_cluster")))
  }
  private val mmImageClustersSql =
    """WITH g AS (
      |  SELECT doc_id, doc_id % 8 AS t FROM documents WHERE doc_id % 10 = 0
      |), c AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY t
      |), e AS (SELECT * FROM c WHERE n >= 2)
      |SELECT CAST((SELECT sum(n) FROM e) AS BIGINT) AS n_nodes,
      |  CAST((SELECT count(*) FROM e) AS BIGINT) AS n_clusters,
      |  CAST(0 AS BIGINT) AS canon_mismatch,
      |  CAST((SELECT max(n) FROM e) AS BIGINT) AS max_cluster""".stripMargin

  // ── REAL audio decode — roundtrip gate over complete encoded WAVs ───────
  // Same construction as mm_decode: K tiny 8-bit mono PCM WAVs encoded with
  // the JDK (javax.sound.sampled) at query build; the sample pattern is
  // pure arithmetic, so n_bytes / pcm-checksum ground truth needs no codec.
  private def wavLen(i: Int) = 32 + 8 * i
  private def wavSample(i: Int, j: Int) = (j * 5 + i * 17) % 256
  private lazy val wavTemplates: Seq[Array[Byte]] = (0 until K).map { i =>
    val pcm = Array.tabulate[Byte](wavLen(i))(j => wavSample(i, j).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }
  private lazy val wavChecksum: Seq[Long] = (0 until K).map { i =>
    (0 until wavLen(i)).map(j => (j * 31L) ^ wavSample(i, j).toLong).sum
  }
  private val mmAudio: Q = (s, dir) => {
    val tpl = (col("doc_id") % K).cast("int")
    val df = Tables.documents(s, dir)
      .withColumn("media", element_at(typedLit(wavTemplates), tpl + 1))
      .withColumn("m", Multimodal.decodeAudio(col("media")))
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(col("m").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("n_undecodable"),
      coalesce(sum(when(col("m.sample_rate") =!= 8000 ||
        col("m.bits") =!= 8 || col("m.channels") =!= 1, 1).otherwise(0)), lit(0))
        .cast("long").as("n_fmt_mismatch"),
      coalesce(sum(when(col("m.n_bytes") =!= element_at(
        typedLit((0 until K).map(i => wavLen(i).toLong)), tpl + 1), 1)
        .otherwise(0)), lit(0)).cast("long").as("n_len_mismatch"),
      coalesce(sum(when(col("m.pcm_checksum") =!= element_at(
        typedLit(wavChecksum), tpl + 1), 1).otherwise(0)), lit(0))
        .cast("long").as("n_pcm_mismatch"))
  }
  private val mmAudioSql =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_undecodable,
      |  CAST(0 AS BIGINT) AS n_fmt_mismatch, CAST(0 AS BIGINT) AS n_len_mismatch,
      |  CAST(0 AS BIGINT) AS n_pcm_mismatch
      |FROM documents""".stripMargin

  // ── audio windowed energy (silence/activity segmentation) ───────────────
  // The WAV templates' per-16-sample integer energies Σ(s-128)² computed
  // through decode → segmentation must equal the pure-arithmetic truth
  // from the sample formula — plus an active-window count at a fixed
  // threshold (the VAD first stage). Codec-free ground truth, same
  // contract as mm_decode/mm_resize.
  private lazy val truthEnergies: Seq[Seq[Long]] = (0 until K).map { i =>
    (0 until wavLen(i)).grouped(16).map { idxs =>
      idxs.map { j =>
        val s = wavSample(i, j) - 128
        s.toLong * s
      }.sum
    }.toSeq
  }
  private val mmAudioEnergy: Q = (s, dir) => {
    val tpl = (col("doc_id") % K).cast("int")
    val df = Tables.documents(s, dir)
      .withColumn("media", element_at(typedLit(wavTemplates), tpl + 1))
      .withColumn("en",
        Multimodal.audioWindowEnergy(col("media"), windowSamples = 16))
    df.agg(
      count(lit(1)).cast("long").as("n_rows"),
      coalesce(sum(when(col("en").isNull, 1).otherwise(0)), lit(0))
        .cast("long").as("n_undecodable"),
      coalesce(sum(when(col("en") =!= element_at(
        typedLit(truthEnergies), tpl + 1), 1).otherwise(0)), lit(0))
        .cast("long").as("n_energy_mismatch"),
      // active-window census: threshold 16·64² (mean |s-128| ≥ 64)
      coalesce(sum(size(filter(col("en"), e => e >= 65536L))), lit(0))
        .cast("long").as("n_active_windows"))
  }
  // per-template active-window constants, interpolated into the oracle as
  // a list literal indexed by the doc's template residue
  private lazy val truthActivePerTpl: Seq[Long] =
    truthEnergies.map(_.count(_ >= 65536L).toLong)
  private lazy val mmAudioEnergySql =
    s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(0 AS BIGINT) AS n_undecodable,
       |  CAST(0 AS BIGINT) AS n_energy_mismatch,
       |  CAST(sum(([${truthActivePerTpl.mkString(", ")}])[(doc_id % $K) + 1])
       |    AS BIGINT) AS n_active_windows
       |FROM documents""".stripMargin

  val all: Map[String, Q] = Map(
    "mm_meta" -> mmMeta,
    "mm_frame_sample" -> mmFrames,
    "mm_features" -> mmFeatures,
    "mm_decode" -> mmDecode,
    "mm_resize" -> mmResize,
    "mm_audio" -> mmAudio,
    "mm_audio_energy" -> mmAudioEnergy,
    "mm_image_neardup" -> mmImageNearDup,
    "mm_image_clusters" -> mmImageClusters)

  val oracles: Map[String, String] = Map(
    "mm_meta" -> mmMetaSql,
    "mm_frame_sample" -> mmFramesSql,
    "mm_features" -> mmFeaturesSql,
    "mm_decode" -> mmDecodeSql,
    "mm_resize" -> mmResizeSql,
    "mm_audio" -> mmAudioSql,
    "mm_audio_energy" -> mmAudioEnergySql,
    "mm_image_neardup" -> mmImageNearDupSql,
    "mm_image_clusters" -> mmImageClustersSql)
}
