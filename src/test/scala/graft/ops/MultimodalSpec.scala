package graft.ops

import graft.SparkSpec
import graft.ops.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, bytes: Array[Byte], mime: String = "x") =
    MediaRecord(id, mime, bytes, MediaMeta(0, 0, 0L, ""))

  private val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
  private val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 9, 9)
  private val mp4 = Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 7)
  private val junk = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)

  test("sniffMime dispatches on magic bytes") {
    val df = Seq(1L -> png, 2L -> jpeg, 3L -> mp4, 4L -> junk)
      .toDF("id", "media")
      .select(col("id"), Multimodal.sniffMime(col("media")).as("mime"))
    val got = df.as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "image/png", 2L -> "image/jpeg",
      3L -> "video/mp4", 4L -> "application/octet-stream"))
  }

  test("frameSample slices fixed windows with stride, capped at maxFrames") {
    val bytes = (0 until 200).map(_.toByte).toArray
    val df = Seq(1L -> bytes).toDF("id", "media")
      .select(posexplode(Multimodal.frameSample(col("media"), 64, 48, 4))
        .as(Seq("idx", "frame")))
    val frames = df.as[(Int, Array[Byte])].collect().sortBy(_._1)
    assert(frames.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(frames(0)._2.toSeq == bytes.slice(0, 64).toSeq)
    assert(frames(1)._2.toSeq == bytes.slice(48, 112).toSeq)
    // last frame starts at 144, truncated at the blob end
    assert(frames(3)._2.toSeq == bytes.slice(144, 200).toSeq)
  }

  test("frameSample stops when the next window would start past the blob") {
    val df = Seq(1L -> Array[Byte](1, 2, 3)).toDF("id", "media")
      .select(size(Multimodal.frameSample(col("media"), 64, 48, 4)).as("n"))
    assert(df.as[Int].head() == 1) // only offset 0 starts inside 3 bytes
  }

  test("binary features: deterministic, L2-normalized, fixed dim") {
    val df = Seq(1L -> png, 2L -> png, 3L -> junk).toDF("id", "media")
      .select(col("id"), Multimodal.features(col("media"), 16).as("f"))
    val got = df.as[(Long, Array[Float])].collect().toMap
    assert(got(1L).length == 16)
    assert(got(1L).toSeq == got(2L).toSeq) // same bytes → same vector
    assert(got(1L).toSeq != got(3L).toSeq)
    val norm = math.sqrt(got(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("batched extraction matches the column expression exactly") {
    val recs = (1L to 100L).map(i => rec(i, Array.fill(32)((i % 127).toByte)))
    val ds = spark.createDataset(recs)
    val batched = Multimodal.extractFeaturesBatched(ds, dim = 16, batchSize = 7)
      .collect().map(f => f.media_id -> f.features.toSeq).toMap
    val exprd = ds.select(col("media_id"),
        Multimodal.features(col("media"), 16).as("f"))
      .as[(Long, Array[Float])].collect().toMap
    assert(batched.keySet == exprd.keySet)
    batched.foreach { case (id, f) => assert(f == exprd(id).toSeq) }
  }

  private def makePng(w: Int, h: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("decodeImage: real JDK decode roundtrips the generated pixel pattern") {
    import spark.implicits._
    val png = makePng(6, 4, (x, y) => x * 11 + y * 23)
    var truth = 0L
    for (y <- 0 until 4; x <- 0 until 6) {
      val g = (x * 11 + y * 23) & 0xFF
      truth += ((x * 31L + y * 17L) ^ ((g << 16) | (g << 8) | g).toLong)
    }
    val row = Seq(Tuple1(png)).toDF("media")
      .select(Multimodal.decodeImage(col("media")).as("m"))
      .select("m.width", "m.height", "m.px_checksum").head()
    assert((row.getInt(0), row.getInt(1), row.getLong(2)) == (6, 4, truth))
    // garbage bytes decode to null, never throw
    val bad = Seq(Tuple1(Array.fill[Byte](64)(0x42))).toDF("media")
      .select(Multimodal.decodeImage(col("media")).as("m")).head()
    assert(bad.isNullAt(0))
  }

  test("features: decoded images take the pooled-luminance path, others the fallback") {
    val png = makePng(16, 16, (x, y) => x * 5 + y * 9) // non-flat gradient
    val real = graft.functions.BinaryFeatures.compute(png, 16).toSeq
    val fallback = graft.functions.BinaryFeatures.byteHashFeatures(png, 16).toSeq
    assert(real != fallback, "decodable image must use the pooled path")
    assert(math.abs(real.map(v => v.toDouble * v).sum - 1.0) < 1e-5)
    // flat image: pooled vector would be zero -> falls back, contract holds
    val flat = makePng(8, 8, (_, _) => 128)
    val f = graft.functions.BinaryFeatures.compute(flat, 16).toSeq
    assert(f == graft.functions.BinaryFeatures.byteHashFeatures(flat, 16).toSeq)
    assert(math.abs(f.map(v => v.toDouble * v).sum - 1.0) < 1e-5)
    // non-image bytes: identical to the explicit fallback
    val blob = Array.tabulate[Byte](256)(i => i.toByte)
    assert(graft.functions.BinaryFeatures.compute(blob, 16).toSeq ==
      graft.functions.BinaryFeatures.byteHashFeatures(blob, 16).toSeq)
  }

  private def makeImg(w: Int, h: Int, fmt: String, gray: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("imageDHash: invariant under lossless re-encode and brightness shift") {
    import spark.implicits._
    def pat(x: Int, y: Int) = (x * 7 + y * 13) % 200
    val blobs = Seq(
      (1L, makeImg(16, 16, "png", pat)),
      (2L, makeImg(16, 16, "bmp", pat)),                   // same pixels
      (3L, makeImg(16, 16, "png", (x, y) => pat(x, y) + 20)), // uniform shift
      (4L, makeImg(16, 16, "png", (x, y) => (x * 29 + y * 5) % 200)), // different
      (5L, Array.fill[Byte](64)(0x42))                     // undecodable
    ).toDF("id", "media")
    val out = blobs.select(col("id"), Multimodal.imageDHash(col("media")).as("ph"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1L).isDefined)
    assert(out(1L) == out(2L), "PNG and BMP of identical pixels must hash equal")
    assert(out(1L) == out(3L), "uniform unclamped brightness shift must not change dHash")
    assert(out(1L) != out(4L), "a different gradient pattern must hash differently")
    assert(out(5L).isEmpty, "undecodable blobs must be null, not throw")
  }

  test("imageNearDupPairs: finds exactly the planted cross-format copy pair") {
    import spark.implicits._
    def pat(x: Int, y: Int) = (x * 7 + y * 13) % 200
    val imgs = Seq(
      (10L, makeImg(16, 16, "png", pat)),
      (11L, makeImg(16, 16, "bmp", pat)),                  // near-dup of 10
      (20L, makeImg(16, 16, "png", (x, y) => (x * 29 + y * 5) % 200)),
      (30L, Array.fill[Byte](64)(0x42))                    // null hash drops out
    ).toDF("id", "media")
    val pairs = Multimodal.imageNearDupPairs(imgs, "id", "media", maxDist = 2)
      .selectExpr("img_a", "img_b", "cast(dist as long) dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((10L, 11L, 0L)))
  }

  test("decodeAudio: real JDK PCM decode roundtrips the generated samples") {
    import spark.implicits._
    val pcm = Array.tabulate[Byte](48)(j => ((j * 7 + 3) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val truth = (0 until 48).map(j => (j * 31L) ^ ((j * 7 + 3) % 256).toLong).sum
    val row = Seq(Tuple1(bos.toByteArray)).toDF("media")
      .select(Multimodal.decodeAudio(col("media")).as("m"))
      .select("m.sample_rate", "m.bits", "m.channels", "m.n_bytes", "m.pcm_checksum")
      .head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getLong(3),
      row.getLong(4)) == (8000, 8, 1, 48L, truth))
    // RIFF magic with garbage body decodes to null, never throws
    val bad = ("RIFF".getBytes("US-ASCII") ++ Array.fill[Byte](32)(7))
    val r2 = Seq(Tuple1(bad)).toDF("media")
      .select(Multimodal.decodeAudio(col("media")).as("m")).head()
    assert(r2.isNullAt(0))
    // features on a real non-flat WAV take the windowed-energy path
    val real = graft.functions.BinaryFeatures.compute(bos.toByteArray, 16).toSeq
    assert(real != graft.functions.BinaryFeatures.byteHashFeatures(bos.toByteArray, 16).toSeq)
    assert(math.abs(real.map(v => v.toDouble * v).sum - 1.0) < 1e-5)
  }

  test("audioWindowEnergy: exact integer window sums, tail partial, " +
      "maxWindows cap, undecodable null") {
    import spark.implicits._
    // 10 samples with values 128 + (-2, -1, 0, 1, 2, 3, -3, 4, -4, 5):
    // windows of 4 → [4+1+0+1, 4+9+9+16, 16+25] = [6, 38, 41]
    val deltas = Seq(-2, -1, 0, 1, 2, 3, -3, 4, -4, 5)
    val pcm = deltas.map(d => (128 + d).toByte).toArray
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq(Tuple1(bos.toByteArray)).toDF("media")
    val en = df.select(Multimodal.audioWindowEnergy(col("media"), 4).as("e"))
      .as[Seq[Long]].head()
    assert(en == Seq(6L, 38L, 41L))
    val capped = df.select(
        Multimodal.audioWindowEnergy(col("media"), 4, maxWindows = 2).as("e"))
      .as[Seq[Long]].head()
    assert(capped == Seq(6L, 38L))
    val bad = Seq(Tuple1("not audio".getBytes)).toDF("media")
      .select(Multimodal.audioWindowEnergy(col("media"), 4).as("e")).head()
    assert(bad.isNullAt(0))
  }

  test("resizeImage: downscale picks exact source pixels, upscale repeats " +
      "them, undecodable is null") {
    import spark.implicits._
    // 4×2 image, gray g(x,y) = 10x + y
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4) {
      val g = 10 * x + y
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    def truth(outW: Int, outH: Int): Long = {
      var sum = 0L
      for (y <- 0 until outH; x <- 0 until outW) {
        val g = 10 * (x * 4 / outW) + (y * 2 / outH)
        sum += ((x * 31L + y * 17L) ^ ((g << 16) | (g << 8) | g).toLong)
      }
      sum
    }
    val df = Seq(Tuple1(bos.toByteArray)).toDF("media")
    val down = df.select(Multimodal.resizeImage(col("media"), 2, 1).as("r"))
      .select("r.*").as[(Int, Int, Long)].head()
    assert(down == ((2, 1, truth(2, 1))))
    val up = df.select(Multimodal.resizeImage(col("media"), 8, 4).as("r"))
      .select("r.*").as[(Int, Int, Long)].head()
    assert(up == ((8, 4, truth(8, 4))))
    val bad = Seq(Tuple1("not an image".getBytes)).toDF("media")
      .select(Multimodal.resizeImage(col("media"), 2, 2).as("r")).head()
    assert(bad.isNullAt(0))
  }
}
