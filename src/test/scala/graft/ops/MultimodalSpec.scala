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
}
