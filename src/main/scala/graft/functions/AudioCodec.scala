package graft.functions

import java.io.ByteArrayInputStream

import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/**
 * REAL audio decode on the JDK's built-in `javax.sound.sampled` (WAV/AU/
 * AIFF PCM readers ship with every JRE — same story as [[ImageCodec]]:
 * the "no audio codecs in this container" assumption only holds for
 * compressed formats like MP3/AAC). PCM decode is exact, so every derived
 * value is deterministic. Same scale shape as the image path: decode
 * inside the scan projection, only the tiny derived struct leaves the
 * operator, failures are null.
 */
object AudioCodec {

  /** Decoded PCM payload + format, or None for non-decodable bytes. */
  def tryDecodePcm(bytes: Array[Byte]): Option[(javax.sound.sampled.AudioFormat, Array[Byte])] = {
    if (bytes == null || bytes.length < 12) return None
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try Some((ais.getFormat, ais.readAllBytes()))
      finally ais.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic PCM checksum: Σ over byte index i of (i*31 ^ (b&0xFF))
    * — mirrorable from a known sample pattern without any codec.
    */
  def pcmChecksum(pcm: Array[Byte]): Long = {
    var sum = 0L
    var i = 0
    while (i < pcm.length) { sum += ((i * 31L) ^ (pcm(i) & 0xFFL)); i += 1 }
    sum
  }

  /** Windowed-energy features from 8-bit PCM: samples normalized to
    * [-1, 1), mean energy per `dim` contiguous windows, zero-centered and
    * L2-normalized. None for empty or flat signals (zero vector would
    * break the unit-norm contract) — callers fall back to byte-hash
    * features.
    */
  def windowedEnergyFeatures(pcm: Array[Byte], dim: Int): Option[Array[Float]] = {
    val n = pcm.length
    if (n == 0) return None
    val acc = new Array[Double](dim)
    val cnt = new Array[Long](dim)
    var i = 0
    while (i < n) {
      val s = ((pcm(i) & 0xFF) - 128) / 128.0
      val w = math.min(dim - 1, (i.toLong * dim / n).toInt)
      acc(w) += s * s
      cnt(w) += 1
      i += 1
    }
    var total = 0.0
    var d = 0
    while (d < dim) {
      if (cnt(d) > 0) acc(d) /= cnt(d)
      total += acc(d)
      d += 1
    }
    val mean = total / dim
    var norm = 0.0
    d = 0
    while (d < dim) { acc(d) -= mean; norm += acc(d) * acc(d); d += 1 }
    if (norm == 0.0) return None
    val inv = 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    d = 0
    while (d < dim) { out(d) = (acc(d) * inv).toFloat; d += 1 }
    Some(out)
  }

  /** Eval hook for [[AudioDecodeMeta]]. */
  def decodeMeta(bytes: Array[Byte]): InternalRow =
    tryDecodePcm(bytes) match {
      case Some((fmt, pcm)) =>
        InternalRow(fmt.getSampleRate.toInt, fmt.getSampleSizeInBits,
          fmt.getChannels, pcm.length.toLong, pcmChecksum(pcm))
      case None => null
    }

  /** Eval hook for [[AudioWindowEnergy]]: per-window Σ(sample-128)² over
    * the decoded 8-bit PCM stream — EXACT integer arithmetic (zero-point
    * 128 for unsigned 8-bit), so segment energies are mirrorable from a
    * known sample pattern with no codec and no float rounding. The tail
    * window keeps its partial sum; at most `maxWindows` windows are
    * emitted (a 10-hour file must not explode a row). This is the
    * silence/activity segmentation primitive: thresholding these energies
    * is voice-activity detection's first stage.
    */
  def windowEnergies(bytes: Array[Byte], windowSamples: Int,
      maxWindows: Int): org.apache.spark.sql.catalyst.util.GenericArrayData =
    tryDecodePcm(bytes) match {
      case Some((_, pcm)) =>
        val n = pcm.length
        val nW = math.min(maxWindows.toLong,
          (n.toLong + windowSamples - 1) / windowSamples).toInt
        val out = new Array[Long](nW)
        var w = 0
        while (w < nW) {
          var sum = 0L
          var i = w * windowSamples
          val end = math.min(n, i + windowSamples)
          while (i < end) {
            val s = (pcm(i) & 0xFF) - 128
            sum += s.toLong * s
            i += 1
          }
          out(w) = sum
          w += 1
        }
        new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
      case None => null
    }
}

object NativeAudioKit {
  /** Decoded audio metadata: struct(sample_rate, bits, channels, n_bytes,
    * pcm_checksum), null for non-decodable blobs.
    */
  def audioDecodeMeta(c: Column): Column =
    GraftColumnBridge.column(AudioDecodeMeta(GraftColumnBridge.expression(c)))

  /** Per-window integer PCM energies (array<long>), null for
    * non-decodable blobs.
    */
  def audioWindowEnergy(c: Column, windowSamples: Int,
      maxWindows: Int = 4096): Column =
    GraftColumnBridge.column(AudioWindowEnergy(
      GraftColumnBridge.expression(c), windowSamples, maxWindows))
}

/** Catalyst expression: decode an audio blob and emit per-window integer
  * energies ([[AudioCodec.windowEnergies]]); null for non-decodable
  * input. Only the energy array leaves the scan — never PCM.
  */
case class AudioWindowEnergy(child: Expression, windowSamples: Int,
    maxWindows: Int) extends UnaryExpression {
  require(windowSamples >= 1 && maxWindows >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioCodec.windowEnergies(input.asInstanceOf[Array[Byte]],
      windowSamples, maxWindows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioCodec.windowEnergies($c, $windowSamples, $maxWindows);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioWindowEnergy =
    copy(child = newChild)
}

/** Catalyst expression: decode an audio blob (JDK PCM readers) and emit
  * format + payload checksum; null for non-decodable input.
  */
case class AudioDecodeMeta(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("pcm_checksum", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    AudioCodec.decodeMeta(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioCodec.decodeMeta($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AudioDecodeMeta =
    copy(child = newChild)
}
