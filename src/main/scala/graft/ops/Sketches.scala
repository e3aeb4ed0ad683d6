package graft.ops

import java.io.{ByteArrayInputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/**
 * Frequency sketches: count-min over a key column, and a heavy-hitter
 * report that cross-checks the sketch against the exact counts.
 *
 * Engine extension (SURVEY §2.12): corpus curation needs "which domains /
 * URLs / fingerprints are flooding the crawl" continuously; at 100 TB the
 * exact answer is a full shuffle of the key universe while the CMS is a
 * fixed KB-sized, MERGEABLE summary — partial aggregation combines
 * per-partition sketches, so one pass, no shuffle of the keys, and
 * day-over-day sketches merge for free. The deterministic seed makes the
 * whole report replayable.
 */
object Sketches {

  /** One-pass count-min sketch build (Spark's `count_min_sketch` aggregate:
    * per-partition sketches merged in partial aggregation — the driver
    * receives exactly one `depth x width` counter table, independent of
    * data volume).
    */
  def countMin(df: DataFrame, keyCol: String, eps: Double,
               confidence: Double, seed: Int): CountMinSketch = {
    val bytes = df
      .agg(count_min_sketch(col(keyCol), lit(eps), lit(confidence), lit(seed)))
      .head.getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /**
   * Exact heavy hitters (count > minCount) with sketch cross-check columns:
   * `est_ge_exact` is the CMS one-sided-error THEOREM (estimates never
   * undercount — hash collisions only add), `within_eps` the probabilistic
   * bound est <= exact + eps*n at the build confidence, realized
   * deterministically by the fixed seed.
   *
   * The exact side is one partial-agg'd hash shuffle; the driver
   * materializes only the heavy set, which is theorem-bounded at
   * n/minCount keys regardless of data volume (at most n/minCount keys can
   * each exceed minCount occurrences) — model-sized, like an IVF quantizer.
   */
  def heavyHittersChecked(spark: SparkSession, df: DataFrame, keyCol: String,
                          minCount: Long, eps: Double = 1e-4,
                          confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    import spark.implicits._
    val n = df.count()
    // cast once so the sketch hashes the same physical type it is probed with
    val keyed = df.select(col(keyCol).cast("long").as(keyCol))
    val cms = countMin(keyed, keyCol, eps, confidence, seed)
    val slack = math.ceil(eps * n).toLong
    val heavy = df.groupBy(col(keyCol).cast("long").as("key"))
      .agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") > minCount)
      .as[(Long, Long)].collect()
    val rows: Seq[(Long, Long, Boolean, Boolean)] = heavy.toSeq.map {
      case (k, exact) =>
        val est = cms.estimateCount(k)
        (k, exact, est >= exact, est <= exact + slack)
    }
    rows.toDF("key", "n_exact", "est_ge_exact", "within_eps")
      .orderBy(col("key"))
  }

  /** Serializable carrier for a KLL sketch buffer: the live heap sketch is
    * transient; Java serialization moves the compact byte image (only at
    * partial→final exchange — `ScalaAggregator` is a
    * `TypedImperativeAggregate`, so within a partition the buffer stays an
    * object and `update` never serializes).
    */
  final class KllBuf(@transient var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(o: ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      o.writeInt(b.length); o.write(b)
    }
    private def readObject(i: ObjectInputStream): Unit = {
      val b = new Array[Byte](i.readInt()); i.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  /**
   * Typed `Aggregator` over DataSketches KLL — the mergeable quantile
   * sketch (Karnin–Lang–Liberty 2016): ~KB state for 1.65% normalized
   * rank error at k=200, mergeable across partitions/days like the CMS
   * above. This is the engine's custom-UDAF surface: per-partition
   * sketches update in place, merge at the exchange, one compact image
   * reaches the driver regardless of data volume.
   */
  final class KllAgg(k: Int) extends Aggregator[Double, KllBuf, Array[Byte]] {
    override def zero: KllBuf = new KllBuf(KllDoublesSketch.newHeapInstance(k))
    override def reduce(b: KllBuf, a: Double): KllBuf = { b.sk.update(a); b }
    override def merge(x: KllBuf, y: KllBuf): KllBuf = { x.sk.merge(y.sk); x }
    override def finish(b: KllBuf): Array[Byte] = b.sk.toByteArray
    override def bufferEncoder: Encoder[KllBuf] = Encoders.javaSerialization[KllBuf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /**
   * Quantile report with a rank-error gate: one KLL pass + one exact
   * counting pass verifying every returned quantile's TRUE rank lands
   * within 3× the sketch's own normalized rank error (KLL compaction is
   * randomized, so the gate asserts the guarantee envelope, not a pinned
   * value). Returns (q_bps, n, within_bound) per requested quantile.
   */
  def kllQuantilesChecked(spark: SparkSession, df: DataFrame, valueCol: String,
      qs: Seq[Double], k: Int = 200): DataFrame = {
    import spark.implicits._
    val kll = udaf(new KllAgg(k))
    val bytes = df.select(col(valueCol).cast("double").as("v"))
      .agg(kll(col("v"))).head.getAs[Array[Byte]](0)
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    val vs = qs.map(sk.getQuantile)
    val aggCols = count(lit(1)).as("n") +: vs.zipWithIndex.map { case (v, i) =>
      sum(when(col(valueCol).cast("double") <= v, 1L).otherwise(0L)).as(s"r$i")
    }
    val ranks = df.agg(aggCols.head, aggCols.tail: _*).head
    val n = ranks.getLong(0)
    val slack = 3.0 * sk.getNormalizedRankError(true)
    val rows = qs.zipWithIndex.map { case (q, i) =>
      ((q * 10000).round, n, math.abs(ranks.getLong(i + 1).toDouble / n - q) <= slack)
    }
    rows.toDF("q_bps", "n", "within_bound").orderBy(col("q_bps"))
  }
}
