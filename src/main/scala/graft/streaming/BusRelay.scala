package graft.streaming

import graft.sources.Bus
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * Exactly-once bus→bus relay — the read-process-write loop a
 * log-structured pipeline runs between topics (Kafka Streams' EOS shape;
 * the reference's consume→transform→produce composition,
 * streaming/utils/pubsub/PubSubConsumer.scala:38-52 feeding
 * PubSubProducer.scala:51-56, here over the runnable log bus).
 *
 * Exactly-once is COMPOSED, not bolted on: the source's per-partition
 * offsets live in this query's checkpoint, so a restart replays exactly
 * the unacknowledged offset range; the sink's atomic (queryId, epochId)
 * marker commit makes the replayed epoch's publish a detected no-op. The
 * two crash windows are therefore both safe — before sink commit (the
 * partial output was never visible: segments become readable only with
 * the marker) and between sink commit and checkpoint commit (the replay
 * is fenced by the marker). `BusRelaySpec` proves both by kill /
 * forced-epoch-replay / restart with identity counting.
 */
object BusRelay {

  /**
   * Start the relay `srcTopic` → `dstTopic` under `transform`. The
   * transform sees the consumer triple (partition, offset, value) and must
   * yield a producer frame with (partition, value) columns — re-route by
   * key with [[graft.sources.v2.GraftLogBus.route]], or keep the source
   * partition for a partition-affine relay (the default identity does,
   * preserving per-key order end to end when both topics share a
   * partition count).
   */
  def start(spark: SparkSession, root: String, srcTopic: String,
      dstTopic: String, checkpoint: String,
      srcPartitions: Int = 4, dstPartitions: Int = 4,
      transform: DataFrame => DataFrame = identity,
      trigger: Trigger = Trigger.AvailableNow(),
      maxPerTrigger: Long = Long.MaxValue): StreamingQuery = {
    val in = spark.readStream.format(Bus.logBusFmt)
      .option("root", root).option("topic", srcTopic)
      .option("partitions", srcPartitions.toString)
      .option("maxPerTrigger", maxPerTrigger.toString)
      .load()
    transform(in).select("partition", "value")
      .writeStream.format(Bus.logBusFmt)
      .option("root", root).option("topic", dstTopic)
      .option("partitions", dstPartitions.toString)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(trigger).start()
  }
}
