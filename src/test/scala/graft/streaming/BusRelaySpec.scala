package graft.streaming

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Bus
import org.apache.spark.sql.functions._

/**
 * Exactly-once proof for the bus→bus relay: both crash windows — replay
 * of an epoch whose sink commit DID land (marker fences it) and resume
 * with new upstream data — must leave every source record in the
 * destination topic exactly once, counted by identity.
 */
class BusRelaySpec extends SparkSpec {

  private def produce(root: String, topic: String, lo: Long, hi: Long): Unit = {
    import spark.implicits._
    spark.range(lo, hi)
      .select(col("id").cast("string").as("key"),
        col("id").cast("string").cast("binary").as("value"))
      .select(pmod(xxhash64(col("key")), lit(4)).cast("int").as("partition"),
        col("value"))
      .write.format(Bus.logBusFmt)
      .option("root", root).option("topic", topic).option("partitions", "4")
      .mode("append").save()
  }

  private def readIds(root: String, topic: String): Seq[Long] =
    spark.read.format(Bus.logBusFmt)
      .option("root", root).option("topic", topic).option("partitions", "4")
      .load().select(col("value").cast("string").as("v"))
      .collect().map(_.getString(0).toLong).toSeq

  test("relay src->dst: exactly-once through drain, forced epoch replay, " +
    "and restart with new data") {
    val root = Files.createTempDirectory("busrelay").toString
    val ckpt = s"$root/ckpt"
    produce(root, "src", 0, 150)

    def drainOnce(): Unit = {
      val q = BusRelay.start(spark, root, "src", "dst", ckpt,
        // value-preserving transform with a re-route: dst partition comes
        // from the VALUE hash, exercising a real shuffle between topics
        transform = df => df.select(
          pmod(xxhash64(col("value")), lit(4)).cast("int").as("partition"),
          col("value")))
      q.awaitTermination() // AvailableNow self-terminates
    }

    drainOnce()
    val ids1 = readIds(root, "dst")
    assert(ids1.sorted == (0L until 150L), "first drain must relay all 150 once")

    // force Structured Streaming to REPLAY the last epoch: delete the
    // checkpoint's most recent commit file (and its .crc sibling — the
    // local ChecksumFileSystem fails the replayed commit otherwise)
    val commits = new File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete())
    val crc = new File(commits, s".${last.getName}.crc")
    if (crc.exists()) assert(crc.delete())

    drainOnce() // replays the deleted epoch against the already-marked sink
    val ids2 = readIds(root, "dst")
    assert(ids2.sorted == (0L until 150L),
      s"forced epoch replay must not double-publish (got ${ids2.size} rows)")

    // resume with new upstream data: only the delta flows
    produce(root, "src", 150, 200)
    drainOnce()
    val ids3 = readIds(root, "dst")
    assert(ids3.sorted == (0L until 200L),
      s"restart with new data must relay the delta exactly once (got ${ids3.size})")
  }
}
