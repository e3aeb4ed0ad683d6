package graft.streaming

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.Bus
import graft.sources.lake.GraftLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * The bus→lake composition: a log-bus topic streamed through
 * `foreachBatch` into a [[GraftLake]] table, with the lake's
 * (appId, epochId) txn fence carrying exactly-once across BOTH crash
 * windows — a replayed epoch whose lake commit DID land (fenced to a
 * no-op) and a restart with new upstream data (only the delta appends).
 * This is the ingestion path a 100 TB training-data store runs all day:
 * message log in, ACID table out, no dups under any driver crash.
 */
class LakeStreamSpec extends SparkSpec {

  private def produce(root: String, topic: String, lo: Long, hi: Long): Unit = {
    spark.range(lo, hi)
      .select(pmod(col("id"), lit(4)).cast("int").as("partition"),
        col("id").cast("string").cast("binary").as("value"))
      .write.format(Bus.logBusFmt)
      .option("root", root).option("topic", topic).option("partitions", "4")
      .mode("append").save()
  }

  private def ids(df: DataFrame): Seq[Long] =
    df.select(col("id")).collect().map(_.getLong(0)).toSeq

  test("bus -> foreachBatch -> lake: exactly-once through drain, forced " +
    "epoch replay, and restart with new data") {
    val root = Files.createTempDirectory("lakestream").toString
    val ckpt = s"$root/ckpt"
    val tbl = s"$root/table"
    produce(root, "docs", 0, 120)
    GraftLake.create(
      spark.range(0, 0).select(col("id"), lit("seed").as("src")), tbl)

    def drainOnce(): Unit = {
      val q = spark.readStream.format(Bus.logBusFmt)
        .option("root", root).option("topic", "docs").option("partitions", "4")
        .load()
        .select(col("value").cast("string").cast("long").as("id"),
          lit("bus").as("src"))
        .writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, epochId: Long) =>
          GraftLake.appendStreamBatch(batch, tbl, "lake-ingest-spec", epochId,
            numFiles = 2)
          ()
        }
        .start()
      q.awaitTermination()
    }

    drainOnce()
    assert(ids(GraftLake.read(spark, tbl)).sorted == (0L until 120L),
      "first drain must land all 120 rows once")

    // force Structured Streaming to REPLAY the last epoch: delete the
    // checkpoint's most recent commit file (and its .crc sibling — the
    // local ChecksumFileSystem fails the replayed commit otherwise)
    val commits = new File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    new File(commits, s".${last.getName}.crc").delete()
    last.delete()
    drainOnce()
    val after = ids(GraftLake.read(spark, tbl))
    assert(after.sorted == (0L until 120L),
      s"replayed epoch must be fenced to a no-op (got ${after.size} rows)")

    // resume with new upstream data: only the delta appends
    produce(root, "docs", 120, 160)
    drainOnce()
    assert(ids(GraftLake.read(spark, tbl)).sorted == (0L until 160L),
      "restart with new data must append the delta exactly once")

    // and the lake history shows only stream-append commits past v0
    val ops = GraftLake.history(tbl).map(_._2)
    assert(ops.head == "create" && ops.tail.forall(_ == "stream-append"))
  }
}
