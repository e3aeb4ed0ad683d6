package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.apps.DataGen
import graft.sources.v2.{BusStreamingWrite, GraftLogBus}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * The runnable message bus (S1/S2/K3 end-to-end — the path the env-blocked
 * Kafka connector could not execute): log-structured segments with
 * per-partition offsets, driven through real Spark queries.
 */
class GraftLogBusSpec extends SparkSpec {

  private val fmt = "graft.sources.v2.GraftLogBusSource"

  private def newRoot(): String =
    Files.createTempDirectory("logbus").toString

  private def produceIds(root: String, topic: String, lo: Long, hi: Long,
      partitions: Int = 4): Unit = {
    import spark.implicits._
    val df = spark.range(lo, hi)
      .select(col("id").cast("string").as("key"),
        col("id").cast("string").cast("binary").as("value"))
    GraftLogBus.route(df, col("key"), partitions)
      .write.format(fmt).option("root", root).option("topic", topic)
      .option("partitions", partitions.toString).mode("append").save()
  }

  private def readAll(root: String, topic: String, partitions: Int = 4) =
    spark.read.format(fmt).option("root", root).option("topic", topic)
      .option("partitions", partitions.toString).load()

  test("produce -> batch read: no loss, no dups, contiguous per-partition offsets, hash routing") {
    val root = newRoot()
    produceIds(root, "t1", 0, 1000)
    val rows = readAll(root, "t1")
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
      .collect()
    assert(rows.length === 1000)
    // every produced id exactly once
    assert(rows.map(_.getString(2).toLong).sorted.toSeq === (0L until 1000L))
    // offsets contiguous from 0 within each partition
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val offs = rs.map(_.getLong(1)).sorted
      assert(offs.toSeq === (0L until offs.length))
    }
    // routing matches the declared key hash
    val expected = spark.range(0, 1000)
      .select(pmod(xxhash64(col("id").cast("string")), lit(4)).cast("int").as("p"),
        col("id"))
      .collect().map(r => r.getLong(1) -> r.getInt(0)).toMap
    rows.foreach(r => assert(r.getInt(0) === expected(r.getString(2).toLong)))
  }

  test("append order is offset order within a partition (per-key ordering)") {
    val root = newRoot()
    produceIds(root, "t2", 0, 100)   // first publish: ids 0-99
    produceIds(root, "t2", 0, 100)   // second publish of the SAME keys
    val rows = readAll(root, "t2")
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
      .collect()
    assert(rows.length === 200)
    // for each key: both occurrences in one partition, first < second
    rows.groupBy(_.getString(2)).foreach { case (_, occ) =>
      assert(occ.map(_.getInt(0)).distinct.length === 1,
        "same key must stay in one partition")
      assert(occ.map(_.getLong(1)).distinct.length === 2)
    }
    // the second publish's records all sit after the first's per partition:
    // segment seq increases per publish, so offsets of publish 2 > publish 1
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      val byKey = rs.groupBy(_.getString(2))
      val firstMax = byKey.values.map(_.map(_.getLong(1)).min).max
      val secondMin = byKey.values.map(_.map(_.getLong(1)).max).min
      assert(secondMin > firstMax ||
        byKey.values.forall(o => o.map(_.getLong(1)).min < o.map(_.getLong(1)).max))
    }
  }

  test("unbounded tailing: records published mid-stream arrive; offsets resume from checkpoint") {
    val root = newRoot()
    val ckpt = Files.createTempDirectory("busckpt").toString
    val out = Files.createTempDirectory("busout").toString
    produceIds(root, "t3", 0, 300)
    def drain(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("root", root).option("topic", "t3").option("partitions", "4")
        .load()
        .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 300)
    // publish MORE while the consumer is stopped; resume reads ONLY the new
    produceIds(root, "t3", 300, 500)
    drain()
    val all = spark.read.parquet(out).select("v").collect().map(_.getString(0).toLong)
    assert(all.length === 500, "checkpoint resume must not re-read old records")
    assert(all.sorted.toSeq === (0L until 500L))
  }

  test("admission control: maxPerTrigger paces the drain across micro-batches") {
    val root = newRoot()
    val ckpt = Files.createTempDirectory("busckpt2").toString
    produceIds(root, "t4", 0, 1000)
    var batches = 0
    var rows = 0L
    val q = spark.readStream.format(fmt)
      .option("root", root).option("topic", "t4").option("partitions", "4")
      .option("maxPerTrigger", "100")
      .load()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count(); if (n > 0) { batches += 1; rows += n }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(rows === 1000)
    assert(batches >= 5, s"expected a paced catch-up, got $batches batches")
  }

  test("streaming publish: epoch replay commits nothing twice; aborted attempts stay invisible") {
    val root = newRoot()
    val w = new BusStreamingWrite(root, "t5", 2)
    def attempt(task: Long, n: Int) = {
      val f = new graft.sources.v2.BusStreamingWriterFactory(root, "t5", 2)
        .createWriter(0, task, 7L)
      (0 until n).foreach { i =>
        f.write(org.apache.spark.sql.catalyst.InternalRow(
          i % 2, s"e$i".getBytes("UTF-8")))
      }
      f.commit()
    }
    w.commit(7L, Array(attempt(0L, 10)))
    // post-restart replay of epoch 7 — same data, committed again
    w.commit(7L, Array(attempt(1L, 10)))
    assert(readAll(root, "t5", 2).count() === 10,
      "replayed epoch must not double-publish")
    // an aborted task attempt leaves nothing visible
    val f2 = new graft.sources.v2.BusStreamingWriterFactory(root, "t5", 2)
      .createWriter(0, 9L, 8L)
    f2.write(org.apache.spark.sql.catalyst.InternalRow(0, "x".getBytes))
    f2.abort()
    assert(readAll(root, "t5", 2).count() === 10)
    // tmp dir holds no stragglers
    val tmps = Option(new File(new File(root, "t5"), ".tmp").listFiles())
      .map(_.length).getOrElse(0)
    assert(tmps === 0, "aborted/replayed attempts must clean their tmp files")
  }

  test("streaming publish through a real writeStream query (K3 end-to-end)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = newRoot()
    val ckpt = Files.createTempDirectory("buspubckpt").toString
    val mem = MemoryStream[Long](spark)
    val q = mem.toDF()
      .select(pmod(col("value"), lit(3)).cast("int").as("partition"),
        col("value").cast("string").cast("binary").as("value"))
      .writeStream.format(fmt)
      .option("root", root).option("topic", "t7").option("partitions", "3")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(0L until 100L: _*)
      q.processAllAvailable()
      mem.addData(100L until 150L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val back = readAll(root, "t7", 3)
      .select(col("value").cast("string").as("v")).collect()
      .map(_.getString(0).toLong)
    assert(back.length === 150, "both epochs committed exactly once")
    assert(back.sorted.toSeq === (0L until 150L))
  }

  test("e2e: mock records through the bus wire format round-trip typed") {
    val root = newRoot()
    val n = 500L
    val recs = DataGen.mockRecords(spark, n)
    Bus.logBusAppend(recs, root, "t6", partitions = 4)
    // bounded replay of the unbounded source
    val ckpt = Files.createTempDirectory("busckpt3").toString
    val out = Files.createTempDirectory("busout3").toString
    val q = Bus.logBusRecordSource(spark, root, "t6", partitions = 4)
      .toDF()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val back = spark.read.parquet(out)
    assert(back.count() === n)
    // typed fields survive the Avro wire + frame + decode round trip
    val ids = back.select(col("event.id")).collect().map(_.getString(0)).sorted
    assert(ids.length === n)
    assert(ids.forall(_.startsWith("gen_")))
    val custs = back.select(col("customer.id")).distinct().count()
    assert(custs === math.min(n, 1000L))
  }
}
