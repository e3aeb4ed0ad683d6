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

  test("atomic commit: a crash mid-rename leaves NOTHING visible; replay re-commits in full") {
    val root = newRoot()
    val w = new BusStreamingWrite(root, "t8", 2, "qcrash")
    def attempt(task: Long, n: Int) = {
      val f = new graft.sources.v2.BusStreamingWriterFactory(root, "t8", 2)
        .createWriter(0, task, 7L)
      (0 until n).foreach { i =>
        f.write(org.apache.spark.sql.catalyst.InternalRow(
          i % 2, s"e$i".getBytes("UTF-8")))
      }
      f.commit().asInstanceOf[graft.sources.v2.BusMultiMessage]
    }
    // simulate the driver dying MID-COMMIT: one partition's segment renamed
    // into place, the other's tmp left behind, no marker written
    val crashed = attempt(0L, 10)
    val seg0 = crashed.segs.find(_.partition === 0).get
    val p0 = new File(new File(root, "t8"), "p0"); p0.mkdirs()
    assert(new File(seg0.tmpPath).renameTo(
      new File(p0, f"s${0L}%012d-o${0L}%015d-c${seg0.count}.seg")))
    // atomicity: the half-renamed epoch is INVISIBLE (no marker)
    assert(readAll(root, "t8", 2).count() === 0,
      "a partial commit must not be reader-visible")
    // post-restart replay of epoch 7 — marker absent, so it commits in full
    w.commit(7L, Array(attempt(1L, 10)))
    val vs = readAll(root, "t8", 2)
      .select(col("value").cast("string")).collect().map(_.getString(0)).sorted
    assert(vs.toSeq === (0 until 10).map(i => s"e$i").sorted,
      "replay after a partial commit must publish every record exactly once")
    // the crashed attempt's stray segment is swept by retention GC — but
    // only once old enough that no in-flight commit can still own it
    val aged = GraftLogBus.expire(root, "t8", 2, _ => 0L)
    assert(aged.straysDeleted === 0,
      "a FRESH unmarked segment may be a live commit mid-rename; default age gate must keep it")
    val stats = GraftLogBus.expire(root, "t8", 2, _ => 0L, strayMinAgeMillis = 0L)
    assert(stats.straysDeleted === 1)
    assert(readAll(root, "t8", 2).count() === 10)
  }

  test("batch appends never fence out a streaming epoch with the same number") {
    val root = newRoot()
    produceIds(root, "t9", 0, 100)             // batch append — log seq 0
    val w = new BusStreamingWrite(root, "t9", 4, "qmix")
    val f = new graft.sources.v2.BusStreamingWriterFactory(root, "t9", 4)
      .createWriter(0, 0L, 0L)                  // streaming epoch 0
    (0 until 10).foreach { i =>
      f.write(org.apache.spark.sql.catalyst.InternalRow(
        i % 4, s"s$i".getBytes("UTF-8")))
    }
    w.commit(0L, Array(f.commit()))
    assert(readAll(root, "t9", 4).count() === 110,
      "epoch 0 must commit even though a batch append already used seq 0")
    // and the epoch IS fenced against its own replay
    val f2 = new graft.sources.v2.BusStreamingWriterFactory(root, "t9", 4)
      .createWriter(0, 1L, 0L)
    f2.write(org.apache.spark.sql.catalyst.InternalRow(0, "dup".getBytes))
    w.commit(0L, Array(f2.commit()))
    assert(readAll(root, "t9", 4).count() === 110)
  }

  test("retention: expire consumed segments, offsets stay stable, checkpoint resumes, stale checkpoint fails fast") {
    val root = newRoot()
    val ckpt = Files.createTempDirectory("busretck").toString
    val out = Files.createTempDirectory("busretout").toString
    produceIds(root, "t10", 0, 150)
    produceIds(root, "t10", 150, 300)
    def drain(): Unit = {
      val q = spark.readStream.format(fmt)
        .option("root", root).option("topic", "t10").option("partitions", "4")
        .load()
        .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 300)
    // floor = what the checkpoint has passed (max consumed offset + 1)
    val floors = spark.read.parquet(out).groupBy("partition")
      .agg(max("offset").as("m")).collect()
      .map(r => r.getInt(0) -> (r.getLong(1) + 1)).toMap
    val stats = GraftLogBus.expire(root, "t10", 4, p => floors.getOrElse(p, 0L))
    assert(stats.segmentsDeleted > 0)
    assert(stats.recordsDropped === 300)
    // offsets are STABLE across retention: new records continue numbering
    produceIds(root, "t10", 300, 400)
    drain()
    val all = spark.read.parquet(out)
    assert(all.count() === 400, "resume across retention must read only new records")
    assert(all.select("v").collect().map(_.getString(0).toLong).sorted.toSeq
      === (0L until 400L))
    // a fresh batch read sees only retained records, at their ORIGINAL offsets
    val fresh = readAll(root, "t10", 4)
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
    val freshRows = fresh.collect()
    assert(freshRows.map(_.getString(2).toLong).sorted.toSeq === (300L until 400L))
    val resumedOffsets = all.filter(col("v").cast("long") >= 300)
      .select("partition", "offset", "v").collect()
      .map(r => (r.getInt(0), r.getString(2))).toSet
    assert(freshRows.map(r => (r.getInt(0), r.getString(2))).toSet === resumedOffsets)
    freshRows.groupBy(_.getInt(0)).foreach { case (p, rs) =>
      assert(rs.map(_.getLong(1)).min === floors.getOrElse(p, 0L),
        s"partition $p must resume numbering at its retention floor")
    }
    // a NEW streaming consumer starts at the log-start base, not offset 0
    val ckpt2 = Files.createTempDirectory("busretck2").toString
    val out2 = Files.createTempDirectory("busretout2").toString
    val q2 = spark.readStream.format(fmt)
      .option("root", root).option("topic", "t10").option("partitions", "4")
      .load()
      .select(col("value").cast("string").as("v"))
      .writeStream.format("parquet")
      .option("path", out2).option("checkpointLocation", ckpt2)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(spark.read.parquet(out2).count() === 100)
    // expire PAST a live checkpoint -> that consumer must fail fast:
    // publish records the ckpt2 consumer has NOT seen, then drop them
    produceIds(root, "t10", 400, 410)
    GraftLogBus.expire(root, "t10", 4, _ => Long.MaxValue)
    produceIds(root, "t10", 410, 420)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q3 = spark.readStream.format(fmt)
        .option("root", root).option("topic", "t10").option("partitions", "4")
        .load()
        .writeStream.format("parquet")
        .option("path", out2).option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow()).start()
      q3.awaitTermination()
    }
    assert(ex.getMessage.contains("expired by retention") ||
      Option(ex.getCause).exists(_.getMessage.contains("expired by retention")))
  }

  test("schema evolution: epochs written with v1 and evolved v2 writer schemas decode in ONE run") {
    import graft.functions.AvroKit
    val root = newRoot()
    val reg = Files.createTempDirectory("busreg").toString
    // publish #1: v1 writer schema (id, name)
    val v1 = spark.range(0, 50)
      .select(col("id").cast("string").as("key"),
        AvroKit.toAvroEvolving(
          struct(col("id"), concat(lit("n"), col("id")).as("name")), reg).as("value"))
    GraftLogBus.route(v1, col("key"), 2)
      .write.format(fmt).option("root", root).option("topic", "tev")
      .option("partitions", "2").mode("append").save()
    // publish #2: EVOLVED v2 writer schema (added nullable score)
    val v2 = spark.range(50, 80)
      .select(col("id").cast("string").as("key"),
        AvroKit.toAvroEvolving(
          struct(col("id"), concat(lit("n"), col("id")).as("name"),
            (col("id") * 2).as("score")), reg).as("value"))
    GraftLogBus.route(v2, col("key"), 2)
      .write.format(fmt).option("root", root).option("topic", "tev")
      .option("partitions", "2").mode("append").save()
    // ONE consumer with the v2 reader schema drains BOTH generations
    val ckpt = Files.createTempDirectory("busevck").toString
    val out = Files.createTempDirectory("busevout").toString
    val q = spark.readStream.format(fmt)
      .option("root", root).option("topic", "tev").option("partitions", "2")
      .load()
      .select(AvroKit.fromAvroEvolving(col("value"),
        "id BIGINT, name STRING, score BIGINT", reg).as("r"))
      .select(col("r.id").as("id"), col("r.name").as("name"),
        col("r.score").as("score"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.read.parquet(out).collect()
    assert(rows.length === 80)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === s"n$id")
      if (id < 50) assert(r.isNullAt(2), "v1 frames surface the added field as null")
      else assert(r.getLong(2) === id * 2)
    }
    // and a v1 reader still decodes v2 frames (the added field is dropped)
    val back = spark.read.format(fmt)
      .option("root", root).option("topic", "tev").option("partitions", "2").load()
      .select(AvroKit.fromAvroEvolving(col("value"), "id BIGINT, name STRING", reg)
        .as("r"))
      .select(col("r.id")).collect().map(_.getLong(0)).sorted
    assert(back.toSeq === (0L until 80L))
  }

  test("expire is atomic for readers: surviving offsets never shift, torn states attribute exactly") {
    val root = newRoot()
    produceIds(root, "t12", 0, 100)
    produceIds(root, "t12", 100, 200)
    produceIds(root, "t12", 200, 300)
    def snapshot() = readAll(root, "t12")
      .select(col("partition"), col("offset"), col("value").cast("string").as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
    val before = snapshot()
    assert(before.size === 300)

    // A reader racing expire can observe ANY subset of the committed
    // segments (deletes are not transactional across files). Simulate the
    // harshest interleaving: the lowest segment of p0 is gone but NOTHING
    // else — not even `.base` — has been updated. Offset-named segments
    // must keep every surviving record at its original offset (the old
    // cumulative-count scheme shifted them all down by the dropped count).
    val p0 = new File(new File(root, "t12"), "p0")
    val SegName = """s(\d{12})-o(\d{15})-c(\d+)\.seg""".r
    val segs = p0.listFiles().filter(f => SegName.matches(f.getName)).sortBy(_.getName)
    // one segment per (publish, writing task) that touched p0
    assert(segs.length >= 2)
    val droppedCount = segs.head.getName match { case SegName(_, _, c) => c.toLong }
    assert(segs.head.delete())

    val torn = snapshot()
    assert(torn.size === 300 - droppedCount)
    torn.foreach { case (key, v) =>
      assert(before(key) === v,
        s"surviving record at $key changed value after a torn expire — offsets shifted")
    }
    // p0's survivors resume exactly where the dropped segment ended
    val p0Offsets = torn.keys.filter(_._1 == 0).map(_._2)
    assert(p0Offsets.min === droppedCount)

    // a REAL expire over the remaining partitions preserves attribution too
    val floors = before.keys.groupBy(_._1).map { case (p, ks) =>
      // floor = past each partition's first segment (p0's is already gone)
      p -> (if (p == 0) droppedCount else ks.map(_._2).min + 40)
    }
    GraftLogBus.expire(root, "t12", 4, p => floors.getOrElse(p, 0L),
      strayMinAgeMillis = 0L)
    val after = snapshot()
    after.foreach { case (key, v) =>
      assert(before(key) === v, s"record at $key shifted across expire")
    }
    // floors only drop WHOLE segments: every floor-passed record whose
    // segment straddles the floor is still present and correctly placed
    assert(after.keys.filter(_._1 == 0).map(_._2).min === droppedCount)
  }

  test("a legacy-named segment (pre-offset-naming) fails fast instead of " +
    "being silently invisible") {
    val root = newRoot()
    produceIds(root, "tleg", 0, 100)
    // plant a legacy-format segment in one partition dir: its offsets were
    // listing-derived and cannot be attributed under the offset-named
    // protocol — readers must refuse the directory loudly
    val p0 = new File(root, "tleg/p0")
    Files.write(new File(p0, "s000000000042-t7-c5.seg").toPath,
      Array[Byte](1, 2, 3))
    val err = intercept[Exception] {
      readAll(root, "tleg").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(err).exists(_.contains("legacy-named segment")),
      s"expected the legacy fail-fast, got: $err")
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
