package graft.sources

import graft.SparkSpec
import graft.sources.v2.GraftCountSink

class GraftCountSinkSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.GraftCountSink"

  test("batch write commits the exact row total once") {
    GraftCountSink.clear("t1")
    (1 to 12345).toDF("v").repartition(9)
      .write.format(fmt).option("tag", "t1").mode("append").save()
    assert(GraftCountSink.committed("t1").contains(12345L))
  }

  test("two-phase commit: aborted attempts contribute nothing") {
    // local mode has no task retries, so exercise the DSv2 commit protocol
    // directly: a half-done attempt aborts, its replacement recounts from
    // zero, and only task-committed messages reach the driver commit
    GraftCountSink.clear("t2")
    val row = org.apache.spark.sql.catalyst.InternalRow(1L)
    val f = new graft.sources.v2.GraftCountWriterFactory
    val dead = f.createWriter(0, 0L)
    (1 to 125).foreach(_ => dead.write(row))
    dead.abort() // attempt 0 of partition 0 dies mid-write
    val retry = f.createWriter(0, 1L)
    (1 to 250).foreach(_ => retry.write(row))
    val m0 = retry.commit()
    val w1 = f.createWriter(1, 2L)
    (1 to 750).foreach(_ => w1.write(row))
    val m1 = w1.commit()
    new graft.sources.v2.GraftCountBatchWrite("t2").commit(Array(m0, m1))
    assert(GraftCountSink.committed("t2").contains(1000L))
  }

  test("empty write commits zero, not absence") {
    GraftCountSink.clear("t3")
    spark.range(0).toDF("v").write.format(fmt).option("tag", "t3")
      .mode("append").save()
    assert(GraftCountSink.committed("t3").contains(0L))
  }

  test("streaming write commits per epoch through a real query") {
    GraftCountSink.clearStreaming("s1")
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val ckpt = java.nio.file.Files.createTempDirectory("sinkckpt").toString
    val q = mem.toDF().writeStream.format(fmt)
      .option("tag", "s1").option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      mem.addData(1L to 100L: _*)
      q.processAllAvailable()
      mem.addData(1L to 50L: _*)
      q.processAllAvailable()
      assert(GraftCountSink.committedStreaming("s1") === 150L)
      assert(GraftCountSink.committedEpochs("s1") >= 2)
    } finally q.stop()
  }

  test("streaming commit is idempotent per epoch (replayed micro-batch)") {
    GraftCountSink.clearStreaming("s2")
    val w = new graft.sources.v2.GraftCountStreamingWrite("s2")
    val row = org.apache.spark.sql.catalyst.InternalRow(1L)
    def msg(n: Int) = {
      val dw = (new graft.sources.v2.GraftCountStreamingWriterFactory)
        .createWriter(0, 0L, 7L)
      (1 to n).foreach(_ => dw.write(row))
      dw.commit()
    }
    w.commit(7L, Array(msg(400)))
    // post-restart replay of epoch 7: same data, committed again
    w.commit(7L, Array(msg(400)))
    w.commit(8L, Array(msg(100)))
    assert(GraftCountSink.committedStreaming("s2") === 500L)
    assert(GraftCountSink.committedEpochs("s2") === 2)
  }
}
