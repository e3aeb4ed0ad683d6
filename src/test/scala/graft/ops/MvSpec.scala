package graft.ops

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MvSpec extends SparkSpec {
  import spark.implicits._

  private def viewOf(path: String): Map[String, (Long, Long)] =
    Mv.read(spark, path).select("k", "m_sum", "__cnt")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("refresh applies inserts and retractions; zero-count groups vanish; " +
    "old versions remain readable") {
    val path = Files.createTempDirectory("mv1").toString
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("c", 7L)).toDF("k", "m")
    Mv.build(base, path, Seq("k"), Seq("m"))
    assert(viewOf(path) == Map("a" -> (30L, 2L), "b" -> (5L, 1L), "c" -> (7L, 1L)))

    // insert a:40, d:1; retract a:10 and BOTH of c's... c only has 7 — one
    val delta = Seq(("a", 40L, 1L), ("d", 1L, 1L), ("a", 10L, -1L),
      ("c", 7L, -1L)).toDF("k", "m", "s")
    Mv.refresh(spark, path, delta, Seq("k"), Seq("m"), version = 1L,
      signCol = Some("s"))
    assert(viewOf(path) ==
      Map("a" -> (60L, 2L), "b" -> (5L, 1L), "d" -> (1L, 1L)),
      "c must vanish at count zero; a = 30+40-10")
    // time travel: the build is still intact strictly below v=1
    assert(Mv.read(spark, path, beforeExclusive = 1L).select("k")
      .as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("over-retraction fails the refresh in-plan instead of materializing " +
    "a corrupt view") {
    val path = Files.createTempDirectory("mv2").toString
    Mv.build(Seq(("a", 1L)).toDF("k", "m"), path, Seq("k"), Seq("m"))
    val bad = Seq(("a", 1L, -1L), ("a", 1L, -1L)).toDF("k", "m", "s")
    val e = intercept[Exception] {
      Mv.refresh(spark, path, bad, Seq("k"), Seq("m"), version = 1L,
        signCol = Some("s"))
    }
    def causes(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("over-retraction"))), s"unexpected failure: $e")
    // the failed refresh must not have produced a readable v=1
    assert(Mv.versions(spark, path) == Seq(0L))
  }

  test("bus-fed maintenance: a changelog topic on the log bus drives the " +
    "view end to end") {
    val root = Files.createTempDirectory("mvbus").toString
    val path = s"$root/mv"; val ckpt = s"$root/ckpt"
    // publish a signed changelog: value = "k,m,s" CSV on the wire
    def publish(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("k", "m", "s")
        .select(pmod(xxhash64(col("k")), lit(2)).cast("int").as("partition"),
          concat_ws(",", col("k"), col("m"), col("s")).cast("binary")
            .as("value"))
        .write.format(graft.sources.Bus.logBusFmt)
        .option("root", root).option("topic", "mvlog").option("partitions", "2")
        .mode("append").save()
    Mv.build(spark.emptyDataset[(String, Long)].toDF("k", "m"),
      path, Seq("k"), Seq("m"))
    def drain(): Unit = {
      val changes = spark.readStream.format(graft.sources.Bus.logBusFmt)
        .option("root", root).option("topic", "mvlog").option("partitions", "2")
        .load()
        .select(split(col("value").cast("string"), ",").as("f"))
        .select(col("f").getItem(0).as("k"),
          col("f").getItem(1).cast("long").as("m"),
          col("f").getItem(2).cast("long").as("s"))
      val q = Mv.startMaintenance(changes, path, Seq("k"), Seq("m"), ckpt,
        signCol = Some("s"))
      q.awaitTermination()
    }
    publish(Seq(("a", 10L, 1L), ("b", 3L, 1L)))
    drain()
    publish(Seq(("a", 10L, -1L), ("c", 2L, 1L)))
    drain()
    assert(viewOf(path) == Map("b" -> (3L, 1L), "c" -> (2L, 1L)),
      "the view must track the published changelog exactly")
  }

  test("streaming maintenance: multi-batch refresh equals the full " +
    "aggregate, and a forced epoch replay does not double-apply") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = Files.createTempDirectory("mv3").toString
    val ckpt = Files.createTempDirectory("mv3ckpt").toString
    Mv.build(spark.emptyDataset[(String, Long)].toDF("k", "m"),
      path, Seq("k"), Seq("m")) // empty seed, v=0
    val mem = MemoryStream[(String, Long, Long)](spark)
    def drain(): Unit = {
      val q = Mv.startMaintenance(mem.toDF().toDF("k", "m", "s"), path,
        Seq("k"), Seq("m"), ckpt, signCol = Some("s"))
      q.awaitTermination()
    }
    mem.addData(("a", 10L, 1L), ("b", 3L, 1L))
    drain()
    mem.addData(("a", 5L, 1L), ("a", 10L, -1L), ("c", 2L, 1L))
    drain()
    assert(viewOf(path) == Map("a" -> (5L, 1L), "b" -> (3L, 1L), "c" -> (2L, 1L)))

    // force a replay of the last epoch: delete the newest checkpoint
    // commit (and its .crc — local ChecksumFileSystem) and re-drain
    val commits = new File(s"$ckpt/commits")
    val last = commits.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    assert(last.delete())
    val crc = new File(commits, s".${last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    drain()
    assert(viewOf(path) == Map("a" -> (5L, 1L), "b" -> (3L, 1L), "c" -> (2L, 1L)),
      "replayed epoch must overwrite its own version, not double-apply")
  }
}
