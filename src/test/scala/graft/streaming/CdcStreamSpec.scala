package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/**
 * Multi-batch invariants for streaming CDC snapshot maintenance: latest
 * state correctness across batches, bucket-pruned rewrites (untouched
 * buckets are NOT rewritten), no resurrection after a bucket is deleted
 * down to empty, and time-travel reads.
 */
class CdcStreamSpec extends SparkSpec {
  import spark.implicits._

  // nBuckets = 4: key k lands in bucket pmod(xxhash64(k), 4)
  private val cfg = CdcStream.Config(Seq("id"), Seq("seq"), nBuckets = 4)

  private def snap(dir: String): Map[Long, (String, Long)] =
    CdcStream.snapshot(spark, dir).get.collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  private def bucketsIn(dir: String, v: Long): Set[String] = {
    val f = new java.io.File(s"$dir/v=$v")
    Option(f.listFiles()).toSeq.flatten.map(_.getName)
      .filter(_.startsWith("__bucket=")).toSet
  }

  private def changes(rows: (Long, Long, String, String, Long)*): DataFrame =
    rows.toDF("id", "seq", "op", "name", "balance")

  test("streaming apply: upserts, deletes, latest-wins across batches; " +
      "only changed buckets rewritten; no resurrection from stale versions") {
    val root = Files.createTempDirectory("cdc_stream").toString
    val (in, snapDir, ckpt) = (s"$root/in", s"$root/snap", s"$root/ckpt")

    CdcStream.seed(Seq((1L, "alice", 100L), (2L, "bob", 200L),
      (3L, "carol", 300L)).toDF("id", "name", "balance"), snapDir, cfg)
    assert(snap(snapDir) == Map(1L -> ("alice", 100L), 2L -> ("bob", 200L),
      3L -> ("carol", 300L)))
    val seedBuckets = bucketsIn(snapDir, -1L)

    val schema = changes((0L, 0L, "", "", 0L)).schema
    // batch 0: update key 1, insert key 4 (same batch carries a stale
    // seq-1 update for key 1 that must lose)
    changes((1L, 1L, "U", "alice-stale", 101L), (1L, 2L, "U", "alice2", 150L),
      (4L, 1L, "I", "dave", 400L))
      .write.mode("append").parquet(in)

    val q = CdcStream.start(spark, in, snapDir, ckpt, schema, cfg)
    try {
      q.processAllAvailable()
      assert(snap(snapDir) == Map(1L -> ("alice2", 150L), 2L -> ("bob", 200L),
        3L -> ("carol", 300L), 4L -> ("dave", 400L)))
      // bucket pruning: v=0 holds only the buckets of keys {1, 4}
      val changed0 = bucketsIn(snapDir, 0L)
      assert(changed0.nonEmpty && changed0.size < cfg.nBuckets,
        s"expected a strict subset of buckets rewritten, got $changed0")

      // batch 1: delete keys 2 and 4, update 3
      changes((2L, 3L, "D", "", 0L), (4L, 3L, "D", "", 0L),
        (3L, 3L, "U", "carol2", 301L))
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      assert(snap(snapDir) == Map(1L -> ("alice2", 150L),
        3L -> ("carol2", 301L)))

      // time travel: before batch 1 the deleted keys are still visible
      val before1 = CdcStream.snapshot(spark, snapDir, beforeVersion = 1L)
        .get.collect().map(_.getLong(0)).toSet
      assert(before1 == Set(1L, 2L, 3L, 4L))
    } finally q.stop()

    // seed layout untouched by later versions
    assert(bucketsIn(snapDir, -1L) == seedBuckets)
  }

  test("a bucket deleted down to empty leaves a marker and does not " +
      "resurrect stale rows (batch-context applyBatch)") {
    val root = Files.createTempDirectory("cdc_empty").toString
    val dir = s"$root/snap"
    // single bucket: everything collides, so deleting the only key
    // empties the rewritten bucket
    val one = CdcStream.Config(Seq("id"), Seq("seq"), nBuckets = 1)
    CdcStream.seed(Seq((7L, "gina", 700L)).toDF("id", "name", "balance"),
      dir, one)
    CdcStream.applyBatch(changes((7L, 1L, "D", "", 0L)), 0L, dir, one)
    // bucket 0's newest version is the EMPTY v=0 — key 7 must not come back
    assert(CdcStream.snapshot(spark, dir).forall(_.isEmpty))
    // and an insert after the empty version works on top of it
    CdcStream.applyBatch(changes((8L, 1L, "I", "hana", 800L)), 1L, dir, one)
    assert(snap(dir) == Map(8L -> ("hana", 800L)))
  }

  test("replayed batch id overwrites its own output and reads only below " +
      "itself (idempotent retry)") {
    val root = Files.createTempDirectory("cdc_replay").toString
    val dir = s"$root/snap"
    CdcStream.seed(Seq((1L, "alice", 100L)).toDF("id", "name", "balance"),
      dir, cfg)
    val batch = changes((1L, 1L, "U", "alice2", 150L), (2L, 1L, "I", "bob", 200L))
    CdcStream.applyBatch(batch, 0L, dir, cfg)
    val first = snap(dir)
    CdcStream.applyBatch(batch, 0L, dir, cfg) // replay of the same epoch
    assert(snap(dir) == first)
    assert(first == Map(1L -> ("alice2", 150L), 2L -> ("bob", 200L)))
  }

  test("stop and restart from checkpoint: later drops apply exactly once, " +
      "earlier batches are not re-applied") {
    val root = Files.createTempDirectory("cdc_restart").toString
    val (in, snapDir, ckpt) = (s"$root/in", s"$root/snap", s"$root/ckpt")
    CdcStream.seed(Seq((1L, "alice", 100L)).toDF("id", "name", "balance"),
      snapDir, cfg)
    val schema = changes((0L, 0L, "", "", 0L)).schema

    changes((1L, 1L, "U", "alice2", 150L)).write.mode("append").parquet(in)
    val q1 = CdcStream.start(spark, in, snapDir, ckpt, schema, cfg)
    try q1.processAllAvailable() finally q1.stop()
    assert(snap(snapDir) == Map(1L -> ("alice2", 150L)))

    // files land while no query is running; a NEW query on the SAME
    // checkpoint picks them up without re-applying batch 0
    changes((2L, 2L, "I", "bob", 200L), (1L, 2L, "U", "alice3", 175L))
      .write.mode("append").parquet(in)
    val q2 = CdcStream.start(spark, in, snapDir, ckpt, schema, cfg)
    try q2.processAllAvailable() finally q2.stop()
    assert(snap(snapDir) == Map(1L -> ("alice3", 175L), 2L -> ("bob", 200L)))
    // versions: seed -1, batch 0, batch 1 — restart did not renumber or
    // duplicate epochs
    assert(bucketsIn(snapDir, 0L).nonEmpty && bucketsIn(snapDir, 1L).nonEmpty)
    assert(bucketsIn(snapDir, 2L).isEmpty)
  }

  test("compact folds live buckets into one version with identical contents") {
    val root = Files.createTempDirectory("cdc_compact").toString
    val dir = s"$root/snap"
    CdcStream.seed(Seq((1L, "alice", 100L), (2L, "bob", 200L))
      .toDF("id", "name", "balance"), dir, cfg)
    CdcStream.applyBatch(changes((1L, 1L, "U", "alice2", 150L)), 0L, dir, cfg)
    CdcStream.applyBatch(changes((2L, 2L, "D", "", 0L)), 1L, dir, cfg)
    val before = snap(dir)
    CdcStream.compact(spark, dir, cfg)
    assert(snap(dir) == before)
    assert(before == Map(1L -> ("alice2", 150L)))
  }
}
