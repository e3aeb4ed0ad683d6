package graft.sources.lake

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Serializability of [[GraftLake.mergeInto]] under concurrency: two
 * general merges (update / delete on DISJOINT key classes) race an
 * append. Each loser of the commit fence recomputes its victims AND its
 * rewrite from the winner's snapshot (retryRewrite), so regardless of
 * commit order the outcome must equal the serial application of all
 * three effects — no lost rows, no duplicates, no resurrecting what a
 * racing delete removed.
 */
class LakeConcurrentMergeSpec extends SparkSpec {

  import spark.implicits._

  test("two mergeIntos and an append race; the outcome is the serial one") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lake_cmerge").toString + "/t"
    val base = (0 until 400).map(i => (i.toLong, "base", i.toLong))
      .toDF("id", "tag", "v")
    GraftLake.create(base.repartitionByRange(8, col("id")), dir,
      checkpointEvery = 3)

    // effect sets are disjoint by key class mod 10: updater hits 1s,
    // deleter hits 2s, the append lands fresh ids ≡ 3 (mod 10) above 400
    val updSrc = (0 until 400).filter(_ % 10 == 1)
      .map(i => (i.toLong, "upd", i.toLong)).toDF("id", "tag", "v")
    val delSrc = (0 until 400).filter(_ % 10 == 2)
      .map(i => (i.toLong, "del", i.toLong)).toDF("id", "tag", "v")
    val appended = (0 until 50).map(k => (403L + k * 10, "new", 0L))
    val appDf = appended.toDF("id", "tag", "v")

    val pool = Executors.newFixedThreadPool(3)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = Seq(
        Future(GraftLake.mergeInto(spark, dir, updSrc,
          col("t.id") === col("s.id"),
          matched = Seq(GraftLake.MatchedUpdate(None,
            Seq("v" -> (col("t.v") + 100000L), "tag" -> lit("upd")))),
          notMatched = Nil)),
        Future(GraftLake.mergeInto(spark, dir, delSrc,
          col("t.id") === col("s.id"),
          matched = Seq(GraftLake.MatchedDelete(None)),
          notMatched = Nil)),
        Future(GraftLake.append(appDf, dir, numFiles = 2)))
      val versions = Await.result(Future.sequence(fs), 300.seconds)
      assert(versions.toSet == Set(1L, 2L, 3L),
        s"each op must win a distinct contiguous version, got $versions")
    } finally pool.shutdown()

    val got = GraftLake.read(spark, dir)
      .select("id", "tag", "v").as[(Long, String, Long)].collect().toSet
    val expected =
      (0 until 400).filter(_ % 10 != 2).map { i =>
        if (i % 10 == 1) (i.toLong, "upd", i.toLong + 100000L)
        else (i.toLong, "base", i.toLong)
      }.toSet ++ appended.toSet
    assert(got == expected,
      "concurrent merges + append must serialize to the combined effect")
    // every version in between still time-travels consistently: row
    // counts are monotone under the three ops' possible serial orders
    (0L to 3L).foreach { v =>
      val n = GraftLake.read(spark, dir, asOf = Some(v)).count()
      assert(n >= 360 && n <= 450, s"v$v row count $n out of any serial range")
    }
  }
}
