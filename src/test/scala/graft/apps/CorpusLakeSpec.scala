package graft.apps

import graft.SparkSpec
import graft.TestSpark.sf0001
import graft.ops.Dedup
import graft.sources.Tables
import graft.sources.lake.GraftLake
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The continuous-crawl corpus store: prepared documents live in a
 * [[GraftLake]] table, and each crawl epoch is admitted by incremental
 * near-dup against the CURRENT corpus (Dedup.incrementalNearDupPairs) and
 * appended under the lake's exactly-once epoch fence. This is the
 * composition a training-data platform runs forever — crawl in, dedup
 * against everything so far, transactionally grow the corpus — with
 * every piece (admission recall, crash-replay idempotence, time-travel
 * auditability) provided by operators that are individually gated.
 */
class CorpusLakeSpec extends SparkSpec {

  import spark.implicits._

  private def corpusCols(df: DataFrame): DataFrame =
    df.select(col("doc_id").cast("long").as("doc_id"), col("text"),
      col("source"))

  test("crawl epochs: near-dup-screened admission into an exactly-once lake") {
    val tbl = java.nio.file.Files.createTempDirectory("graft_corpus_lake").toString + "/c"
    val docs = corpusCols(Tables.documents(spark, sf0001)).cache()
    val corpus0 = docs.filter(col("doc_id") % 3 =!= 0)
    GraftLake.create(corpus0, tbl, numFiles = 4)
    val n0 = GraftLake.read(spark, tbl).count()

    // crawl batch: novel docs + exact re-crawls of corpus content under
    // NEW ids (the web re-serving pages it already served)
    val novel = docs.filter(col("doc_id") % 3 === 0)
    val recrawled = corpus0.limit(10)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"), col("source"))
    val crawl = novel.unionByName(recrawled)

    def admit(batch: DataFrame, epoch: Long): Unit = {
      val corpus = GraftLake.read(spark, tbl)
      val dupIds = Dedup.incrementalNearDupPairs(batch, corpus,
        "doc_id", "text", threshold = 0.8).select(col("doc_a").as("doc_id")).distinct()
      val admitted = batch.join(dupIds, Seq("doc_id"), "left_anti")
      GraftLake.appendStreamBatch(admitted, tbl, "crawl", epoch, numFiles = 2)
      ()
    }

    admit(crawl, epoch = 0L)
    val after = GraftLake.read(spark, tbl)
    val admitted1 = after.count() - n0
    // the testdata plants real near-dups across the %3 split, so SOME
    // novel-id docs legitimately screen out; what is guaranteed: every
    // identical re-crawl dies (MinHash recall 1 on equal text) and the
    // non-duplicated majority lands
    assert(after.filter(col("doc_id") >= 1000000L).count() == 0,
      "every re-crawled duplicate was screened out")
    assert(admitted1 > 0 && admitted1 <= novel.count(),
      s"admitted $admitted1 of ${novel.count()} crawl docs")

    // driver crash → the whole epoch replays: admission recomputes, the
    // lake's epoch fence makes the append a no-op
    admit(crawl, epoch = 0L)
    assert(GraftLake.read(spark, tbl).count() == n0 + admitted1,
      "replayed crawl epoch must not grow the corpus")

    // a later epoch of genuinely-new docs lands exactly once, and time
    // travel audits corpus growth version by version
    val later = docs.limit(5).select((col("doc_id") + 2000000L).as("doc_id"),
      concat(lit("entirely new content v"), col("doc_id"),
        lit(" with no shingle overlap whatsoever in this text")).as("text"),
      col("source"))
    admit(later, epoch = 1L)
    assert(GraftLake.read(spark, tbl).count() == n0 + admitted1 + 5)
    assert(GraftLake.read(spark, tbl, asOf = Some(0L)).count() == n0,
      "version 0 still reads as the original corpus")
    docs.unpersist()
  }
}
