package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraftDocsSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fmt = "graft.sources.v2.GraftDocsSource"

  private def docs(rows: Long) =
    spark.read.format(fmt).option("rows", rows.toString).load()

  test("full read: deterministic content, all slices covered") {
    val got = docs(1000).as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.length == 1000)
    assert(got.map(_._1).toSeq == (0L until 1000L))
    got.foreach { case (id, lang, text) =>
      assert(lang == graft.sources.v2.GraftDocs.lang(id))
      assert(text == graft.sources.v2.GraftDocs.text(id))
    }
  }

  test("doc_id range filters are pushed into the generated range") {
    val q = docs(100000).filter($"doc_id" >= 500 && $"doc_id" < 520)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[500,519]"),
      s"filters not pushed into the scan:\n$plan")
    assert(q.count() == 20)
    // equality pushes to a single-row range
    val one = docs(100000).filter($"doc_id" === 777L)
    assert(one.queryExecution.executedPlan.toString.contains("range=[777,777]"))
    assert(one.select("lang").as[String].collect().toSeq ==
      Seq(graft.sources.v2.GraftDocs.lang(777)))
  }

  test("column pruning reaches the reader; residual filters still apply") {
    val q = docs(10000).filter($"doc_id" < 100 && $"lang" === "en")
      .select("doc_id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("range=[0,99]"))
    // lang filter is residual but the scan only materializes needed cols
    assert(plan.contains("cols=doc_id") || plan.contains("cols=lang,doc_id")
      || plan.contains("cols=doc_id,lang"), s"no pruning evidence:\n$plan")
    assert(q.count() == (0 until 100).count(i => i % 5 == 0))
  }

  test("count(*) pushes down completely: no row generation, range arithmetic") {
    val q = docs(5000000).filter($"doc_id" >= 10 && $"doc_id" <= 4000000)
      .agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftDocsCountScan range=[10,4000000]"),
      s"count(*) was not pushed into the source:\n$plan")
    assert(q.collect()(0).getLong(0) == 3999991L)
    // grouped counts must NOT push (the source only supports global)
    val g = docs(1000).groupBy($"lang").agg(count(lit(1)))
    assert(!g.queryExecution.executedPlan.toString.contains("CountScan"))
    assert(g.count() == 5)
  }

  test("min/max(doc_id) push down completely alongside count(*)") {
    val q = docs(5000000).filter($"doc_id" >= 10 && $"doc_id" <= 4000000)
      .agg(count(lit(1)).as("n"), min($"doc_id").as("lo"), max($"doc_id").as("hi"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftDocsCountScan"),
      s"min/max/count were not pushed into the source:\n$plan")
    val r = q.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((3999991L, 10L, 4000000L)))
    // min over a NON-range-answerable column must not push
    val m = docs(1000).agg(min($"lang"))
    assert(!m.queryExecution.executedPlan.toString.contains("CountScan"))
    assert(m.collect()(0).getString(0) == "de")
  }

  test("post-pushdown statistics let Catalyst broadcast a filtered slice") {
    // a 50-row slice of a 10M-row source: with accurate post-pushdown
    // stats the join side is broadcast, not shuffled
    val dim = docs(10000000).filter($"doc_id" >= 100 && $"doc_id" < 150)
    val fact = spark.range(0, 50000).toDF("doc_id")
    val joined = fact.join(dim, "doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast:\n$plan")
    assert(joined.count() == 50)
  }

  test("empty range after contradictory pushdown yields zero partitions") {
    val q = docs(1000).filter($"doc_id" > 10 && $"doc_id" < 5)
    assert(q.count() == 0)
  }

  test("micro-batch stream: admission control paces batches, content exact") {
    val ckpt = java.nio.file.Files.createTempDirectory("docs_stream_ck").toString
    val q = spark.readStream.format(fmt)
      .option("rows", "100").option("rowsPerBatch", "40").load()
      .writeStream.format("memory").queryName("docs_stream")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not finish")
    val got = spark.table("docs_stream").as[(Long, String, String)]
      .collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (0L until 100L))
    got.foreach { case (id, lang, text) =>
      assert(lang == graft.sources.v2.GraftDocs.lang(id) &&
        text == graft.sources.v2.GraftDocs.text(id))
    }
    // 100 rows at 40/trigger = 3 data batches (40, 40, 20)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0).toSeq
    assert(sizes == Seq(40L, 40L, 20L), s"batch sizes: $sizes")
  }

  test("micro-batch stream restart resumes from the checkpointed offset") {
    // run 1 drains a 25-row source; run 2 restarts on the same checkpoint
    // after the source "grew" to 60 rows — it must resume at id 25, not 0
    val ckpt = java.nio.file.Files.createTempDirectory("docs_restart_ck").toString
    val out = java.nio.file.Files.createTempDirectory("docs_restart_out").toString
    def run(rows: Int): Unit = {
      val q = spark.readStream.format(fmt)
        .option("rows", rows.toString).option("rowsPerBatch", "25").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000), "stream did not finish")
    }
    run(25)
    assert(spark.read.parquet(out).count() == 25)
    run(60)
    // resumed at 25: full coverage, no re-emission of 0..24
    val got = spark.read.parquet(out).select("doc_id").as[Long]
      .collect().sorted.toSeq
    assert(got == (0L until 60L), s"resumed wrong: $got")
  }
}
