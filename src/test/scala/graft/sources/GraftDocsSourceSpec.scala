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

  test("empty range after contradictory pushdown yields zero partitions") {
    val q = docs(1000).filter($"doc_id" > 10 && $"doc_id" < 5)
    assert(q.count() == 0)
  }
}
