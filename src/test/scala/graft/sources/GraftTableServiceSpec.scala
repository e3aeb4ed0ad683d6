package graft.sources

import graft.SparkSpec
import graft.sources.v2.GraftTableService
import org.apache.spark.sql.functions._

/**
 * S5 — the external-table-service connector: server-side projection and
 * predicate pushdown OVER THE WIRE, sliced parallel streams, and writer-
 * schema negotiation (the storage-read-API shape of a BigQuery-style
 * typed scan, minus the Google plumbing this environment can't reach).
 */
class GraftTableServiceSpec extends SparkSpec {

  private val fmt = "graft.sources.v2.GraftServiceSource"

  private def read(port: Int, slices: Int = 4) =
    spark.read.format(fmt)
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("slices", slices.toString).load()

  test("full scan: sliced parallel streams reassemble the exact table") {
    val srv = GraftTableService.serve(rows = 5000)
    try {
      val rows = read(srv.port).collect()
      assert(rows.length === 5000)
      val ids = rows.map(_.getLong(0)).sorted
      assert(ids.toSeq === (0L until 5000L))
      // content is the declared arithmetic
      rows.take(100).foreach { r =>
        assert(r.getString(1) === GraftTableService.lang(r.getLong(0)))
        assert(r.getLong(2) === GraftTableService.score(r.getLong(0)))
      }
    } finally srv.close()
  }

  test("predicate pushdown happens server-side: the range travels in the request") {
    val srv = GraftTableService.serve(rows = 100000)
    try {
      val df = read(srv.port)
        .filter(col("doc_id") >= 500L && col("doc_id") < 600L)
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters") &&
        scan.contains("GreaterThanOrEqual(doc_id,500)"),
        s"expected the range pushed:\n$scan")
      assert(df.count() === 100)
    } finally srv.close()
  }

  test("column pruning happens server-side: the wire carries only requested fields") {
    val srv = GraftTableService.serve(rows = 2000)
    try {
      val df = read(srv.port).select("lang")
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("ReadSchema: struct<lang:string>"),
        s"expected pruned read schema:\n$scan")
      val counts = df.groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.values.sum === 2000)
      assert(counts("en") === 400) // ids ≡ 0 (mod 5)
    } finally srv.close()
  }

  test("mixed filters: unsupported predicates stay residual and still apply") {
    val srv = GraftTableService.serve(rows = 10000)
    try {
      val df = read(srv.port)
        .filter(col("doc_id") < 1000L && col("lang") === "de")
      // lang isn't served-side filterable — it must remain a residual
      val scan = df.queryExecution.executedPlan.toString
      assert(scan.contains("LessThan(doc_id,1000)"), s"range pushed:\n$scan")
      val rows = df.collect()
      assert(rows.length === 200) // 1000/5 ids ≡ 1 (mod 5)
      assert(rows.forall(_.getString(1) == "de"))
    } finally srv.close()
  }

  test("typed lookup-join against the service (the reference's S5 usage)") {
    val srv = GraftTableService.serve(rows = 1000)
    try {
      import spark.implicits._
      val facts = spark.range(0, 5000)
        .select(col("id").as("k"), (col("id") % 1000).as("doc_id"))
      val dim = read(srv.port, slices = 2)
      val joined = facts.join(broadcast(dim), Seq("doc_id"))
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(joined.values.sum === 5000)
      assert(joined("en") === 1000)
    } finally srv.close()
  }
}
