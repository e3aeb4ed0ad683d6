package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.AnalysisException

/** SQL addressability of the DSv2 connector tables through
  * [[graft.sources.v2.GraftCatalog]] — and that the tables keep their
  * reported partitioning on the SQL path (SPJ with no join exchange). */
class GraftCatalogSpec extends SparkSpec {

  private def withCatalog[T](f: => T): T = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.v2.GraftCatalog")
    f
  }

  test("catalog tables resolve by name and match the TableProvider path") {
    withCatalog {
      val viaSql = spark.sql(
        "SELECT lang, count(*) AS n FROM graft.docs_5000 GROUP BY lang ORDER BY lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val viaProvider = spark.read.format("graft.sources.v2.GraftDocsSource")
        .option("rows", "5000").load()
        .groupBy("lang").count().orderBy("lang")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(viaSql === viaProvider)
      assert(viaSql.map(_._2).sum === 5000L)
    }
  }

  test("storage-partitioned join works through SQL (no join exchange)") {
    withCatalog {
      val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = spark.sql(
          """SELECT a.bucket, count(*) AS n
            |FROM graft.bucketed_20000_8 a JOIN graft.bucketed_12000_8 b
            |  ON a.bucket = b.bucket
            |GROUP BY a.bucket ORDER BY a.bucket""".stripMargin)
        val rows = j.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        // 2500 × 1500 pairs per bucket
        assert(rows === (0L until 8L).map(b => (b, 3750000L)))
        // the only exchange is the final ORDER BY's range partitioning —
        // neither the join nor the aggregation repartitions
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"SQL-path SPJ must not hash-repartition:\n$plan")
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        saved match {
          case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
          case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
        }
      }
    }
  }

  test("unknown tables and DDL decline loudly") {
    withCatalog {
      intercept[AnalysisException] {
        spark.sql("SELECT * FROM graft.nope").collect()
      }
      intercept[Exception] {
        spark.sql("DROP TABLE graft.docs_5000")
      }
      val listed = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
      assert(listed.contains("docs_1000"))
    }
  }
}
