package graft.spark

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FooterCountStrategySpec extends SparkSpec {
  import spark.implicits._

  private def withStrategy[A](f: => A): A = {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      prev.filterNot(_ == FooterCountStrategy) :+ FooterCountStrategy
    spark.conf.set("spark.graft.footerCount.enabled", "true")
    try f finally {
      spark.conf.unset("spark.graft.footerCount.enabled")
      spark.experimental.extraStrategies = prev
    }
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("footer_count").toString
    (0L until 12345L).toDF("v").repartition(6)
      .write.mode("overwrite").parquet(d)
    d
  }

  test("bare count(*) over parquet plans as FooterCount, exact answer") {
    withStrategy {
      val agg = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("FooterCount"), s"strategy did not fire:\n$plan")
      assert(agg.collect()(0).getLong(0) == 12345L)
      // the Dataset.count() surface goes through the same logical shape
      assert(spark.read.parquet(dir).count() == 12345L)
    }
  }

  test("conf off: normal scan-based plan, same answer") {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies =
      prev.filterNot(_ == FooterCountStrategy) :+ FooterCountStrategy
    try {
      val agg = spark.read.parquet(dir).agg(count(lit(1)).as("n"))
      assert(!agg.queryExecution.executedPlan.toString.contains("FooterCount"))
      assert(agg.collect()(0).getLong(0) == 12345L)
    } finally spark.experimental.extraStrategies = prev
  }

  test("any filter declines the rewrite and still answers correctly") {
    withStrategy {
      val agg = spark.read.parquet(dir).filter($"v" % 2 === 0)
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("FooterCount"),
        s"must not footer-count a filtered scan:\n$plan")
      assert(agg.collect()(0).getLong(0) == 6173L)
    }
  }

  test("grouping, distinct, and non-parquet sources decline") {
    withStrategy {
      val grouped = spark.read.parquet(dir).groupBy($"v" % 3).count()
      assert(!grouped.queryExecution.executedPlan.toString.contains("FooterCount"))
      val dist = spark.read.parquet(dir)
        .agg(countDistinct($"v").as("n"))
      assert(!dist.queryExecution.executedPlan.toString.contains("FooterCount"))
      assert(dist.collect()(0).getLong(0) == 12345L)
      val csvDir = java.nio.file.Files.createTempDirectory("footer_csv").toString
      (0 until 10).toDF("v").write.mode("overwrite").csv(csvDir)
      val csvCnt = spark.read.csv(csvDir).agg(count(lit(1)).as("n"))
      assert(!csvCnt.queryExecution.executedPlan.toString.contains("FooterCount"))
      assert(csvCnt.collect()(0).getLong(0) == 10L)
    }
  }
}
