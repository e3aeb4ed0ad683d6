package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Storage-partitioned join (SPJ) through
 * [[graft.sources.v2.GraftBucketedSource]]: the table reports
 * identity(bucket) partitioning with per-partition keys, so a join on the
 * bucket key plans WITHOUT exchanges when v2 bucketing is on — and the
 * spec proves causality by showing the exchanges come back when it's off.
 */
class GraftBucketedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Int, buckets: Int = 8): DataFrame =
    spark.read.format("graft.sources.v2.GraftBucketedSource")
      .option("rows", rows.toString).option("buckets", buckets.toString).load()

  private def withConfs[T](confs: (String, String)*)(f: => T): T = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("content is the declared id arithmetic") {
    val got = read(100, 4).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val want = (0L until 100L).map(i => (i, i % 4, (i * 31) % 1000))
    assert(got === want)
    // every row of bucket b lives in the partition keyed b (the layout
    // contract): per-partition distinct buckets are singletons
    val perPart = read(100, 4)
      .select(spark_partition_id().as("p"), col("bucket"))
      .distinct().groupBy("p").count().as[(Int, Long)].collect()
    assert(perPart.forall(_._2 === 1L))
  }

  test("join on the partition key plans with no exchange (SPJ); disabling brings the shuffle back") {
    val joined = withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = read(1000).join(read(600).select(col("bucket"), col("v").as("v2")),
        Seq("bucket"))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        s"SPJ must remove both exchanges:\n${j.queryExecution.executedPlan}")
      j.groupBy("bucket").count().orderBy("bucket").as[(Long, Long)].collect().toSeq
    }
    val baseline = withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = read(1000).join(read(600).select(col("bucket"), col("v").as("v2")),
        Seq("bucket"))
      assert(j.queryExecution.executedPlan.toString.contains("Exchange"))
      j.groupBy("bucket").count().orderBy("bucket").as[(Long, Long)].collect().toSeq
    }
    assert(joined === baseline)
    assert(joined.map(_._2).sum === (0 until 8).map(b =>
      (1000 / 8).toLong * (600 / 8)).sum)
  }

  test("runtime v2 filtering prunes whole buckets from a dim-side filter") {
    val dimDir = java.nio.file.Files.createTempDirectory("gbdim").toString
    spark.range(0, 8).select(col("id").as("bucket"), (col("id") % 3).as("cat"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = read(100000)
    val dim = spark.read.parquet(dimDir).filter(col("cat") === 1) // buckets 1,4,7
    graft.sources.v2.GraftBucketed.partitionsOpened.set(0)
    val j = fact.join(dim, Seq("bucket"))
    val n = j.count()
    // 100000 rows / 8 buckets = 12500 per bucket, 3 surviving buckets
    assert(n === 37500L)
    assert(graft.sources.v2.GraftBucketed.partitionsOpened.get() === 3,
      "only the dim's buckets' partitions may be opened")
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected a runtime pruning filter on the scan:\n$plan")
  }

  test("partition keys may be a subset of the join keys (bucket ⊂ {bucket, doc_id})") {
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = read(1000).join(read(600).select(col("bucket"), col("doc_id"),
        col("v").as("v2")), Seq("bucket", "doc_id"))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        s"subset-key SPJ must remove both exchanges:\n${j.queryExecution.executedPlan}")
      // bucket is functionally determined by doc_id, so the join matches
      // exactly the 600 shared ids
      assert(j.count() === 600L)
    }
  }

  test("runtime V2 filter: pruning applies ONLY when every value child is a " +
    "recognized literal — partial extraction must not drop buckets") {
    import org.apache.spark.sql.connector.expressions.{Cast, Expressions}
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    import org.apache.spark.sql.types.LongType
    val bucket = Expressions.column("bucket")
    def scan = new graft.sources.v2.GraftBucketedScan(rows = 80, buckets = 8)

    // all-literal IN → prunes to exactly those buckets
    val s1 = scan
    s1.filter(Array(new Predicate("IN", Array(bucket,
      Expressions.literal(1L), Expressions.literal(3L)))))
    assert(s1.planInputPartitions().length == 2)

    // mixed literal / cast-wrapped value → unrecognized, NO pruning
    // (a too-small allowed set would silently drop bucket 5's rows)
    val s2 = scan
    s2.filter(Array(new Predicate("IN", Array(bucket,
      Expressions.literal(1L),
      new Cast(Expressions.literal(5L), LongType)))))
    assert(s2.planInputPartitions().length == 8)

    // non-integral literal → unrecognized, no pruning, no crash
    val s3 = scan
    s3.filter(Array(new Predicate("=", Array(bucket,
      Expressions.literal(org.apache.spark.unsafe.types.UTF8String.fromString("2"))))))
    assert(s3.planInputPartitions().length == 8)

    // '=' with a plain literal still prunes to one bucket
    val s4 = scan
    s4.filter(Array(new Predicate("=", Array(bucket, Expressions.literal(2L)))))
    assert(s4.planInputPartitions().length == 1)
  }
}
