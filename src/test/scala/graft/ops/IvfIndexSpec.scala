package graft.ops

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val em = Tables.embeddings(spark, graft.TestSpark.sf0001)
  private lazy val queries = em.filter(col("vec_id") % 100 === 0)

  private def results(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("probe is bit-identical to the in-memory ivfTopK at the same dials, " +
    "and exact when probing every cell") {
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString
    IvfIndex.build(em, path, nCentroids = 8)
    val persisted = results(IvfIndex.probe(spark, path, queries, k = 5, nProbe = 3))
    val memory = results(Similarity.ivfTopK(em, queries, k = 5,
      nCentroids = 8, nProbe = 3))
    assert(persisted == memory,
      "the persisted index must reproduce the in-memory path exactly " +
        "(same deterministic trainer, same assignment/probe expressions)")
    // degenerate dial: probing all cells = the exact search
    val all = results(IvfIndex.probe(spark, path, queries, k = 5, nProbe = 8))
    val exact = results(Similarity.bruteForceTopK(em, queries, k = 5))
    assert(all == exact)
  }

  test("append: new vectors join their cells without retraining; probe " +
    "equals a same-model rebuild of the cells over the union") {
    val old = em.filter(col("vec_id") % 3 =!= 0)
    val fresh = em.filter(col("vec_id") % 3 === 0)
    val path = java.nio.file.Files.createTempDirectory("ivfidx3").toString
    IvfIndex.build(old, path, nCentroids = 8)
    val modelBefore = IvfIndex.loadModel(spark, path)
    IvfIndex.append(fresh, path)
    assert(IvfIndex.loadModel(spark, path) == modelBefore,
      "append must not touch the quantizer")
    val appended = results(IvfIndex.probe(spark, path, queries, k = 5, nProbe = 3))
    // reference: same model (trainer is deterministic on `old`), cells
    // rebuilt in one shot from the UNION — assignment is a pure function
    // of (vector, model), so the two layouts must probe identically
    val path2 = java.nio.file.Files.createTempDirectory("ivfidx4").toString
    IvfIndex.build(old, path2, nCentroids = 8)
    graft.sources.Layout.writePartitioned(
      em.select(col("vec_id"), col("embedding")).withColumn("centroid_id",
        Similarity.nearestCentroid(col("embedding"), modelBefore)),
      s"$path2/cells", Seq("centroid_id"))
    val rebuilt = results(IvfIndex.probe(spark, path2, queries, k = 5, nProbe = 3))
    assert(appended == rebuilt)
    // census covers the union
    val total = IvfIndex.cellStats(spark, path)
      .agg(sum("n_vectors")).collect()(0).getLong(0)
    assert(total == em.count())
  }

  test("streaming serving: per-batch probes equal the batch probe, " +
    "epoch-keyed sink") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = java.nio.file.Files.createTempDirectory("ivfserve").toString
    val out = java.nio.file.Files.createTempDirectory("ivfout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ivfckpt").toString
    IvfIndex.build(em, path, nCentroids = 8)
    val qvecs = queries.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().toSeq
    val (q1, q2) = qvecs.splitAt(qvecs.size / 2)
    val mem = MemoryStream[(Long, Seq[Float])](spark)
    def drain(): Unit = {
      val q = IvfIndex.startServing(
        mem.toDF().toDF("vec_id", "embedding"), path, k = 5, nProbe = 3,
        out, ckpt)
      q.awaitTermination()
    }
    mem.addData(q1: _*); drain()
    mem.addData(q2: _*); drain()
    val served = spark.read.parquet(out)
      .select("query_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val batch = results(IvfIndex.probe(spark, path, queries, k = 5, nProbe = 3))
    assert(served == batch,
      "streamed per-batch probes must union to the one-shot batch probe")
  }

  test("probing prunes partitions: the cells scan plans only the probed " +
    "directories") {
    val path = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    IvfIndex.build(em, path, nCentroids = 8)
    // one query, one probed cell -> at most 1 of 8 partition dirs scanned
    val oneQuery = queries.limit(1)
    val probed = IvfIndex.probe(spark, path, oneQuery, k = 5, nProbe = 1)
    probed.collect() // execute so scan metrics fill
    // the probe plan has exchanges, so AQE wraps it — unwrap to the final
    // physical plan before hunting for the cells scan
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan) // materialized stages are leaves; the subtree is inside
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(probed.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("cells")))
      .getOrElse(fail("no cells FileSourceScan in plan"))
    assert(scan.partitionFilters.nonEmpty,
      s"static partition filter missing: ${scan.partitionFilters}")
    // writePartitioned emits one file per partition dir; nProbe=1 with one
    // query must read exactly one
    assert(scan.metrics("numFiles").value == 1L,
      s"pruning read ${scan.metrics("numFiles").value} files of 8 cells")
  }
}
