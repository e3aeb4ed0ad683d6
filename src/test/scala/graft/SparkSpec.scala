package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM, lazy). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // lake SQL DML (LakeDmlRule) is a resolution rule — session-build only
      .config("spark.sql.extensions", "graft.spark.GraftExtensions")
      // lake ALTER TABLE / MERGE INTO / time travel need the v2 catalog
      // face (delegating: non-lake tables untouched)
      .config("spark.sql.catalog.spark_catalog",
        "graft.sources.lake.GraftLakeCatalog")
      // the CI box freezes for tens of seconds under load; with the 10s
      // defaults the local-mode executor declares the driver dead and
      // System.exit(56)s the whole suite JVM mid-run
      .config("spark.executor.heartbeatInterval", "60s")
      .config("spark.network.timeout", "600s")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Streaming query stop() interrupts the microbatch thread; the RocksDB
    // state-store maintenance task logs the (benign, expected) interrupt as
    // a multi-page ERROR trace. Real state-store failures still surface as
    // StreamingQueryExceptions, so silence the logger in tests.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.state",
      org.apache.logging.log4j.Level.OFF)
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
