package graft.apps

import graft.SparkSpec

/** Throughput floor for the bus→lake ingestion path (the continuous
  * corpus store's steady state): the drain must clear the reference's
  * 3,333/s anchor even on the 4-core test session — the commit protocol
  * (stage, footer stats, fenced link) must not be the bottleneck. The
  * committed local[32] figure lives in README (LakeIngestBench main). */
class LakeIngestThroughputSpec extends SparkSpec {

  test("bus -> exactly-once lake append sustains the 3,333/s baseline") {
    val n = 100000L
    val (rows, secs, rate) = LakeIngestBench.run(spark, n)
    info(f"lake ingest: $rate%.0f records/s over $n records ($secs%.1f s)")
    assert(rows == n, s"every published record must land exactly once, got $rows")
    assert(rate >= 3333.0,
      f"only $rate%.0f records/s through the lake commit protocol")
  }
}
