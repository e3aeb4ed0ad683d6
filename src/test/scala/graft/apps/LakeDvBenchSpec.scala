package graft.apps

import graft.SparkSpec

/** Pins the deletion-vector design argument as an executable figure: a
  * merge-on-read point delete writes a sidecar of tens of bytes while
  * copy-on-write rewrites the whole victim file — ≥100× amplification
  * even at this spec's deliberately small file size (25k rows/file; at a
  * healthy 128 MB file target the measured gap is ~10⁶×, see
  * [[LakeDvBench]]'s committed run in SURVEY.md). */
class LakeDvBenchSpec extends SparkSpec {

  test("CoW point delete writes >=100x more bytes than MoR at 25k-row files") {
    val (cow, mor, _, _) = LakeDvBench.run(spark, n = 100000L, files = 4, k = 4)
    assert(mor.mean > 0, "MoR must write a sidecar")
    assert(cow.mean >= 100 * mor.mean,
      s"amplification collapsed: cow=${cow.mean} mor=${mor.mean}")
  }
}
