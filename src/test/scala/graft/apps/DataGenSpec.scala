package graft.apps

import graft.SparkSpec

class DataGenSpec extends SparkSpec {

  test("mockRecords: N valid records with randomized unique-ish keys") {
    val recs = DataGen.mockRecords(spark, 500L).collect().toSeq
    assert(recs.size == 500)
    assert(recs.forall(_.isValid))
    // randomized transactionIds: prefix family + 24 hex (U13 contract)
    assert(recs.forall(_.event.transactionId.exists(t =>
      t.length == 26 && (t.startsWith("E2") || t.startsWith("23")))))
    val keys = recs.map(_.idempotentKey).toSet
    assert(keys.size > 490) // collisions vanishingly unlikely
    assert(recs.forall(_.event.nhubTimestamp.exists(_ > 0L)))
  }
}
