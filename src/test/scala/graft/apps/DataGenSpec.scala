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

  test("mockRecords hotFrac: exactly ONE idempotent key carries the hot share") {
    val recs = DataGen.mockRecords(spark, 5000L, hotFrac = 0.2).collect().toSeq
    assert(recs.size == 5000 && recs.forall(_.isValid))
    // U13 key shape holds for hot rows too
    assert(recs.forall(_.event.transactionId.exists(t =>
      t.length == 26 && (t.startsWith("E2") || t.startsWith("23")))))
    val byKey = recs.groupBy(_.idempotentKey).view.mapValues(_.size)
    val (hotKey, hotN) = byKey.maxBy(_._2)
    assert(hotN == 1000, s"hot key should hold exactly 20%, got $hotN")
    assert(hotKey == "E2f0f0f0f0f0f0f0f0f0f0f0f0-7")
    // and the runner-up is a genuine singleton (no accidental second cluster)
    assert(byKey.filter(_._1 != hotKey).values.max <= 2)
  }

  test("skewedDocuments: deterministic, ~hotFrac viral copies, shingle-able texts") {
    import org.apache.spark.sql.functions._
    val a = DataGen.skewedDocuments(spark, 5000L, hotFrac = 0.2)
    assert(a.count() == 5000L)
    // hot cluster ≈ 20% (binomial tolerance), and it is ONE exact text
    val byText = a.groupBy("text").count()
    val hot = byText.agg(max("count")).collect()(0).getLong(0)
    assert(hot > 800 && hot < 1200, s"hot cluster size $hot")
    // deterministic: same seed-free plan → byte-identical corpus
    val b = DataGen.skewedDocuments(spark, 5000L, hotFrac = 0.2)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // uniform control has no meaningful cluster
    val u = DataGen.uniformDocuments(spark, 5000L)
    assert(u.groupBy("text").count().agg(max("count")).collect()(0).getLong(0) <= 2)
    // texts long enough to 5-gram shingle
    assert(a.filter(length(col("text")) < 20).count() == 0)
  }
}
