package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LookupSpec extends SparkSpec {

  test("strict mode crashes on duplicate build keys (J1 contract, " +
    "MediationServiceSpec:156-173)") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val stream = Seq((1L, "x")).toDF("k", "s")
    val joined = Lookup.enrichLookup(stream, dup, "k", strictUnique = true)
    // The guard is lazy (in-plan raise_error, no extra driver action); it
    // must survive optimization — the executed plan still carries the
    // raise_error conditional.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("raise_error") ||
      plan.toLowerCase.contains("raiseerror"),
      s"uniqueness guard was optimized away:\n$plan")
    // The crash fires at execution, during the broadcast build of the same
    // job — intercept the runtime error and check the contract message
    // anywhere in the cause chain (Spark may wrap it in SparkException).
    val e = intercept[Throwable] { joined.count() }
    val messages = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("Duplicate key"),
      s"expected duplicate-key contract error, got:\n$messages")
  }

  test("strict mode passes through when build keys are unique (J1)") {
    import spark.implicits._
    val uniq = Seq((1L, "a"), (2L, "c")).toDF("k", "v")
    val stream = Seq((1L, "x"), (3L, "y")).toDF("k", "s")
    val out = Lookup.enrichLookup(stream, uniq, "k",
      defaults = Map("v" -> lit("none")), strictUnique = true)
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(out.toSeq == Seq((1L, "a"), (3L, "none")))
  }

  test("non-strict broadcast join multiplies on duplicate keys (Spark semantics)") {
    import spark.implicits._
    val dup = Seq((1L, "a"), (1L, "b")).toDF("k", "v")
    val stream = Seq((1L, "x")).toDF("k", "s")
    assert(Lookup.enrichLookup(stream, dup, "k").count() == 2)
  }

  test("enrichLookup: missing keys get defaults (J2, MinimalPubSubBQLookup:39-45)") {
    import spark.implicits._
    val lookup = Seq((1L, "alice")).toDF("k", "name")
    val stream = Seq(1L, 2L).toDF("k")
    val out = Lookup.enrichLookup(stream, lookup, "k", Map("name" -> lit("")))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "alice"), (2L, "")))
  }

  test("semiAntiSplit partitions fresh into novel + duplicated (D2)") {
    import spark.implicits._
    val fresh = Seq(1L, 2L, 3L, 4L).toDF("k")
    val hist = Seq(2L, 4L).toDF("k")
    val (novel, dups) = Lookup.semiAntiSplit(fresh, hist, "k")
    assert(novel.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    assert(dups.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
  }

  test("bloomSemiAntiSplit matches the exact split (no false negatives by " +
    "construction, fp only widens the pruned set)") {
    import spark.implicits._
    val fresh = (0L until 1000L).toDF("k")
    // historical with duplicate rows per key, overlapping fresh on 500..999
    val hist = ((500L until 1500L) ++ (500L until 1500L)).toDF("k")
    val (novel, dups) = Lookup.bloomSemiAntiSplit(fresh, hist, "k",
      expectedFreshKeys = 1000L)
    assert(novel.collect().map(_.getLong(0)).sorted.toSeq == (0L until 500L))
    assert(dups.collect().map(_.getLong(0)).sorted.toSeq == (500L until 1000L))
  }

  test("bloomPruneKeys shrinks a huge historical side to ~the fresh keys " +
    "and keeps every true intersection key") {
    import spark.implicits._
    val fresh = (0L until 100L).toDF("k")
    val hist = (0L until 10000L).toDF("k")
    val pruned = Lookup.bloomPruneKeys(fresh, hist, "k",
      expectedFreshKeys = 100L, fpp = 0.01).collect().map(_.getLong(0)).toSet
    // all 100 true members present (blooms have no false negatives) ...
    assert((0L until 100L).forall(pruned.contains))
    // ... and fp keeps the candidate set near |fresh|, not |historical|
    assert(pruned.size < 400, s"bloom barely pruned: ${pruned.size} of 10000")
  }

  test("bloomSemiAntiSplit plan: the bloom rides the historical scan as a " +
    "might_contain subquery filter") {
    import spark.implicits._
    val fresh = (0L until 10L).toDF("k")
    val hist = (0L until 100L).toDF("k")
    val (novel, _) = Lookup.bloomSemiAntiSplit(fresh, hist, "k", 10L)
    val plan = novel.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prune in plan:\n$plan")
  }

  test("semiAntiSplit plan broadcasts the historical side (scale contract)") {
    import spark.implicits._
    val fresh = Seq(1L, 2L).toDF("k")
    val hist = Seq(2L).toDF("k")
    val (novel, _) = Lookup.semiAntiSplit(fresh, hist, "k")
    val plan = novel.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in plan:\n$plan")
  }
}
