package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq.tabulate(400) { i =>
    (i.toLong, if (i % 4 == 0) "en" else if (i % 4 == 1) "de" else "fr")
  }.toDF("doc_id", "lang")

  test("stratifiedByHash: per-stratum rates land near nominal and are exact-replayable") {
    val sampled = Sampling.stratifiedByHash(docs, "lang", "doc_id",
      Map("en" -> "8", "de" -> "4"), default = "2")
    // exact expected membership, recomputed locally with the same md5 rule
    def md5Nibble(id: Long): Char = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      f"${d(0) & 0xff}%02x".charAt(0)
    }
    val expected = docs.collect().map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, lang) =>
        val cut = lang match { case "en" => '8'; case "de" => '4'; case _ => '2' }
        md5Nibble(id) < cut
      }.map(_._1).toSet
    val got = sampled.select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    // rates roughly nominal (md5 is uniform; 100 draws per stratum)
    val byLang = sampled.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang("en") > 30 && byLang("en") < 70)   // nominal 50 of 100
    assert(byLang("de") > 10 && byLang("de") < 40)   // nominal 25 of 100
  }

  test("stratifiedByHash: lowering a threshold yields a strict subset (consistent sampling)") {
    val wide = Sampling.stratifiedByHash(docs, "lang", "doc_id", Map.empty, default = "8")
      .select("doc_id").as[Long].collect().toSet
    val narrow = Sampling.stratifiedByHash(docs, "lang", "doc_id", Map.empty, default = "2")
      .select("doc_id").as[Long].collect().toSet
    assert(narrow.subsetOf(wide))
    assert(narrow.size < wide.size)
  }

  test("stratifiedByHash: plan is a pure filter — no shuffle") {
    val sampled = Sampling.stratifiedByHash(docs, "lang", "doc_id",
      Map("en" -> "8"), default = "2")
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("reservoirPerGroup matches the window-rank formulation, including a hot group") {
    // hot group: 'en' holds 80% of rows (the viral-key shape)
    val skewed = Seq.tabulate(2000) { i =>
      (i.toLong, if (i % 10 < 8) "en" else if (i % 10 == 8) "de" else "fr")
    }.toDF("doc_id", "lang")
    val k = 7
    val got = Sampling.reservoirPerGroup(skewed, "lang", "doc_id", k)
      .select("lang", "doc_id", "rnk")
      .as[(String, Long, Int)].collect().toSet
    val prio = conv(substring(md5(concat($"lang", lit("|"), $"doc_id".cast("string"))), 1, 15),
      16, 10).cast("long")
    val want = skewed.withColumn("__prio", prio)
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"lang").orderBy($"__prio", $"doc_id")).cast("int"))
      .filter($"rnk" <= k)
      .select("lang", "doc_id", "rnk")
      .as[(String, Long, Int)].collect().toSet
    assert(got === want)
    assert(got.count(_._1 == "en") === k)
  }

  test("reservoirPerGroup: partial aggregation collapses map-side (no window sort of the full group)") {
    val plan = Sampling.reservoirPerGroup(docs, "lang", "doc_id", 3)
      .queryExecution.executedPlan.toString
    // the typed Aggregator plans as ObjectHashAggregate/SortAggregate with a
    // partial_ phase before the exchange; a window formulation would show
    // Window + a full sort instead
    assert(plan.contains("partial_"), s"expected partial aggregation:\n$plan")
    assert(!plan.contains("Window"), s"reservoir must not use a window:\n$plan")
  }

  test("reservoirPerGroup fails fast with a clear error on non-integral ids " +
    "(ADVICE r6: they must not silently become NULL payloads)") {
    import spark.implicits._
    val bad = Seq(("en", "doc-17"), ("en", "42")).toDF("lang", "id")
    val e = intercept[Exception] {
      Sampling.reservoirPerGroup(bad, "lang", "id", 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("must be integral-castable")),
      s"expected the in-plan guard message, got: $e")
    // all-integral string ids still work (cast path)
    val ok = Sampling.reservoirPerGroup(
      Seq(("en", "42"), ("en", "7")).toDF("lang", "id"), "lang", "id", 2)
    assert(ok.count() == 2)
  }

  test("reservoirPerGroup is invariant to input partitioning") {
    val a = Sampling.reservoirPerGroup(docs.repartition(13), "lang", "doc_id", 5)
      .select("lang", "doc_id", "prio", "rnk").collect().toSet
    val b = Sampling.reservoirPerGroup(docs.coalesce(1), "lang", "doc_id", 5)
      .select("lang", "doc_id", "prio", "rnk").collect().toSet
    assert(a === b)
  }
}
