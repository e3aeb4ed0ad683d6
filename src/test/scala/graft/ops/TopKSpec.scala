package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"o".desc, $"p")
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"o", $"p", $"rank".cast("int").as("rank"))
      .as[(Long, Long, Long, Int)].collect().toSet
  }

  test("topKPerGroup equals the window-rank form, hot key included") {
    val rnd = new scala.util.Random(13)
    // group 0 is hot: 5000 rows; groups 1..50 small; ties included
    val rows = (1 to 5000).map(i => (0L, rnd.nextInt(300).toLong, i.toLong)) ++
      (1 to 500).map(i => ((i % 50) + 1L, rnd.nextInt(40).toLong, i.toLong))
    val df = rows.toDF("g", "o", "p").repartition(11)
    val got = TopK.topKPerGroup(df, "g", $"o", $"p", k = 3)
      .select($"group", $"ord", $"payload", $"rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == windowForm(df, 3))
  }

  test("topKPerGroup: groups smaller than k return all rows, ranked") {
    val df = Seq((1L, 10L, 100L), (1L, 20L, 200L), (2L, 5L, 500L))
      .toDF("g", "o", "p")
    val got = TopK.topKPerGroup(df, "g", $"o", $"p", k = 5)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 20L, 200L, 1), (1L, 10L, 100L, 2), (2L, 5L, 500L, 1)))
  }

  test("topKPerGroup: partial aggregation collapses the hot group map-side") {
    val df = (1 to 100).map(i => (1L, i.toLong, i.toLong)).toDF("g", "o", "p")
    val plan = TopK.topKPerGroup(df, "g", $"o", $"p", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed-aggregator plan:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"expected partial (map-side) aggregation before the exchange:\n$plan")
    assert(!plan.contains("Window"), s"expected no window sort:\n$plan")
  }

  test("topKPerGroupByDouble equals the window-rank form on doubles, incl. " +
    "negatives, ties, and extreme magnitudes (sortable-bits bijection)") {
    val vals = Seq(-1.5, -0.0, 0.0, 1e-300, 0.75, 0.75, 1e300, -1e300, 2.25)
    val df = vals.zipWithIndex.map { case (v, i) => ((i % 2).toLong, v, i.toLong) }
      .toDF("g", "o", "p")
    val got = TopK.topKPerGroupByDouble(df, "g", $"o", $"p", k = 3)
      .as[(Long, Double, Long, Int)].collect().toSet
    val want = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"g").orderBy($"o".desc, $"p")
      df.withColumn("rank", row_number().over(w)).filter($"rank" <= 3)
        .select($"g", $"o", $"p", $"rank")
        .as[(Long, Double, Long, Int)].collect().toSet
    }
    assert(got == want)
    // the emitted ord is the bit-identical input double (bijection, not a
    // lossy quantization)
    assert(got.map(_._2).subsetOf(vals.toSet ++ Set(-0.0)))
  }

  test("topKPerGroupByDouble: partial aggregation, no window sort " +
    "(the bruteForceTopK ranking shape, VERDICT r6 item 1)") {
    val df = (1 to 100).map(i => (1L, i / 7.0, i.toLong)).toDF("g", "o", "p")
    val plan = TopK.topKPerGroupByDouble(df, "g", $"o", $"p", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected a typed-aggregator plan:\n$plan")
    assert(plan.toLowerCase.contains("partial"),
      s"expected partial (map-side) aggregation before the exchange:\n$plan")
    assert(!plan.contains("Window"), s"expected no window sort:\n$plan")
  }

  test("topKPerGroup: partitioning-invariant under ties") {
    val rows = (1 to 400).map(i => ((i % 7).toLong, (i % 5).toLong, i.toLong))
    val a = TopK.topKPerGroup(rows.toDF("g", "o", "p"), "g", $"o", $"p", 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    val b = TopK.topKPerGroup(rows.toDF("g", "o", "p").repartition(17),
        "g", $"o", $"p", 4)
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(a == b)
  }
}
