package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook dominance definition, brute force. */
  private def bruteSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet

  test("skyline2D equals brute-force dominance on seeded random points") {
    val rnd = new scala.util.Random(7)
    val pts = (1L to 500L).map(i => (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val df = pts.toDF("id", "x", "y").repartition(7)
    val got = Skyline.skyline2D(df, "x", "y", c => shiftright(c, 6))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteSkyline(pts))
    assert(got.nonEmpty && got.size < pts.size)
  }

  test("ties and exact duplicates: mutually non-dominating copies all kept") {
    // (10,10) twice: neither dominates the other -> both kept.
    // (10,9) dominated by (10,10) (tie in x, strict in y).
    // (9,10) dominated likewise in the other dimension.
    // (5,20) and (20,5) incomparable corners -> kept.
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 10L, 9L),
      (4L, 9L, 10L), (5L, 5L, 20L), (6L, 20L, 5L))
    val df = pts.toDF("id", "x", "y").repartition(3)
    val got = Skyline.skyline2D(df, "x", "y", c => shiftright(c, 2))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 10L), (2L, 10L, 10L), (5L, 5L, 20L), (6L, 20L, 5L)))
  }

  test("frontier spanning many buckets and a single bucket agree with brute force") {
    val pts = (0L until 200L).map(i => (i, i, 199L - i)) // anti-chain: all on frontier
    val df = pts.toDF("id", "x", "y")
    val many = Skyline.skyline2D(df, "x", "y", c => shiftright(c, 3))
      .as[(Long, Long, Long)].collect().toSet
    val one = Skyline.skyline2D(df, "x", "y", _ => lit(0L))
      .as[(Long, Long, Long)].collect().toSet
    assert(many == pts.toSet && one == pts.toSet)
  }

  test("chain (totally ordered) collapses to the single maximal point") {
    val pts = (0L until 100L).map(i => (i, i, i))
    val df = pts.toDF("id", "x", "y").repartition(5)
    val got = Skyline.skyline2D(df, "x", "y", c => shiftright(c, 4))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((99L, 99L, 99L)))
  }

  test("no single-partition window over the data: windows partition by bucket") {
    val pts = (1L to 100L).map(i => (i, i % 37, i % 23))
    val df = pts.toDF("id", "x", "y")
    val plan = Skyline.skyline2D(df, "x", "y", c => shiftright(c, 3))
      .queryExecution.executedPlan.toString
    // the only WindowExec without a partition spec must be the one over
    // per-bucket maxima (B rows), i.e. its child aggregates on __b only
    assert(plan.contains("__b"))
  }
}
