package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join = plain join, even with a pathologically hot key") {
    // 10k rows of one hot key + a long tail, joined WITHOUT broadcast so
    // the salted shuffle path actually runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = (1 to 10000).map(i => (if (i % 10 == 0) 42L else i.toLong, i))
        .toDF("k", "v")
      val small = Seq((42L, "hot"), (1L, "a"), (2L, "b")).toDF("k", "tag")
      val salted = Skew.saltedJoin(big, small, "k", salt = 8,
          joinType = "left_outer",
          scatter = Some(pmod(hash(col("v")), lit(8))))
        .groupBy(coalesce(col("tag"), lit("none")).as("tag"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val plain = big.join(small, Seq("k"), "left_outer")
        .groupBy(coalesce(col("tag"), lit("none")).as("tag"))
        .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      val s = salted.as[(String, Long, Long)].collect().toSet
      val p = plain.as[(String, Long, Long)].collect().toSet
      assert(s == p)
      // 1000 multiples of 10 + i=42 itself also hits the hot key
      assert(s.exists { case (tag, n, _) => tag == "hot" && n == 1001 })
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("inner salted join preserves multiplicity on duplicate small keys") {
    val big = (1 to 100).map(i => (1L, i)).toDF("k", "v")
    val small = Seq((1L, "x"), (1L, "y")).toDF("k", "tag") // dup build keys
    val n = Skew.saltedJoin(big, small, "k", salt = 4).count()
    assert(n == 200) // 100 rows × 2 matches, same as an unsalted join
  }

  test("semi/anti joins are rejected (replication would change cardinality)") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", salt = 4, joinType = "left_semi")
    }
  }
}
