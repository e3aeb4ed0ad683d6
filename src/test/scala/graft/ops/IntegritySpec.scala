package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private def replica = Seq.tabulate(1000) { i =>
    (i.toLong, s"name_$i", i * 37L % 101)
  }.toDF("id", "name", "v")

  private def sig = Integrity.rowSignature(col("id"), col("name"), col("v"))

  test("identical replicas produce identical bucket signatures; diff is empty") {
    val a = Integrity.bucketSignature(replica, col("id") % 16, sig)
    val b = Integrity.bucketSignature(replica.repartition(7), col("id") % 16, sig)
    assert(a.orderBy("bucket").collect().toSeq === b.orderBy("bucket").collect().toSeq)
    assert(Integrity.diffBuckets(a, b).count() === 0)
  }

  test("a single changed row flags exactly its bucket") {
    val a = Integrity.bucketSignature(replica, col("id") % 16, sig)
    val tampered = replica.withColumn("v",
      when($"id" === 437, $"v" + 1).otherwise($"v"))
    val b = Integrity.bucketSignature(tampered, col("id") % 16, sig)
    val bad = Integrity.diffBuckets(a, b).select("bucket").as[Long].collect()
    assert(bad.toSeq === Seq(437L % 16))
  }

  test("a missing row flags exactly its bucket (count catches it too)") {
    val a = Integrity.bucketSignature(replica, col("id") % 16, sig)
    val b = Integrity.bucketSignature(replica.filter($"id" =!= 321), col("id") % 16, sig)
    val bad = Integrity.diffBuckets(a, b)
      .select("bucket", "a_rows", "b_rows").as[(Long, Long, Long)].collect()
    assert(bad.toSeq === Seq((321L % 16, 63L, 62L)))
  }

  test("null POSITION participates in the signature: (a,NULL,b) vs (a,b,NULL) " +
    "differ (ADVICE r6: bare concat_ws skips nulls)") {
    val a = Seq(("a", Option.empty[String], Option("b"))).toDF("x", "y", "z")
    val b = Seq(("a", Option("b"), Option.empty[String])).toDF("x", "y", "z")
    def one(df: org.apache.spark.sql.DataFrame) =
      df.select(Integrity.rowSignature(col("x"), col("y"), col("z")).as("s"))
        .as[Long].head()
    assert(one(a) != one(b))
    // and a null is not the same as an empty string either
    val c = Seq(("a", Option(""), Option("b"))).toDF("x", "y", "z")
    assert(one(a) != one(c))
  }

  test("signature aggregation is map-side combined (partial before exchange)") {
    val plan = Integrity.bucketSignature(replica, col("id") % 16, sig)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_"), s"expected partial agg:\n$plan")
  }
}
