package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FingerprintSpec extends SparkSpec {

  test("codegen'd expression matches the reference Scala implementation") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "ünïcödé ⚡ text", "x" * 10000)
    val df = samples.toDF("s")
    val got = df.select(Fingerprint.fingerprint32(col("s")).as("fp"))
      .collect().map(_.getLong(0))
    val want = samples.map(Fingerprint32.hash)
    assert(got.toSeq == want)
  }

  test("null input → null output") {
    import spark.implicits._
    val df = Seq(Some("a"), None).toDF("s")
    val out = df.select(Fingerprint.fingerprint32(col("s")).as("fp")).collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0))
  }

  test("interpreted path (eval) agrees with codegen results") {
    // force interpreted evaluation through the expression directly
    import org.apache.spark.unsafe.types.UTF8String
    val e = Fingerprint32(org.apache.spark.sql.catalyst.expressions.Literal("spark"))
    assert(e.eval(null) == Fingerprint32.hash("spark"))
    assert(Fingerprint32.hash("") == 0L)
  }

  test("values stay within [0, 2^31-1) — safe for 32-bit downstream storage") {
    import spark.implicits._
    val df = graft.sources.Tables.documents(spark, graft.TestSpark.sf0001)
    val mm = df.select(
      min(Fingerprint.fingerprint32(col("text"))).as("lo"),
      max(Fingerprint.fingerprint32(col("text"))).as("hi")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < 2147483647L)
  }
}
