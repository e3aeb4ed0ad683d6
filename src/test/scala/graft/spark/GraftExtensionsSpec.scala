package graft.spark

import graft.SparkSpec
import graft.functions.{Fingerprint32, SimHash64}

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.registerAll(spark)

  test("SQL functions agree with the native implementations") {
    val row = spark.sql(
      """SELECT graft_fingerprint32('hello world') AS fp,
        |       graft_simhash64('hello world') AS sh,
        |       size(graft_minhash_sig('hello world hello', 64, 3)) AS nsig,
        |       size(graft_minhash_bands('hello world hello', 64, 3, 8)) AS nbands,
        |       size(graft_binary_features(cast('hello' AS BINARY), 16)) AS nfeat
        |""".stripMargin).head()
    assert(row.getLong(0) == Fingerprint32.hash("hello world"))
    assert(row.getLong(1) == SimHash64.compute("hello world"))
    assert(row.getInt(2) == 64)
    assert(row.getInt(3) == 8)
    assert(row.getInt(4) == 16)
  }

  test("band hashes in SQL match the banded signature fold") {
    val (sql1, sql2) = spark.sql(
      """SELECT graft_minhash_bands(text, 128, 5, 16) AS b,
        |       graft_minhash_sig(text, 128, 5) AS s
        |FROM VALUES ('the quick brown fox jumps over the lazy dog') AS t(text)
        |""".stripMargin).as[(Array[Long], Array[Long])].head()
    assert(sql1.length == 16 && sql2.length == 128)
    // same text twice → identical bucket keys (deterministic constants)
    val again = spark.sql(
      """SELECT graft_minhash_bands('the quick brown fox jumps over the lazy dog', 128, 5, 16)
        |""".stripMargin).as[Array[Long]].head()
    assert(again.toSeq == sql1.toSeq)
  }

  test("optional oph argument selects the one-permutation kernel") {
    val row = spark.sql(
      """SELECT graft_minhash_sig('the quick brown fox', 32, 3, true) AS o,
        |       graft_minhash_sig('the quick brown fox', 32, 3) AS d,
        |       graft_minhash_bands('the quick brown fox', 32, 3, 4, true) AS ob
        |""".stripMargin).as[(Array[Long], Array[Long], Array[Long])].head()
    assert(row._1.toSeq ==
      graft.functions.MinHashSig.computeOph("the quick brown fox", 32, 3).toSeq)
    assert(row._2.toSeq ==
      graft.functions.MinHashSig.compute("the quick brown fox", 32, 3).toSeq)
    assert(row._1.toSeq != row._2.toSeq && row._3.length == 4)
  }

  test("graft_normalize in SQL: NFC + whitespace, optional casefold literal") {
    val r = spark.sql(
      "SELECT graft_normalize('  A\tB  '), graft_normalize('  A\tB  ', true)")
      .collect().head
    assert(r.getString(0) == "A B")
    assert(r.getString(1) == "a b")
  }

  test("non-literal parameter arguments are rejected") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash_sig(text, doc_id, 3) FROM VALUES ('x', 1) AS t(text, doc_id)").collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
