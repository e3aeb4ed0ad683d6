package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlKitSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String = {
    val r = Seq(url).toDF("u")
      .select(UrlKit.canonicalizeUrl(col("u")).as("c")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("canonicalizeUrl: case, www, default port, tracking, fragment, slash") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path/?utm_source=x&id=5&gclid=z#frag")
      == "https://example.com/Path?id=5")
    // path/query case is content, only scheme+host fold
    assert(canon("http://A.B.com/CaseSensitive?Q=Mixed")
      == "http://a.b.com/CaseSensitive?Q=Mixed")
    // all params tracking → the query evaporates entirely
    assert(canon("http://a.com/p?utm_a=1&utm_b=2") == "http://a.com/p")
    // tracking param in first position: '?' chain repaired
    assert(canon("http://a.com/p?fbclid=1&id=2") == "http://a.com/p?id=2")
    // root slash and :80 dropped
    assert(canon("http://www.a.com:80/") == "http://a.com")
    // non-default port survives
    assert(canon("http://a.com:8080/x") == "http://a.com:8080/x")
  }

  test("canonicalizeUrl: malformed input → null (quarantine contract)") {
    assert(canon("not a url") == null)
    assert(canon("://missing-scheme.com/x") == null)
  }

  test("canonicalizeUrl maps re-fetch variants of one page to one key") {
    val variants = Seq(
      "https://www.news.example.com/story/42?utm_source=tw&utm_medium=social",
      "HTTPS://news.example.com/story/42#comments",
      "https://news.example.com:443/story/42")
    val keys = variants.map(canon).distinct
    assert(keys == Seq("https://news.example.com/story/42"))
  }

  test("registeredDomain: generic TLD, multi-part suffix, junk") {
    val out = Seq("shop.example.co.uk", "a.b.example.com", "example.com",
      "localhost", "").toDF("h")
      .select(UrlKit.registeredDomain(col("h")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(out == Seq("example.co.uk", "example.com", "example.com", null, null))
  }

  test("url pipeline is pure expressions: no shuffle in the plan") {
    val df = Seq("https://www.a.com/x?utm_a=1").toDF("u")
      .select(UrlKit.canonicalizeUrl(col("u")).as("c"))
      .select(UrlKit.registeredDomain(UrlKit.hostOf(col("c"))).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
