package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextKitSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextKit.redactPii(col("t"))).collect().head.getString(0)

  private def counts(s: String): (Int, Int, Int) = {
    val r = Seq(s).toDF("t").select(
      TextKit.piiCount(col("t"), TextKit.emailPattern),
      TextKit.piiCount(col("t"), TextKit.phonePattern),
      TextKit.piiCount(col("t"), TextKit.ipv4Pattern)).collect().head
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("ngramHashSet (native): cardinality = distinct char n-grams, sorted, unicode-aligned") {
    def card(text: String, n: Int): (Int, Boolean) = {
      val arr = Seq(text).toDF("t")
        .select(TextKit.ngramHashSet(col("t"), n).as("g"))
        .collect().head.getSeq[Long](0)
      (arr.size, arr == arr.sorted)
    }
    def expectDistinct(text: String, n: Int): Int =
      text.sliding(n).filter(_.length == n).toSet.size
    for ((t, n) <- Seq(("abcabcab", 3), ("aaaa", 2), ("hello world", 5),
        ("日本語テキスト日本語", 2), ("ab", 5), ("", 3))) {
      val (c, sorted) = card(t, n)
      assert(c === expectDistinct(t, n), s"text='$t' n=$n")
      assert(sorted)
    }
    // equal texts -> equal sets; sets drive jaccard downstream
    val j = Seq(("abcdef", "abcdef"), ("abcdef", "zzzzzz")).toDF("a", "b")
      .select(size(array_intersect(TextKit.ngramHashSet(col("a"), 3),
        TextKit.ngramHashSet(col("b"), 3))).as("i")).collect().map(_.getInt(0))
    assert(j.toSeq === Seq(4, 0))
  }

  test("redactPii scrubs emails, phones, IPv4 with typed tokens") {
    assert(redact("mail bob.smith+tag@sub.example.co.uk now") == "mail <EMAIL> now")
    assert(redact("call +1 415-555-0134 or +44 201.555.0177") ==
      "call <PHONE> or <PHONE>")
    assert(redact("host 10.20.30.7 and 192.168.1.255") == "host <IP> and <IP>")
    assert(redact("a@b.io at 10.0.0.1 ring +1 555-555-5555") ==
      "<EMAIL> at <IP> ring <PHONE>")
  }

  test("redactPii leaves non-PII intact (version strings, bare numbers)") {
    assert(redact("v1.2.3 released; 1234 units; pi=3.14") ==
      "v1.2.3 released; 1234 units; pi=3.14")
    // 4-octet dotted runs DO match even out-of-range (documented over-redaction)
    assert(redact("odd 999.1.2.3 token") == "odd <IP> token")
  }

  test("piiCount counts on the original text, all three kinds") {
    assert(counts("a@b.io c@d.org +1 222-333-4444 10.0.0.1") == ((2, 1, 1)))
    assert(counts("nothing here") == ((0, 0, 0)))
  }

  private def norm(s: String, casefold: Boolean = false): String =
    Seq(s).toDF("t")
      .select(NativeTextKit.normalizeText(col("t"), casefold))
      .collect().head.getString(0)

  test("normalizeText: NFC composes combining marks; dedup keys converge") {
    val decomposed = "Cafe\u0301" // e + COMBINING ACUTE ACCENT
    val composed = "Caf\u00e9"    // precomposed \u00e9
    assert(decomposed != composed)  // different code points
    assert(norm(decomposed) == norm(composed)) // same canonical form
    assert(norm(decomposed) == composed)
  }

  test("normalizeText: whitespace runs collapse, ends trim, NBSP preserved") {
    assert(norm("  a\t\tb\n\nc  ") == "a b c")
    assert(norm("a\u00a0b") == "a\u00a0b") // NBSP is not \s in Java or RE2
    assert(norm("\n\t ") == "")
  }

  test("normalizeText: ROOT-locale casefold only when asked") {
    assert(norm("MiXeD CaSe") == "MiXeD CaSe")
    assert(norm("MiXeD CaSe", casefold = true) == "mixed case")
  }

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextKit.stripHtml(col("t"))).collect().head.getString(0)

  test("stripHtml: script/style content dropped wholesale, tags stripped") {
    assert(strip("<p>keep</p><script>if (a < 2 && b > 1) { x = \"<div>\"; }</script>done")
      == "keep done")
    assert(strip("<STYLE>p { color: red; }</STYLE>text") == "text")
    // case-insensitive, attribute-bearing, multiline blocks
    assert(strip("<Script type=\"x\">\nvar a;\n</scRipt>ok") == "ok")
    assert(strip("a<!-- note\nspanning lines -->b") == "a b")
  }

  test("stripHtml: entities decode once, &amp; last") {
    assert(strip("First &amp; second &lt;tag&gt;") == "First & second <tag>")
    // &amp;lt; is the ESCAPED literal "&lt;" — must not double-decode to "<"
    assert(strip("&amp;lt;x&amp;gt;") == "&lt;x&gt;")
    assert(strip("&quot;q&quot; &#39;s&#39; a&nbsp;b") == "\"q\" 's' a b")
  }

  test("stripHtml: whitespace from removed markup collapses") {
    assert(strip("<html>\n  <body>\n    <h1>Title</h1>\n    <p>Body text</p>\n  </body>\n</html>")
      == "Title Body text")
  }

  test("sortedContainmentPpm: exact parity with array_intersect above minPpm, -1 below") {
    // randomized sorted-distinct long arrays, cross-checked against the
    // size(array_intersect)*1e6 div size(a) form it replaced in Dedup
    val rnd = new scala.util.Random(42)
    def arr(): Seq[Long] =
      (0 until (1 + rnd.nextInt(40))).map(_ => rnd.nextInt(60).toLong).distinct.sorted
    val rows = (0 until 200).map(_ => (arr(), arr()))
    for (minPpm <- Seq(0L, 300000L, 700000L, 1000000L)) {
      val got = rows.toDF("a", "b")
        .select(TextKit.sortedContainmentPpm(col("a"), col("b"), minPpm))
        .collect().map(_.getLong(0))
      rows.zip(got).foreach { case ((a, b), g) =>
        val exact = a.intersect(b).size.toLong * 1000000L / a.size
        if (exact >= minPpm) assert(g === exact, s"a=$a b=$b minPpm=$minPpm")
        else assert(g === -1L, s"a=$a b=$b minPpm=$minPpm exact=$exact")
      }
    }
  }

  test("scriptProfile: per-script counts, dominant with name tie-break, " +
    "'none' on empty") {
    def profile(s: String) = Seq(s).toDF("t")
      .select(TextKit.scriptProfile(col("t")).as("p")).select("p.*")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().head
    // (arabic, cyrillic, greek, han, latin, digits, dominant)
    assert(profile("hello мир 42") == ((0L, 3L, 0L, 0L, 5L, 2L, "latin")))
    assert(profile("你好 world ok") == ((0L, 0L, 0L, 2L, 7L, 0L, "latin")))
    assert(profile("你好世界今天好") == ((0L, 0L, 0L, 7L, 0L, 0L, "han")))
    assert(profile("") == ((0L, 0L, 0L, 0L, 0L, 0L, "none")))
    assert(profile("!!! ???") == ((0L, 0L, 0L, 0L, 0L, 0L, "none")))
    // exact tie (2 vs 2) resolves to the lexicographically first name
    assert(profile("ab мы")._7 == "cyrillic")
  }

  test("compressionRatioPpm: repetitive text collapses, hex noise doesn't, " +
    "empty is 1e6 by convention, reused Deflater resets cleanly") {
    val rep = Seq.fill(80)("all work and no play makes jack a dull boy.").mkString(" ")
    val noise = (0 until 8).map(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"salt$i".getBytes("UTF-8")).map("%02x".format(_)).mkString).mkString
    // interleaved so consecutive rows on one thread exercise the reset path
    val rows = Seq(rep, noise, "", rep, noise)
    val got = rows.toDF("t")
      .select(TextKit.compressionRatioPpm(col("t"))).collect().map(_.getLong(0))
    assert(got(0) < 250000L, s"repetitive ppm ${got(0)}")
    assert(got(1) > 400000L, s"noise ppm ${got(1)}")
    assert(got(2) === 1000000L)
    // determinism + no state bleed between rows
    assert(got(3) === got(0) && got(4) === got(1))
  }

  test("sortedContainmentPpm: edges — empty left is -1, identity is 1e6, disjoint is -1") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
    val got = df.select(TextKit.sortedContainmentPpm(col("a"), col("b"), 500000L))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(-1L, 1000000L, -1L))
  }
}
