package graft.ops

import graft.SparkSpec
import graft.functions.TextKit
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel is content-deterministic: identical text → identical split") {
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "a different document entirely")).toDF("doc_id", "text")
    val out = docs.select(col("doc_id"), Corpus.splitLabel(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == out(2L), "duplicate text must land in the same split")
    assert(Set("train", "val", "test").contains(out(3L)))
  }

  test("splitLabel carve covers all 16 hex cells with 13/2/1 weights") {
    // every possible first hex char maps to exactly one split
    val cells = "0123456789abcdef".map(_.toString)
    val labels = cells.map { h =>
      // mirror the expression's comparison logic directly
      if (h < "d") "train" else if (h < "f") "val" else "test"
    }
    assert(labels.count(_ == "train") == 13)
    assert(labels.count(_ == "val") == 2)
    assert(labels.count(_ == "test") == 1)
  }

  test("splitLabelFine: exact cell carve incl. 256-boundary edge") {
    // corpus big enough that every carve bucket is hit
    val docs = (0 until 2000).map(i => (i.toLong, s"document body $i")).toDF("doc_id", "text")
    def dist(train: Int, valc: Int): Map[String, Long] =
      docs.groupBy(Corpus.splitLabelFine(col("text"), train, valc).as("s"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the carve must agree with numeric cell arithmetic on the same hashes
    val cells = docs.select(
        conv(substring(md5(col("text").cast("binary")), 1, 2), 16, 10)
          .cast("int").as("cell"))
      .collect().map(_.getInt(0))
    def expected(train: Int, valc: Int): Map[String, Long] =
      cells.groupBy(c => if (c < train) "train" else if (c < train + valc) "val" else "test")
        .map { case (k, v) => k -> v.length.toLong }
    for ((t, v) <- Seq((252, 2), (13 * 16, 2 * 16), (0, 256), (256, 0))) {
      assert(dist(t, v) == expected(t, v), s"carve ($t,$v) mismatch")
    }
    // 16-cell coarse split == fine split with 16x cells (same hash prefix
    // semantics: first hex char h == cells [16h, 16h+16))
    val coarse = docs.select(Corpus.splitLabel(col("text")).as("s"))
      .groupBy("s").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dist(13 * 16, 2 * 16) == coarse)
  }

  test("repetitionStats: hand-computed line and word repetition fractions") {
    import spark.implicits._
    import graft.functions.TextKit
    // lines (blank dropped): [dup dup, alpha, dup dup, beta beta];
    // words: [dup,dup,alpha,dup,dup,beta,beta] → 7 words, 3 distinct
    val text = "dup dup\nalpha\ndup dup\n  \nbeta beta"
    val r = Seq(text).toDF("text")
      .select(TextKit.repetitionStats(col("text")).as("r"))
      .select("r.*").collect()(0)
    assert(r.getLong(0) == 4L) // n_lines (blank line dropped)
    assert(r.getDouble(1) == 0.25) // dup_line_frac: 1 repeated of 4
    // line chars: 7+5+7+9=28 total, distinct 7+5+9=21 → 7/28
    assert(r.getDouble(2) == 0.25)
    assert(r.getLong(3) == 7L) // n_words
    assert(r.getDouble(4) == 4.0 / 7.0) // dup_word_frac: 7 words - 3 distinct
    assert(r.getDouble(5) == 4.0 / 7.0) // top_word_frac: "dup" ×4
    // empty text → zero everything
    val e = Seq("  ").toDF("text")
      .select(TextKit.repetitionStats(col("text")).as("r"))
      .select("r.*").collect()(0)
    assert(e.getLong(0) == 0L && e.getDouble(1) == 0.0 && e.getDouble(2) == 0.0)
    assert(e.getLong(3) == 0L && e.getDouble(4) == 0.0 && e.getDouble(5) == 0.0)
  }

  test("wordRepetitionStats (explode twin for long docs) matches the expression form") {
    import graft.functions.TextKit
    import graft.sources.Tables
    import graft.TestSpark.sf0001
    val docs = Tables.documents(spark, sf0001).limit(100)
    val viaExpr = docs
      .select(col("doc_id"), TextKit.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.dup_word_frac"), col("r.top_word_frac"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val viaAgg = Corpus.wordRepetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(viaAgg.nonEmpty && viaAgg == viaExpr.filter(_._2._1 > 0))
  }

  test("deterministicSample: reproducible, content-based, fraction-accurate, salt-independent") {
    import graft.apps.DataGen
    val docs = DataGen.uniformDocuments(spark, 10000L)
    val a = Corpus.deterministicSample(docs, "text", 0.25, salt = "x")
    val n = a.count()
    assert(math.abs(n - 2500L) < 200, s"0.25 sample of 10k → $n") // ~3.5σ
    // reproducible: same plan twice → identical ids
    val ids1 = a.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Corpus.deterministicSample(docs, "text", 0.25, salt = "x")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // nested property: a 0.1 sample is a subset of the 0.25 sample (same salt)
    val small = Corpus.deterministicSample(docs, "text", 0.1, salt = "x")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(ids1))
    // a different salt decorrelates: overlap ≈ 0.25·0.25·10k, not 0.1·10k
    val other = Corpus.deterministicSample(docs, "text", 0.25, salt = "y")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val overlap = (ids1 & other).size
    assert(overlap > 350 && overlap < 900, s"salted overlap $overlap")
  }

  test("mixtureSample: expected copies per weight, duplicates replicate identically") {
    import spark.implicits._
    val docs = (1L to 3000L).map { i =>
      val src = if (i % 3 == 0) "up" else if (i % 3 == 1) "down" else "other"
      (i, src, s"document number $i with some text body")
    }.toDF("doc_id", "source", "text")
    val out = Corpus.mixtureSample(docs, "source", "text",
      weights = Seq("up" -> 2.5, "down" -> 0.4), defaultWeight = 0.0)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 1000 docs per source: up ≈ 2500, down ≈ 400, other dropped entirely
    assert(math.abs(bySrc("up") - 2500L) < 150, s"up=${bySrc.get("up")}")
    assert(math.abs(bySrc("down") - 400L) < 120, s"down=${bySrc.get("down")}")
    assert(!bySrc.contains("other"))
    // every kept doc's copies are exactly 1..n
    val badCopies = out.groupBy("doc_id").agg(
      count(lit(1)).as("n"), min("copy").as("lo"), max("copy").as("hi"))
      .filter(col("lo") =!= 1L || col("hi") =!= col("n")).count()
    assert(badCopies == 0L)
    // byte-identical texts in the same source draw identical copy counts
    val twin = Seq((1L, "up", "twin text"), (2L, "up", "twin text"))
      .toDF("doc_id", "source", "text")
    val tc = Corpus.mixtureSample(twin, "source", "text", Seq("up" -> 1.5))
      .groupBy("doc_id").count().collect().map(_.getLong(1)).toSet
    assert(tc.size == 1, s"twins must replicate identically: $tc")
    // integer weight = exact replication
    val exact = Corpus.mixtureSample(twin, "source", "text", Seq("up" -> 3.0))
    assert(exact.count() == 6L)
  }

  test("dedupLines drops cross-document boilerplate, keeps order, handles all-dropped docs") {
    val docs = Seq(
      (1L, "shared header\nunique body one\nmore body one\nshared footer"),
      (2L, "shared header\nunique body two\nshared footer"),
      (3L, "shared header\nshared footer"), // nothing survives
      (4L, "standalone doc with its own single line")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, "doc_id", "text", minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((Some("unique body one\nmore body one"), 2L, 2L)))
    assert(out(2L) == ((Some("unique body two"), 1L, 2L)))
    assert(out(3L) == ((None, 0L, 2L)), "all-boilerplate doc → null text")
    assert(out(4L) == ((Some("standalone doc with its own single line"), 1L, 0L)))
  }

  test("dedupLines: duplicate lines WITHIN one doc don't count as cross-doc") {
    val docs = Seq(
      (1L, "echo\necho\necho"), // 3 copies but only 1 document
      (2L, "other text")
    ).toDF("doc_id", "text")
    val out = Corpus.dedupLines(docs, "doc_id", "text", minDocs = 2)
      .filter(col("doc_id") === 1L).collect().head
    assert(out.getString(1) == "echo\necho\necho" && out.getLong(3) == 0L,
      "doc frequency is DISTINCT docs, not occurrences")
  }

  test("contaminationCounts finds n-gram overlap and only overlap") {
    val corpus = Seq(
      (1L, "xylophone orchestra quartet jubilee zigzag"),
      (2L, "the secret benchmark passphrase appears here"),
      (3L, "short")).toDF("doc_id", "text") // len < n → empty gram set
    val bench = Seq((100L, "the secret benchmark passphrase")).toDF("doc_id", "text")
    val out = Corpus.contaminationCounts(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.contains(2L), "contaminated doc must be reported")
    assert(!out.contains(1L), "clean doc must be absent")
    assert(!out.contains(3L), "sub-n doc has no shingle evidence")
    // the shared-gram count equals the true distinct-set intersection
    def grams(s: String): Set[String] = s.sliding(8).filter(_.length == 8).toSet
    val expected = grams("the secret benchmark passphrase appears here")
      .intersect(grams("the secret benchmark passphrase")).size
    assert(out(2L) == expected.toLong)
  }

  test("contaminationCounts broadcasts the benchmark gram set (scale contract)") {
    val corpus = Seq((1L, "some training document text here")).toDF("doc_id", "text")
    val bench = Seq((100L, "benchmark document text")).toDF("doc_id", "text")
    val plan = Corpus.contaminationCounts(corpus, bench, "doc_id", "text", n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark grams must be the broadcast build side:\n$plan")
  }

  test("vocabStats: doc_freq counts documents, total_count counts occurrences") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "alpha gamma"),
      (3L, "   ")).toDF("doc_id", "text") // blank doc contributes nothing
    val out = Corpus.vocabStats(docs, "doc_id", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map("alpha" -> (2L, 3L), "beta" -> (1L, 1L), "gamma" -> (1L, 1L)))
    // scale contract: neither aggregate is a count-distinct (the (doc,token)
    // pre-aggregation makes doc_freq a plain count) — both hash aggregates
    // keep map-side partial aggregation
    val plan = Corpus.vocabStats(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("distinct"), s"count-distinct leaked into the plan:\n$plan")
  }

  test("packChunks invariants on a seeded random corpus") {
    val rng = new scala.util.Random(42)
    val docs = (0 until 500).map { i =>
      val shard = s"s${rng.nextInt(7)}"
      val words = 1 + rng.nextInt(40)
      (shard, i.toLong, Seq.fill(words)("w").mkString(" "))
    }.toDF("source", "doc_id", "text")
    val budget = 64L
    val out = Corpus.packChunks(docs, "source", "doc_id",
      TextKit.tokenCount(col("text")).cast("long"), budget)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byShard = out.groupBy(_._1)
    val truth = docs.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(TextKit.tokenCount(col("text")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    byShard.foreach { case (shard, chunks) =>
      val (nDocs, totTok) = truth(shard)
      // nothing lost: doc and token totals are preserved per shard
      assert(chunks.map(_._3).sum == nDocs)
      assert(chunks.map(_._4).sum == totTok)
      // chunk ids are contiguous from 0
      val ids = chunks.map(_._2).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq, s"$shard gaps: ${ids.toSeq}")
      // every non-final chunk is filled to its boundary: cumulative tokens
      // through chunk c reach (c+1)·budget (the next chunk's first doc has
      // exclusive prefix ≥ (c+1)·budget by the boundary rule)
      val cum = chunks.sortBy(_._2).map(_._4).scanLeft(0L)(_ + _).drop(1)
      cum.dropRight(1).zipWithIndex.foreach { case (tok, c) =>
        assert(tok >= (c + 1) * budget, s"$shard chunk $c underfilled: $tok")
      }
    }
  }

  test("packChunks: per-shard exclusive-cumsum boundaries, no global window") {
    val docs = Seq(
      // shard A: tokens 3,3,3,3 with budget 6 → chunks (0: docs 1,2), (1: docs 3,4)
      ("A", 1L, "a b c"), ("A", 2L, "d e f"), ("A", 3L, "g h i"), ("A", 4L, "j k l"),
      // shard B packs independently: one doc, chunk 0
      ("B", 9L, "x y")).toDF("source", "doc_id", "text")
    val out = Corpus.packChunks(docs, "source", "doc_id",
      TextKit.tokenCount(col("text")).cast("long"), budget = 6L)
      .orderBy("source", "chunk_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("A", 0L, 2L, 6L), ("A", 1L, 2L, 6L), ("B", 0L, 1L, 2L)))
    // scale contract: the window is partitioned by shard — the plan must not
    // contain a single-partition (empty partitionBy) window
    val plan = Corpus.packChunks(docs, "source", "doc_id",
      TextKit.tokenCount(col("text")).cast("long"), budget = 6L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window detected:\n$plan")
  }

  test("writeShuffled: file concatenation is the deterministic hash permutation") {
    import spark.implicits._
    val docs = (0 until 500).map(i => (i.toLong, s"document body number $i"))
      .toDF("doc_id", "text")
    val dir1 = java.nio.file.Files.createTempDirectory("shuf1").toString
    val dir2 = java.nio.file.Files.createTempDirectory("shuf2").toString
    val dir3 = java.nio.file.Files.createTempDirectory("shuf3").toString
    Corpus.writeShuffled(docs, dir1, "text", nFiles = 4, salt = "e1")
    Corpus.writeShuffled(docs, dir2, "text", nFiles = 4, salt = "e1")
    Corpus.writeShuffled(docs, dir3, "text", nFiles = 4, salt = "e2")

    // read files in name order, concatenating their row order
    def permutation(dir: String): Seq[Long] = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.toString).sorted
      files.flatMap(f =>
        spark.read.parquet(f).select("doc_id").collect().map(_.getLong(0))).toSeq
    }
    val p1 = permutation(dir1)
    assert(p1.sorted == (0L until 500L))       // a permutation of the corpus
    assert(p1 != (0L until 500L).toSeq)        // ...that actually shuffles
    assert(p1 == permutation(dir2))            // identical across runs
    assert(p1 != permutation(dir3))            // a new salt re-rolls it
    // and it equals the global sort by the shuffle key
    val expected = docs
      .withColumn("k", Corpus.shuffleKey(col("text"), "e1"))
      .orderBy(col("k")).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(p1 == expected)
  }

  test("spanCorrupt: masked spans collapse to one sentinel, targets " +
      "concatenate the masked tokens, counts line up, deterministic") {
    import spark.implicits._
    // pctMasked=100: every span masked → corrupted = one <MASK> per span
    val df = Seq((1L, "a b c d e f g")).toDF("id", "text")
    val all = df.select(Corpus.spanCorrupt(col("id"), col("text"),
        spanLen = 3, pctMasked = 100).as("c")).select("c.*")
      .as[(String, String, Long, Long)].head()
    assert(all == (("<MASK> <MASK> <MASK>", "a b c d e f g", 7L, 7L)))
    // pctMasked=0: identity
    val none = df.select(Corpus.spanCorrupt(col("id"), col("text"),
        spanLen = 3, pctMasked = 0).as("c")).select("c.*")
      .as[(String, String, Long, Long)].head()
    assert(none == (("a b c d e f g", "", 7L, 0L)))
    // intermediate rate: reconstruction invariants — corrupted tokens =
    // unmasked + one sentinel per masked span; target has n_masked tokens;
    // and the decision is reproducible across runs
    val docs = (0L until 50L)
      .map(i => (i, (1 to 20).map(j => s"w$j").mkString(" "))).toDF("id", "text")
    def run() = docs.select(col("id"), Corpus.spanCorrupt(col("id"),
        col("text"), spanLen = 3, pctMasked = 40).as("c"))
      .select(col("id"), col("c.*"))
      .as[(Long, String, String, Long, Long)].collect().toSeq.sortBy(_._1)
    val a = run()
    assert(a == run())
    a.foreach { case (_, corrupted, target, nTokens, nMasked) =>
      assert(nTokens == 20L)
      val sentinels = corrupted.split(" ").count(_ == "<MASK>")
      val kept = corrupted.split(" ").count(_ != "<MASK>")
      assert(kept + nMasked == nTokens)
      assert(target.isEmpty && nMasked == 0 ||
        target.split(" ").length == nMasked)
      // each sentinel stands for a contiguous aligned span of ≤ 3 masked
      // tokens: sentinel count bounds
      assert(sentinels * 3L >= nMasked && sentinels <= nMasked)
    }
  }

  test("temperatureMixture: sqrt-rebalance lifts tail sources, deterministic, " +
    "expected-size calibrated") {
    import spark.implicits._
    // head source 16x the tail: sqrt-temperature gives the tail 1/(4+1)=20%
    // of the sample instead of its 1/17=5.9% corpus share
    val docs = (0 until 1600).map(i => ("head", s"hd $i", i.toLong)) ++
      (0 until 100).map(i => ("tail", s"tl $i", 10000L + i))
    val df = docs.toDF("source", "text", "id")
    val out = Corpus.temperatureMixture(df, "source", "text",
      targetPermille = 500, salt = "s")
    val bySrc = out.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val total = bySrc.values.sum.toDouble
    // exact expectations: T = 850, p_head = 40/50, p_tail = 10/50
    // -> 680 head / 170 tail; Bernoulli cells add +-small noise
    assert(math.abs(total - 850.0) < 60.0, s"sampled $total of expected 850")
    val tailShare = bySrc.getOrElse("tail", 0L) / total
    assert(tailShare > 0.15 && tailShare < 0.25,
      f"tail share $tailShare%.3f, want ~0.20 (corpus share is 0.059)")
    // content-hash determinism
    val again = Corpus.temperatureMixture(df, "source", "text",
      targetPermille = 500, salt = "s")
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("noveltyScores: hand-computed ppm, zero-overlap docs kept at 1e6, " +
    "short docs at 0") {
    import spark.implicits._
    val reference = Seq((100L, "abcdefgh")).toDF("id", "text") // grams: abc
    val corpus = Seq(
      (1L, "abcdefgh"),     // identical: 6 trigrams, all shared -> 0 ppm
      (2L, "zzzyyyxxx"),    // disjoint: 7 trigrams, 0 shared -> 1e6
      (3L, "abcxyzqrs"),    // abc shared, 6 of 7 novel -> 857142
      (4L, "ab"))           // too short: 0 grams -> 0 by convention
      .toDF("id", "text")
    val got = Corpus.noveltyScores(corpus, reference, "id", "text", n = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 6L, 6L, 0L),
      (2L, 7L, 0L, 1000000L),
      (3L, 7L, 1L, 857142L),
      (4L, 0L, 0L, 0L)))
  }
}
