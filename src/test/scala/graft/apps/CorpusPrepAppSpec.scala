package graft.apps

import graft.SparkSpec
import graft.functions.TextKit
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CorpusPrepAppSpec extends SparkSpec {
  import spark.implicits._

  test("e2e corpus prep on testdata: dedup, decontaminate, split, pack") {
    val docs = Tables.documents(spark, graft.TestSpark.sf0001)
    // benchmark = every 20th doc (the decontamination gate's convention)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val corpus = docs.filter(col("doc_id") % 20 =!= 0)
    // the synthetic corpus shares its whole vocabulary with the benchmark
    // (n_shared ranges 27-432, median ~207 at this SF): threshold 200 makes
    // decontamination drop roughly half — both outcomes exercised
    val cfg = CorpusPrepApp.Config(minSharedNgrams = 200L)
    val p = CorpusPrepApp.prepare(corpus, bench, cfg)

    val nIn = corpus.count()
    val nDeduped = p.deduped.count()
    assert(nDeduped > 0 && nDeduped <= nIn)

    // no two surviving docs are byte-identical
    val distinctTexts = p.deduped.select(md5(col("text").cast("binary"))).distinct().count()
    assert(distinctTexts == nDeduped, "exact dedup left identical texts")

    // no surviving near-dup pair: re-running pair detection on the output
    // finds nothing (every cluster collapsed to its canonical)
    val residualPairs = graft.ops.Dedup.minhashNearDupPairs(
      p.deduped, "doc_id", "text", 0.8, 128, 5, 16).count()
    assert(residualPairs == 0L, s"near-dup pairs survived dedup: $residualPairs")

    // no clean doc reaches the contamination threshold, and the filter
    // actually fired (some docs were dropped, some survived)
    val residualContam = graft.ops.Corpus.contaminationCounts(
      p.clean, bench, "doc_id", "text", 8)
      .filter(col("n_shared") >= cfg.minSharedNgrams).count()
    assert(residualContam == 0L, s"contaminated docs survived: $residualContam")
    val nClean = p.clean.count()
    assert(nClean > 0 && nClean < nDeduped,
      s"threshold should drop some but not all: $nClean of $nDeduped")

    // split is total and content-deterministic
    val labels = p.labeled.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(labels.keySet.subsetOf(Set("train", "val", "test")))
    assert(labels.values.sum == p.clean.count())

    // packing conserves tokens per (split, source) shard
    val packedTokens = p.chunks.agg(sum("chunk_tokens")).collect()(0).getLong(0)
    val labeledTokens = p.labeled
      .agg(sum(TextKit.tokenCount(col("text")).cast("long"))).collect()(0).getLong(0)
    assert(packedTokens == labeledTokens)
    // chunks never mix splits (shard key embeds the split)
    assert(p.chunks.select("split").distinct().count() <= 3)
  }

  test("opt-in stages: quality gate, line dedup, domain quota compose e2e") {
    val base = Tables.documents(spark, graft.TestSpark.sf0001)
    // plant per-source boilerplate chrome and a junk doc per source
    val chromed = base.select(col("doc_id"), col("source"),
      concat(lit("nav chrome "), col("source"), lit("\n"),
        col("text"), lit("\nfooter chrome")).as("text"))
    val junk = base.filter(col("doc_id") < 20)
      .select((col("doc_id") + 100000).as("doc_id"), col("source"),
        lit("tiny junk").as("text"))
    val corpus = chromed.unionByName(junk)
    val bench = base.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("source"), col("text"))
    val cfg = CorpusPrepApp.Config(
      minSharedNgrams = 1000000L, // decontam off for this case
      quality = Some(graft.ops.Corpus.GopherThresholds(
        minWords = 5L, minQualityBps = 0L, maxTopWordFrac = 1.0)),
      lineDedupMinDocs = Some(2),
      domainQuota = Some(15L))
    val p = CorpusPrepApp.prepare(corpus, bench, cfg)

    val cleanRows = p.clean.select("doc_id", "text", "source").collect()
    // junk docs never survive the gate
    assert(cleanRows.forall(_.getLong(0) < 100000L), "junk passed the gate")
    // boilerplate chrome is stripped before hashing
    assert(cleanRows.forall(!_.getString(1).contains("nav chrome")))
    assert(cleanRows.forall(!_.getString(1).contains("footer chrome")))
    // quota: E[kept]=15 per ~25-doc source; binomial 5σ upper bound < 25
    val perSource = p.clean.groupBy("source").count()
      .collect().map(_.getLong(1))
    assert(perSource.forall(_ <= 25L), s"quota ineffective: ${perSource.max}")
    assert(perSource.sum < cleanRows.length + 1 && perSource.sum > 0)
    // deterministic: same config → same clean set
    val again = CorpusPrepApp.prepare(corpus, bench, cfg)
      .clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == cleanRows.map(_.getLong(0)).toSet)
  }

  test("opt-in stages: normalization unifies NFC/whitespace twins; quantile floor trims") {
    val base = Tables.documents(spark, graft.TestSpark.sf0001)
      .select("doc_id", "source", "text").filter(col("doc_id") < 100)
    // plant a whitespace-and-NFC variant of every doc: without
    // normalization these are distinct texts; with it they are exact dups
    val variants = base.select((col("doc_id") + 100000).as("doc_id"),
      col("source"),
      concat(lit("  "), regexp_replace(col("text"), lit(" "), lit("\t")),
        lit(" \n")).as("text"))
    val corpus = base.unionByName(variants)
    val bench = base.limit(0)
    val cfg = CorpusPrepApp.Config(minSharedNgrams = 1000000L,
      normalize = true)
    val p = CorpusPrepApp.prepare(corpus, bench, cfg)
    // invariant: the planted twins add NOTHING — the corpus-with-variants
    // pipeline output equals the base-only pipeline output (each twin
    // exact-dedups onto its original post-normalize; natural near-dups
    // among the originals drop identically in both runs)
    val kept = p.deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    val baseKept = CorpusPrepApp.prepare(base, bench, cfg)
      .deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == baseKept,
      s"normalization failed to unify twins: ${kept.size} vs ${baseKept.size}")
    assert(kept.forall(_ < 100000L), "a variant survived its original")

    // quantile floor: top 60% by quality survive, count matches the gate op
    val cfg2 = CorpusPrepApp.Config(minSharedNgrams = 1000000L,
      qualityQuantile = Some(0.4))
    val p2 = CorpusPrepApp.prepare(base, bench, cfg2)
    val direct = graft.ops.Corpus.quantileGate(base,
      graft.functions.Kit.bps(graft.functions.TextKit.qualityScore(col("text"))),
      0.4).select("doc_id").collect().map(_.getLong(0)).toSet
    // pipeline's post-gate survivors ⊆ direct gate output (later stages
    // only remove); every direct-gate REJECT is also absent
    val survivors = p2.clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors.subsetOf(direct))
    assert(survivors.nonEmpty)
  }

  test("opt-in HTML stage: a crawled-markup twin unifies with its plain original") {
    val base = Tables.documents(spark, graft.TestSpark.sf0001)
      .select("doc_id", "source", "text").filter(col("doc_id") < 100)
    // plant an HTML-wrapped copy of every doc — same prose, full markup
    // shell (tags add whitespace, so normalize must run too)
    val pages = base.select((col("doc_id") + 100000).as("doc_id"),
      col("source"),
      concat(lit("<html><head><style>p{x:y}</style></head><body><p>"),
        col("text"), lit("</p><!-- footer --></body></html>")).as("text"))
    val corpus = base.unionByName(pages)
    val bench = base.limit(0)
    val cfg = CorpusPrepApp.Config(minSharedNgrams = 1000000L,
      htmlInput = true, normalize = true)
    val p = CorpusPrepApp.prepare(corpus, bench, cfg)
    val kept = p.deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    val baseKept = CorpusPrepApp.prepare(base, bench,
        CorpusPrepApp.Config(minSharedNgrams = 1000000L, normalize = true))
      .deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == baseKept,
      s"HTML twins failed to unify: ${kept.size} vs ${baseKept.size}")
    assert(kept.forall(_ < 100000L), "an HTML page survived its plain original")
  }

  test("opt-in semantic stage: hash-embedded SemDeDup catches a reshuffled twin") {
    val base = Tables.documents(spark, graft.TestSpark.sf0001)
      .select("doc_id", "source", "text").filter(col("doc_id") < 100)
    // plant a token-PERMUTED twin of every doc: bag-of-words identical
    // (hashEmbed cosine = 1) but token order differs — exact dedup misses
    // it and MinHash shingles (k=5 char grams of reordered text) mostly
    // miss it; the semantic stage must drop every twin
    val twins = base.select((col("doc_id") + 100000).as("doc_id"),
      col("source"),
      array_join(reverse(graft.functions.TextKit.tokens(col("text"))), " ")
        .as("text"))
    val corpus = base.unionByName(twins)
    val cfg = CorpusPrepApp.Config(minSharedNgrams = 1000000L,
      semantic = Some((0.999, 64)))
    val p = CorpusPrepApp.prepare(corpus, base.limit(0), cfg)
    val kept = p.deduped.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.forall(_ < 100000L),
      s"semantic stage missed ${kept.count(_ >= 100000L)} permuted twins")
    // and the originals that aren't twins of each other survive
    assert(kept.nonEmpty)
  }

  test("opt-in denoising stage: train-only (corrupted, target) pairs, " +
      "token accounting consistent with the labeled split") {
    val docs = Tables.documents(spark, graft.TestSpark.sf0001)
      .select("doc_id", "source", "text")
    val cfg = CorpusPrepApp.Config(minSharedNgrams = 1000000L,
      denoise = Some((3, 15)))
    val p = CorpusPrepApp.prepare(docs, docs.limit(0), cfg)
    val den = p.denoised.get
    val trainIds = p.labeled.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val rows = den.collect()
    assert(rows.map(_.getLong(0)).toSet == trainIds,
      "denoised output must cover exactly the train split")
    rows.foreach { r =>
      val (corrupted, target) = (r.getString(1), r.getString(2))
      val (n, m) = (r.getLong(3), r.getLong(4))
      val kept = corrupted.split(" ").count(_ != "<MASK>")
      assert(kept + m == n)
      assert((target.isEmpty && m == 0) || target.split(" ").length == m)
    }
    // absent when not configured
    assert(CorpusPrepApp.prepare(docs, docs.limit(0),
      CorpusPrepApp.Config(minSharedNgrams = 1000000L)).denoised.isEmpty)
  }
}
