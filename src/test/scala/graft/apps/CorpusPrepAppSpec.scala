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
}
