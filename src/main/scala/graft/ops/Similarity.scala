package graft.ops

import graft.functions.VectorKit
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Two tiers:
 *
 *  - [[bruteForceTopK]]: exact cosine top-k, query side broadcast — the
 *    correctness baseline. Linear scan of the corpus per query batch; at
 *    100 TB this is the right shape ONLY for small query sets (the corpus
 *    scan parallelizes perfectly, no shuffle of the big side: broadcast
 *    hash join → per-partition heap).
 *  - [[lshTopK]]: random-hyperplane LSH bucketing; each query probes its
 *    own bucket (plus optional multi-probe neighbors) so the scan touches
 *    a ~2^-bits fraction of the corpus. The scale path for large query sets.
 */
object Similarity {

  /**
   * Exact top-k by cosine for each query vector. `queries` must be small
   * (it is broadcast); ids must be integral (they ride the k-bounded
   * ranking buffer as longs). Ties broken by corpus id for determinism.
   * Output: (query_id, neighbor_id, cos) — self-matches excluded.
   *
   * Ranking is [[TopK.topKPerGroupByDouble]] — a k-bounded partial
   * aggregate, NOT a `row_number` window: the window form would hold every
   * query's |corpus| scored rows in ONE task's sort buffer (a
   * straggler/OOM per query at 10⁹ docs), while the aggregator collapses
   * each query to k rows map-side before the exchange, O(k) memory per
   * query regardless of corpus size. The emitted cosine is the exact
   * scored double (the buffer stores IEEE-754 sortable bits — a
   * bijection), so results are bit-identical to the window form.
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    TopK.topKPerGroupByDouble(scored, "query_id", col("cos"), col("neighbor_id"), k)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"),
        col("ord").as("cos"), col("rank"))
  }

  /**
   * Train the IVF coarse quantizer: deterministic seed (the `nCentroids`
   * corpus vectors with the smallest `xxhash64(id)` — a distributed top-k,
   * `TakeOrderedAndProject`, no global sort) refined by `lloydIters` rounds
   * of Lloyd's algorithm as DataFrame aggregations. The model (k × dim
   * doubles) is collected to the driver — the one legitimate driver-side
   * materialization in this module: a quantizer IS a model, it is a few KB,
   * and every ANN system ships it to workers. Components are rounded to
   * 1e-6 so distributed-sum ordering can't leak nondeterminism into cell
   * boundaries.
   */
  /** The (id, double-vector) projection every trainer iterates over. */
  private def trainProjection(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.select(col(idCol).as("id"), VectorKit.asDouble(col(vecCol)).as("v"))

  def trainIvfCentroids(corpus: DataFrame, nCentroids: Int, lloydIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding",
      shared: Option[DataFrame] = None): Seq[(Int, Seq[Double])] = {
    // persist the (id, v) projection: the seed top-k plus every Lloyd round
    // re-reads it — uncached, each round would re-run the full corpus scan
    // (lloydIters+1 scans of a 100 TB table); cached, the scan pays once.
    // `shared` lets a caller training several models (ivfPqTopK: coarse +
    // PQ) pay that one materialization once across all of them.
    val c = shared.getOrElse(trainProjection(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val seed = c.orderBy(xxhash64(col("id")), col("id")).limit(nCentroids)
      .select("v").collect()
      .map(_.getSeq[Double](0)).zipWithIndex.map { case (v, i) => (i, v.toSeq) }
    var centroids: Seq[(Int, Seq[Double])] = seed.toSeq
    var iter = 0
    while (iter < lloydIters) {
      val assigned = c.withColumn("cell", nearestCentroid(col("v"), centroids))
      // element-wise mean per cell: one shuffle on (cell, dim index)
      val means = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      centroids = centroids.map { case (i, old) =>
        val dim = old.length
        val moved = (0 until dim).map { d =>
          means.get((i, d)).map(m => math.rint(m * 1e6) / 1e6).getOrElse(old(d))
        }
        (i, moved)
      }
      iter += 1
    }
    if (shared.isEmpty) c.unpersist()
    centroids
  }

  /** Argmax-cosine cell id over a literal centroid model — a pure, codegen'd
    * expression (no join, no shuffle, no window): ties take the lowest id.
    * `private[ops]` so the SemDeDup blocker ([[Dedup.semanticNearDupPairs]])
    * assigns clusters with the exact same expression the IVF index uses.
    */
  private[ops] def nearestCentroid(v: Column, centroids: Seq[(Int, Seq[Double])]): Column = {
    val scores = array(centroids.sortBy(_._1).map { case (_, cv) =>
      VectorKit.cosine(v, typedLit(cv)) }: _*)
    (array_position(scores, array_max(scores)) - 1).cast("int")
  }

  /** Top-`nProbe` centroid ids by cosine, as an exploded (rank-free) list —
    * same literal-model shape as [[nearestCentroid]]; ties prefer the lower
    * centroid id via the sort comparator.
    */
  private[ops] def probeCells(v: Column, centroids: Seq[(Int, Seq[Double])],
      nProbe: Int): Column = {
    val scored = array(centroids.sortBy(_._1).map { case (i, cv) =>
      struct(VectorKit.cosine(v, typedLit(cv)).as("cs"),
        lit(i).as("centroid_id")) }: _*)
    val sorted = array_sort(scored, (l, r) =>
      when(l.getField("cs") > r.getField("cs"), -1)
        .when(l.getField("cs") < r.getField("cs"), 1)
        .otherwise(l.getField("centroid_id") - r.getField("centroid_id")))
    slice(sorted, 1, nProbe).getField("centroid_id")
  }

  /**
   * IVF (inverted-file) approximate top-k — the classic coarse-quantizer
   * ANN layout: the corpus is partitioned into `nCentroids` cells by
   * nearest centroid; each query probes its `nProbe` nearest cells and
   * runs exact cosine only inside them. With nProbe = nCentroids this
   * degenerates to the exact search (asserted in the spec) — the
   * recall/cost dial is nProbe/nCentroids.
   *
   * Centroids come from [[trainIvfCentroids]] (deterministic hash-sampled
   * seed + Lloyd refinement). At 100 TB: cell assignment and probe
   * selection are literal-model expressions inside the scan (zero shuffle,
   * zero extra action), cells are hash-partitioned by cell id by the probe
   * equi-join, and the only per-query ranking window is partitioned by
   * query_id — no single-partition stage anywhere.
   */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, lloydIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    val centroids = trainIvfCentroids(corpus, nCentroids, lloydIters, idCol, vecCol)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))

    val cells = c.withColumn("centroid_id", nearestCentroid(col("cv"), centroids))
    val probes = q.select(col("query_id"), col("qv"),
      explode(probeCells(col("qv"), centroids, nProbe)).as("centroid_id"))

    val scored = cells.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    // k-bounded partial-agg ranking (not a window): a skewed coarse
    // quantizer can hand one query a mega-cell's worth of candidates; the
    // aggregator caps per-query state at O(k) map-side (same hazard/fix
    // as bruteForceTopK)
    TopK.topKPerGroupByDouble(scored, "query_id", col("cos"), col("neighbor_id"), k)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"),
        col("ord").as("cos"), col("rank"))
  }

  /**
   * Train product-quantization codebooks: the embedding is split into
   * `numSubspaces` contiguous subspaces and each subspace gets its own
   * `codebookSize`-entry squared-L2 k-means codebook. Seed = the
   * `codebookSize` corpus vectors with the smallest `xxhash64(id)` (one
   * distributed top-k; each subspace takes its slice of the SAME sampled
   * vectors — the canonical PQ training sample), refined by `lloydIters`
   * Lloyd rounds. Assignment during training reuses the NATIVE encoder
   * ([[graft.functions.PqEncode]]) on the full multi-subspace model — the
   * exact argmin code path (incl. first-lowest tie order) index time uses —
   * and ALL subspaces train in each round's single aggregation: one job
   * per round, not one per (subspace, round). Means are rounded to 1e-6 so
   * distributed-sum ordering can't move a cell boundary between runs.
   *
   * At 100 TB: train on a sample (pass a sampled DataFrame — the codebook
   * is a model, not a scan product); the whole training run is 1 top-k +
   * `lloydIters` aggregation passes over the cached projection, and the
   * returned model is M·k·sub doubles, a few KB shipped to executors as
   * expression metadata.
   */
  def trainPqCodebooks(corpus: DataFrame, numSubspaces: Int, codebookSize: Int,
      lloydIters: Int = 2, idCol: String = "vec_id", vecCol: String = "embedding",
      shared: Option[DataFrame] = None): Seq[Seq[Seq[Double]]] = {
    val c = shared.getOrElse(trainProjection(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // seed sample: one distributed top-k; dim falls out of the same rows
    val seedRows = c.orderBy(xxhash64(col("id")), col("id")).limit(codebookSize)
      .select("v").collect().map(_.getSeq[Double](0))
    val dim = seedRows.head.length
    require(dim % numSubspaces == 0,
      s"numSubspaces=$numSubspaces must divide dim=$dim")
    val sub = dim / numSubspaces
    var cents: Seq[Seq[Seq[Double]]] = (0 until numSubspaces).map(m =>
      seedRows.toSeq.map(v => v.slice(m * sub, m * sub + sub).toSeq))
    var iter = 0
    while (iter < lloydIters) {
      // all subspaces in ONE pass: the native encoder emits every
      // subspace's cell in a single per-row call; exploding the vector
      // once gives (subspace, cell, dim-in-subspace) means in one
      // map-side-combined aggregation
      val means = c
        .select(posexplode(col("v")).as(Seq("gpos", "x")),
          graft.functions.NativeVectorKit.pqEncode(col("v"), cents).as("codes"))
        .select(floor(col("gpos") / lit(sub)).cast("int").as("m"),
          pmod(col("gpos"), lit(sub)).as("pos"), col("x"),
          element_at(col("codes"), (col("gpos") / lit(sub)).cast("int") + 1).as("cell"))
        .groupBy("m", "cell", "pos").agg(avg(col("x")).as("mean"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(3))).toMap
      cents = cents.zipWithIndex.map { case (cb, m) =>
        cb.zipWithIndex.map { case (old, j) =>
          old.indices.map { d =>
            means.get((m, j, d)).map(x => math.rint(x * 1e6) / 1e6).getOrElse(old(d))
          }
        }
      }
      iter += 1
    }
    if (shared.isEmpty) c.unpersist()
    cents
  }

  /**
   * IVF-PQ approximate top-k — the memory-bound 100 TB layout: the probe
   * join scans a COMPRESSED index of (id, cell, M PQ codes) — ~M bytes per
   * vector instead of 4·dim — scores candidates with asymmetric-distance
   * cosine ([[graft.functions.PqAdcCosine]], query raw × codebook entries,
   * no reconstruction materialized), keeps the top-`shortlist` per query,
   * and re-scores ONLY that shortlist against the raw vectors (exact
   * cosine), so reported scores are exact and PQ error can only cost
   * recall, never corrupt a score.
   *
   * Plan shape: index build = one corpus scan (cell + codes are literal-
   * model expressions inside the scan); probe join is broadcast (queries ×
   * nProbe); the ADC shortlist window partitions by query_id; the rerank
   * fetch broadcasts the (queries × shortlist)-row shortlist against the
   * corpus scan — at 100 TB that is the standard "ANN index in RAM, raw
   * vectors fetched for rerank" split, expressed as two scans and zero
   * wide shuffles.
   *
   * With nProbe = nCentroids and shortlist ≥ corpus size this degenerates
   * to the exact search (asserted in SimilaritySpec).
   */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCentroids: Int, nProbe: Int, numSubspaces: Int = 8,
      codebookSize: Int = 16, shortlist: Int = 50, lloydIters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCentroids)
    require(shortlist >= k, "shortlist must cover k")
    // one cached projection feeds BOTH trainers (coarse + PQ): the corpus
    // scan and the array-of-float→double conversion pay once for the whole
    // training phase
    val proj = trainProjection(corpus, idCol, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val coarse = trainIvfCentroids(corpus, nCentroids, lloydIters, idCol, vecCol,
      shared = Some(proj))
    val pq = trainPqCodebooks(corpus, numSubspaces, codebookSize, lloydIters,
      idCol, vecCol, shared = Some(proj))
    proj.unpersist()
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    // the compressed index: the ONLY thing the probe join ever touches
    val index = c.select(col("neighbor_id"),
      nearestCentroid(col("cv"), coarse).as("centroid_id"),
      graft.functions.NativeVectorKit.pqEncode(col("cv"), pq).as("codes"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(probeCells(col("qv"), coarse, nProbe)).as("centroid_id"))
    val adc = index.join(broadcast(probes), Seq("centroid_id"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("adc",
        graft.functions.NativeVectorKit.pqAdcCosine(col("qv"), col("codes"), pq))
    // ADC shortlist via the k-bounded aggregator: candidate volume per
    // query is cell-skew-dependent, so no per-query sort buffer may scale
    // with it. The query vector joins back from the (tiny, broadcast)
    // probe list — it cannot ride the long-pair buffer.
    val qvs = q.select(col("query_id"), col("qv"))
    val short = TopK.topKPerGroupByDouble(adc, "query_id", col("adc"),
        col("neighbor_id"), shortlist)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"))
      .join(broadcast(qvs), Seq("query_id"))
    // exact rerank: raw vectors fetched only for the shortlist (bounded:
    // shortlist rows per query), ranked with the same aggregator
    val rescored = c.join(broadcast(short), Seq("neighbor_id"))
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    TopK.topKPerGroupByDouble(rescored, "query_id", col("cos"), col("neighbor_id"), k)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"),
        col("ord").as("cos"), col("rank"))
  }

  /**
   * LSH-bucketed approximate top-k: corpus and queries are both bucketed by
   * [[VectorKit.rhpBucket]]; candidates = same-bucket rows; exact cosine +
   * top-k within candidates. Recall is tunable via `nBits` (fewer bits →
   * bigger buckets → higher recall, more compute) and `nTables`
   * (OR-amplification: a candidate needs to collide in ANY of the
   * independent hyperplane families — each extra table adds ~2^-nBits of
   * the corpus to the probe set and multiplies the miss probability by
   * (1 - p^nBits)). Candidates are deduped before ranking so a pair
   * colliding in several tables is scored once.
   */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
      nTables: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def bucketed(df: DataFrame, id: String, out: String, v: String): DataFrame =
      df.select(col(idCol).as(out), col(vecCol).as(v),
        posexplode(array((0 until nTables).map(t =>
          VectorKit.rhpBucket(col(vecCol), nBits, t)): _*)).as(Seq("tbl", "bucket")))
    val c = bucketed(corpus, idCol, "neighbor_id", "cv")
    val q = bucketed(queries, idCol, "query_id", "qv")
    val cands = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select("query_id", "neighbor_id", "cv", "qv")
    val deduped = if (nTables == 1) cands else cands.distinct()
    val scored = deduped
      .withColumn("cos", VectorKit.cosine(col("cv"), col("qv")))
    // k-bounded partial-agg ranking: an LSH bucket can be hot (boilerplate
    // embeddings collapsing to one hyperplane signature), so per-query
    // candidate volume is unbounded — the aggregator keeps it O(k)
    TopK.topKPerGroupByDouble(scored, "query_id", col("cos"), col("neighbor_id"), k)
      .select(col("group").as("query_id"), col("payload").as("neighbor_id"),
        col("ord").as("cos"), col("rank"))
  }

  /**
   * Deterministic negative sampling for contrastive training: `k`
   * pseudo-random partners per anchor, reproducible across runs, engines,
   * and parallelism — the mined-negatives table every embedding-training
   * pipeline materializes next to its positives. Ids must be DENSE
   * `0 until total` (the testdata shape; densify once with zipWithIndex
   * otherwise): partner(anchor, j) = (anchor·2654435761 + j·40503 + seed)
   * mod total, shifted off the anchor itself by +1 — pure integer
   * arithmetic, so the "random" pairing is replayable in any SQL engine
   * (no RNG state, no order dependence; same portability contract as
   * [[Graph.pageRank]]).
   *
   * Scale posture: one explode (k rows per anchor) and one hash join back
   * to the corpus on the computed partner id. No shuffle depends on k·n
   * beyond that join; anchors with 10⁸ rows cost 10⁸·k join rows — the
   * output size, which is the floor. (Overflow: anchor·2654435761 needs
   * anchor < ~3.5·10⁹ under ANSI long arithmetic; densified ids satisfy
   * this far past 100 TB corpus sizes.)
   */
  def contrastiveNegatives(anchors: DataFrame, corpus: DataFrame,
      idCol: String, total: Long, k: Int, seed: Long = 0L): DataFrame = {
    require(k >= 1 && total >= 2)
    val cand = anchors.select(col(idCol).cast("long").as("anchor"))
      .select(col("anchor"), explode(sequence(lit(1), lit(k))).as("j"))
      .withColumn("__p", pmod(
        col("anchor") * lit(2654435761L) + col("j") * lit(40503L) + lit(seed),
        lit(total)))
      .withColumn("partner",
        when(col("__p") === col("anchor"), pmod(col("__p") + 1L, lit(total)))
          .otherwise(col("__p")))
      .drop("__p")
    // existence join against the CORPUS (dense ids make it total, but a
    // filtered corpus still yields only real partners)
    cand.join(corpus.select(col(idCol).cast("long").as("partner")), "partner")
      .select(col("anchor"), col("j"), col("partner"))
  }

  /**
   * k-nearest-neighbor classification: each query vector takes the
   * majority label of its k nearest labeled corpus vectors by cosine
   * (ties: most votes first, then the nearer top neighbor is irrelevant —
   * smallest label wins, fully deterministic). The neighbor source is
   * PLUGGABLE: by default [[bruteForceTopK]] (exact, k-bounded partial-agg
   * ranking), but any (corpus, queries, k) → (query_id, neighbor_id, …)
   * searcher drops in — pass `(c, q, kk) => Similarity.lshTopK(c, q, kk,
   * nBits, nTables, idCol, vecCol)` or an [[ivfTopK]]/[[ivfPqTopK]]
   * closure to trade exactness for the ANN scale path without touching
   * the voting logic.
   *
   * The vote-ranking windows partition by query_id over at most k rows
   * per query (one per distinct neighbor label) — bounded by construction,
   * no corpus-sized partition anywhere.
   *
   * Output: (query_id, pred_label, votes, n_neighbors).
   */
  def knnClassify(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label",
      neighborSource: Option[(DataFrame, DataFrame, Int) => DataFrame] = None): DataFrame = {
    val search = neighborSource.getOrElse(
      (c: DataFrame, q: DataFrame, kk: Int) => bruteForceTopK(c, q, kk, idCol, vecCol))
    val labels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__lbl"))
    val votes = search(corpus, queries, k)
      .join(labels, Seq("neighbor_id"))
      .groupBy(col("query_id"), col("__lbl"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("__lbl"))
    votes.withColumn("__rk", row_number().over(w))
      .withColumn("__nn", sum(col("votes"))
        .over(Window.partitionBy(col("query_id"))))
      .filter(col("__rk") === 1)
      .select(col("query_id"), col("__lbl").as("pred_label"), col("votes"),
        col("__nn").as("n_neighbors"))
  }

  /**
   * Nearest-centroid (Rocchio) classification: one centroid per label —
   * the per-dimension mean over QUANTIZED components (round(x·quantScale)
   * as long), so the distributed sums are exact integers and the centroid
   * is bit-identical regardless of partitioning/order (a raw float mean
   * would be order-dependent) — then each query takes the label of the
   * highest-cosine centroid (ties → smallest label).
   *
   * Scale: centroid build is one posexplode + one (label,dim) aggregate
   * (map-side combined; output is labels×dims rows — KBs); the model
   * table is broadcast so classification is a scan-side map with no
   * shuffle of the query side. The classic cheap-and-strong baseline
   * before kNN.
   *
   * Output: (query_id, pred_label, cos).
   */
  def nearestCentroidClassify(corpus: DataFrame, queries: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding",
      labelCol: String = "label", quantScale: Double = 1e6): DataFrame = {
    val comp = corpus
      .select(col(labelCol).as("label"),
        posexplode(VectorKit.asDouble(col(vecCol))).as(Seq("pos", "x")))
      .select(col("label"), col("pos"),
        round(col("x") * lit(quantScale), 0).cast("long").as("q"))
    val dims = comp.groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("m"))
    val centroids = dims.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("label"))
    q.crossJoin(broadcast(centroids))
      .withColumn("cos", VectorKit.cosine(col("qv"), col("cv")))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("cos"))
  }
}
