package graft.sources

import org.apache.spark.sql.{Column, DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout management: hive-partitioned writes with bounded file sizes,
 * and the read-side proof that the layout pays off (partition pruning).
 *
 * At 100 TB the table LAYOUT is the first-order performance decision — a
 * date/key-partitioned corpus turns "scan everything and filter" into
 * "never open the irrelevant 99%" (the reference leans on the same idea
 * with its date-directory GCS layout and existence-pruned path lists,
 * mediation/MediationService.scala:274-303; Spark's hive-style
 * `partitionBy` is the engine-native version, with pruning planned from
 * the filter instead of hand-built path lists).
 */
object Layout {

  /**
   * Write `df` hive-partitioned by `partitionCols` with at most
   * `maxRecordsPerFile` rows per file. The pre-shuffle `repartition` on the
   * partition columns routes each output partition's rows to one task
   * (without it, EVERY task holding a few rows of every partition emits one
   * small file per partition — the classic small-files explosion:
   * tasks × partitions files); `maxRecordsPerFile` then re-splits oversized
   * partitions so a hot date cannot produce a single multi-GB file. AQE
   * coalesces the shuffle's empty/small slots, so partition count stays
   * bounded by the data, not by `spark.sql.shuffle.partitions`.
   */
  def writePartitioned(df: DataFrame, dir: String, partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit = {
    df.repartition(partitionCols.map(col): _*)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(dir)
  }

  /** Read back a partitioned layout. Partition-column filters on the result
    * prune directories at PLANNING time (visible as `PartitionFilters` in
    * the scan node — asserted in `LayoutSpec`). */
  def readPartitioned(spark: SparkSession, dir: String): DataFrame = {
    Tables.configure(spark)
    spark.read.parquet(dir)
  }

  /**
   * Number of live data files under a layout — the small-files health
   * metric a compaction job watches. Driver-side Hadoop-FS metadata walk
   * (like [[Tables.existingPaths]]), no data scan.
   */
  def dataFileCount(spark: SparkSession, dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    val it = fs.listFiles(root, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) n += 1
    }
    n
  }

  /**
   * 2-D Z-order (Morton) value of two non-negative keys, interleaving the
   * low 16 bits of each: bit i of `x` lands at result bit 2i, bit i of `y`
   * at 2i+1 — the classic magic-number spread, as pure codegen'd integer
   * expressions (shift/mask only; no UDF, no loop). Sorting a table by this
   * value clusters rows that are close in BOTH dimensions, which is what
   * makes multi-column min/max data skipping effective: hive partitioning
   * prunes on ONE directory key, Z-order clustering prunes row groups on
   * two filter columns at once.
   */
  def zValue2(x: Column, y: Column): Column = {
    def spread(v: Column): Column = {
      val v0 = v.cast("long").bitwiseAND(lit(0xFFFFL))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /**
   * Write `df` Z-order-clustered on `(xCol, yCol)` into `numFiles`
   * range-partitioned files: rows are routed by range over the Morton value
   * (so each file owns a contiguous Z-range ⇒ tight per-file/per-row-group
   * min/max on BOTH source columns), sorted within partitions so row groups
   * inside a file are tight too, then the helper column is dropped before
   * the write. A box predicate on the two columns then prunes most row
   * groups at scan time — the lakehouse-standard layout optimization for
   * the two-hot-filter-columns table where hive partitioning can only serve
   * one of them. Proven by executed-scan metrics in `LayoutSpec`.
   */
  def writeZOrdered(df: DataFrame, dir: String, xCol: String, yCol: String,
      numFiles: Int): Unit = {
    df.withColumn("__z", zValue2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }

  /**
   * N-column clustering value for `df`, distribution-free: each NUMERIC
   * column is first mapped to its quantile-bucket id (boundaries from ONE
   * `approxQuantile` pass over all columns together; binary-searched per
   * row by the native [[graft.functions.QuantileBucket]]), non-numeric
   * columns hash into the same id range (`xxhash64 & mask` — equality
   * predicates still prune, range predicates cannot on a hash, same
   * trade-off Delta makes for non-orderable types). The ids then Morton-
   * interleave via the native [[graft.functions.ZValueN]].
   *
   * Bucketing first is what makes z-ordering WORK at 100 TB: raw-value
   * interleaves ([[zValue2]]) assume small uniform domains — a skewed or
   * large-domain column aliases into a handful of bit patterns and the
   * interleave degenerates to a sort on the other columns. Quantile ids
   * are near-uniform by construction regardless of distribution (Delta's
   * range-partition-id trick), so every column contributes real bits.
   */
  def clusteredZValue(df: DataFrame, cols: Seq[String], bits: Int = 10): Column = {
    val b = clusterBits(cols.size, bits)
    clusteredZValueWith(cols, clusterBounds(df, cols, b), b)
  }

  /** Per-column interleave width that fits a non-negative long:
    * min(requested, 63/nCols). 2 cols keep the requested 10 bits; 7–8
    * cols shrink to 9 and 7 — coarser buckets per column, but every
    * column still contributes real bits (the alternative, rejecting wide
    * clusterBy at write time, bricks a table whose property was already
    * accepted). [[graft.functions.ZValueN]] caps at 8 columns. */
  def clusterBits(nCols: Int, requested: Int = 10): Int = {
    require(nCols >= 2 && nCols <= 8, s"clustering supports 2..8 columns, got $nCols")
    math.min(requested, 63 / nCols)
  }

  /** The quantile boundaries for the NUMERIC subset of `cols` — ONE
    * `approxQuantile` pass over `df`. Persist these (the lake stores them
    * in the zorder commit) and every later incremental cluster or append
    * buckets with the SAME boundaries: generations align in z-space and
    * no further quantile pass is paid per batch. */
  /** Per-column cluster-bucket boundaries, plus — for STRING columns —
    * the column-wide common PREFIX their numeric proxy values were
    * computed after (presence in `prefixes` marks a string column).
    * Both halves must travel together: bucketing a later batch with the
    * boundaries but a different prefix would misalign generations.
    *
    * The prefix is stored as the STRING itself, not a length: later
    * batches whose values no longer share it (key-domain drift — a
    * "2024-…" table crossing into 2025) must NOT strip a fixed number
    * of characters, because stripping k chars from a value outside the
    * prefix reverses order ("2025-01" stripped of 6 loses to "2024-09"
    * stripped of 6). [[clusteredZValueWith]] compares against the
    * stored prefix and CLAMPS non-sharing values to the edge bucket on
    * the right side — monotone by construction, and exactly what a
    * frozen boundary set can say about out-of-range keys (numeric
    * columns clamp at their min/max boundaries the same way). Query
    * results are unaffected either way (footer stats stay exact);
    * this guards layout/pruning quality only, until the next full
    * OPTIMIZE refreshes bounds. */
  final case class ClusterBounds(cols: Map[String, Array[Double]],
      prefixes: Map[String, String]) {
    def isEmpty: Boolean = cols.isEmpty
  }

  /** Tie granularity of the 6-bytes-after-prefix proxy, assessed
    * (r13): the feared degradation — sub-second string timestamps
    * within one day collapsing to coarse buckets — does NOT occur,
    * because the column-wide min/max common prefix absorbs every
    * globally-shared head (the date, zero padding of fixed-width
    * numerics) and the 6-byte window then lands on the
    * highest-variance bytes (HH:MM: for a one-day domain — minute
    * resolution). Spec'd: ZValueSpec "string-timestamp tie
    * granularity" pins an hour predicate pruning a one-day sub-second
    * domain. A residual tie needs >6 bytes of content shared between
    * NEIGHBORS but not globally (min/max differing early while the
    * mass ties later) — a distribution shape we have no real workload
    * for; segment-wise bucketing was considered and rejected as
    * complexity without a demonstrated profile. */

  /** Longest common prefix by CODE POINT (not UTF-16 unit): a
    * char-wise zip can split a surrogate pair, and the skip is applied
    * with Spark `substr`, which counts code points — mixing the two
    * units misaligns for supplementary characters. */
  private[graft] def commonPrefixCp(a: String, b: String): String = {
    val ai = a.codePoints().toArray; val bi = b.codePoints().toArray
    val n = ai.iterator.zip(bi.iterator).takeWhile { case (x, y) => x == y }.size
    new String(ai, 0, n)
  }

  def clusterBounds(df: DataFrame, cols: Seq[String],
      bits: Int = 10): ClusterBounds = {
    require(cols.size >= 2, "clustering needs at least two columns")
    val k = 1 << bits
    // STRING columns range-bucket too: strip the column-wide common
    // prefix (exact from min/max — every value binary-between two
    // strings sharing a prefix shares it), then take the monotone
    // 6-byte UTF-8 prefix proxy ([[graft.functions.Utf8PrefixLong]],
    // exact in a double). Without the strip, realistic keys with long
    // shared heads — ISO dates ("2024-0…"), URL hosts — collapse to a
    // handful of proxy values and the column stops contributing bits. A
    // clusterBy on a string date column then yields tight per-file
    // string footer envelopes, so RANGE predicates on the string prune
    // files; the hash fallback (all other types) only serves equality.
    val strings = cols.filter(c =>
      df.schema(c).dataType == org.apache.spark.sql.types.StringType)
    val prefixes: Map[String, String] =
      if (strings.isEmpty) Map.empty
      else {
        val mm = df.agg(
          strings.flatMap(c => Seq(min(col(c)).cast("string"),
            max(col(c)).cast("string"))).head,
          strings.flatMap(c => Seq(min(col(c)).cast("string"),
            max(col(c)).cast("string"))).tail: _*).head()
        strings.zipWithIndex.map { case (c, i) =>
          val mn = mm.getString(2 * i); val mx = mm.getString(2 * i + 1)
          val p = if (mn == null || mx == null) "" else commonPrefixCp(mn, mx)
          c -> p
        }.toMap
      }
    def proxy(c: String): Column =
      graft.functions.ZValueKit.utf8PrefixLong(
        col(c).substr(lit(prefixes(c).codePointCount(0, prefixes(c).length) + 1),
          lit(Int.MaxValue)))
    val bucketable = cols.filter(c => prefixes.contains(c) ||
      df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    if (bucketable.isEmpty) ClusterBounds(Map.empty, Map.empty)
    else {
      val probs = (1 until k).map(_.toDouble / k).toArray
      val casted = df.select(bucketable.map { c =>
        val base = if (prefixes.contains(c)) proxy(c) else col(c)
        base.cast("double").as(c)
      }: _*)
      ClusterBounds(
        bucketable.zip(casted.stat.approxQuantile(bucketable.toArray, probs, 0.001))
          .map { case (c, b) => c -> b.distinct }.toMap,
        prefixes.filter { case (c, _) => bucketable.contains(c) })
    }
  }

  /** The interleave from PRECOMPUTED boundaries: columns present in
    * `bounds` bucket by binary search (strings through the stripped
    * prefix proxy), everything else hashes into the same id range. */
  def clusteredZValueWith(cols: Seq[String], bounds: ClusterBounds,
      bits: Int = 10): Column = {
    require(cols.size >= 2, "clustering needs at least two columns")
    val k = 1 << bits
    val ids = cols.map { c =>
      bounds.cols.get(c) match {
        case Some(b) if b.nonEmpty =>
          bounds.prefixes.get(c) match {
            case Some(p) if p.nonEmpty =>
              // prefix-drift guard: only values that still SHARE the
              // stored prefix strip-and-bucket (monotone within the
              // prefix); drifted values clamp to the matching edge
              // bucket instead of mis-bucketing through a reversed
              // proxy. NULLs take the proxy path (utf8PrefixLong is
              // null-safe) exactly as at bounds-computation time.
              val stripped = graft.functions.ZValueKit.utf8PrefixLong(
                col(c).substr(lit(p.codePointCount(0, p.length) + 1),
                  lit(Int.MaxValue)))
              val in = graft.functions.ZValueKit.quantileBucket(
                stripped, b.toIndexedSeq)
              when(col(c).isNull || col(c).startsWith(p), in)
                .when(col(c) < lit(p), lit(0L))
                .otherwise(lit(b.length.toLong))
            case Some(_) => // all-distinct-from-the-first-char domain
              graft.functions.ZValueKit.quantileBucket(
                graft.functions.ZValueKit.utf8PrefixLong(col(c)),
                b.toIndexedSeq)
            case None =>
              graft.functions.ZValueKit.quantileBucket(col(c), b.toIndexedSeq)
          }
        case _ => xxhash64(col(c)).bitwiseAND(lit((k - 1).toLong))
      }
    }
    graft.functions.ZValueKit.zValueN(ids, bits)
  }

  /**
   * Compact a partitioned layout in place-adjacent fashion: read, re-route
   * one task per partition, rewrite to `outDir` with the same partition
   * scheme. The cure for a layout that accumulated small files through
   * many incremental appends (the streaming-ingest case).
   */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    writePartitioned(readPartitioned(spark, inDir), outDir, partitionCols,
      maxRecordsPerFile)

  /**
   * Per-file min/max/count stats manifest — the Delta/Iceberg-style
   * data-skipping index, as a plain DataFrame keyed by file path with
   * `n_rows`, `min_<c>`, `max_<c>` per stat column. One distributed scan
   * builds it (partial-agg'd groupBy on `input_file_name`); persist it next
   * to the table and incrementally append per ingested file. At 100 TB the
   * manifest is ~one row per file (KBs per PB of data) and replaces a full
   * scan with a metadata lookup for any range predicate on a clustered
   * column — the reason [[writeZOrdered]]/range-writes exist.
   */
  def statsManifest(spark: SparkSession, dir: String,
      statCols: Seq[String]): DataFrame = {
    Tables.configure(spark)
    val aggs = count(lit(1)).as("n_rows") +:
      statCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * File-skipping read: keep only the files whose `[min, max]` envelope for
   * `colName` can intersect the closed range `[lo, hi]`, then scan just
   * those (the residual row-level filter still applies — stats prune files,
   * they don't replace the predicate). The manifest is metadata-sized, so
   * the file-list materialization is a driver metadata operation exactly
   * like the FileIndex listing Spark itself performs on every read.
   * Returns (prunedScan, filesKept, filesTotal).
   */
  def skippingRead(spark: SparkSession, dir: String, manifest: DataFrame,
      colName: String, lo: Column, hi: Column): (DataFrame, Long, Long) = {
    val total = manifest.count()
    val kept = manifest
      .filter(col(s"max_$colName") >= lo && col(s"min_$colName") <= hi)
      .select("file").collect().map(_.getString(0))
    val scan =
      if (kept.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(kept: _*)
    (scan.filter(col(colName) >= lo && col(colName) <= hi), kept.length.toLong, total)
  }

  /**
   * Per-file BLOOM-FILTER manifest for point-lookup file skipping — the
   * companion to [[statsManifest]]: min/max envelopes prune RANGE
   * predicates but are useless for `key = v` lookups on a column the
   * layout is NOT sorted by (every file's envelope spans v). A per-file
   * bloom filter (`nBits` bits; `nHashes` deterministic positions per
   * value, derived `xxhash64(key, i) mod nBits`) prunes those instead —
   * the Delta/Iceberg bloom-index shape over plain parquet.
   *
   * The filter build is a bitwise-OR aggregate — commutative and
   * associative, so it partial-aggregates map-side and is bit-identical
   * under any partitioning. Stored SPARSE as a (wordIndex → 64-bit word)
   * map per file; manifest size ≤ files × nBits/8 bytes — metadata-scale
   * (the same class of object as the FileIndex Spark already keeps).
   *
   * Size `nBits` for the per-file distinct-key count: load factor
   * k·n/nBits ≈ 0.25 gives ~1.5% false-positive rate at k=3.
   */
  def bloomManifest(spark: SparkSession, dir: String, keyCol: String,
      nBits: Int = 1 << 20, nHashes: Int = 3): DataFrame = {
    require(nBits > 0 && nBits % 64 == 0, "nBits must be a positive multiple of 64")
    require(nHashes >= 1, "need at least one hash")
    Tables.configure(spark)
    val posCols = (0 until nHashes).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(nBits.toLong)))
    spark.read.parquet(dir)
      .select(input_file_name().as("file"),
        explode(array(posCols: _*)).as("pos"))
      .groupBy(col("file"), expr("pos div 64").cast("int").as("word"))
      .agg(expr("bit_or(shiftleft(1L, int(pos % 64)))").as("bits"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
        .as("bloom"))
  }

  /**
   * Point-lookup read through a [[bloomManifest]]: keep only the files
   * whose bloom has ALL probe bits set for `keyCol = value`, scan just
   * those, and re-apply the row-level predicate (blooms prune files — a
   * false positive costs one extra file scan, never a wrong row). The
   * probe positions are computed by the engine itself on a one-row plan,
   * so build and probe share the exact hash family by construction.
   * Returns (prunedScan, filesKept, filesTotal).
   */
  def bloomSkippingRead(spark: SparkSession, dir: String, manifest: DataFrame,
      keyCol: String, value: Column, nBits: Int = 1 << 20,
      nHashes: Int = 3): (DataFrame, Long, Long) = {
    val probeRow = spark.range(1).select((0 until nHashes).map(i =>
      pmod(xxhash64(value, lit(i)), lit(nBits.toLong)).as(s"p$i")): _*)
      .collect()(0)
    val hit = (0 until nHashes).map { i =>
      val p = probeRow.getLong(i)
      coalesce(element_at(col("bloom"), lit((p / 64).toInt)), lit(0L))
        .bitwiseAND(lit(1L << (p % 64).toInt)) =!= lit(0L)
    }.reduce(_ && _)
    val total = manifest.count()
    val kept = manifest.filter(hit).select("file").collect().map(_.getString(0))
    val scan =
      if (kept.isEmpty) spark.read.parquet(dir).limit(0)
      else spark.read.parquet(kept: _*)
    (scan.filter(col(keyCol) === value), kept.length.toLong, total)
  }

  /**
   * Dense 0..n−1 id assignment in the total order of `orderCols` — the
   * distributed zipWithIndex. The naive form (`row_number()` over an
   * unpartitioned window) funnels the whole table through ONE task; this
   * one never does: range-repartition on the order key, rank WITHIN each
   * partition (parallel windows), then shift each partition's ranks by the
   * exclusive prefix sum of partition counts — a #partitions-sized driver
   * array, broadcast back. Total cost: one range shuffle + two cheap
   * passes over a lineage-frozen snapshot (localCheckpoint, so the count
   * pass and the rank pass can't diverge).
   *
   * `orderCols` must be a TOTAL order (make it unique with a tiebreaker
   * column) — otherwise ids within a tie group are partition-placement-
   * dependent. Needed wherever dense ids are a contract:
   * [[graft.ops.Similarity.contrastiveNegatives]]' modular pairing, matrix
   * ids for embedding tables, shard-stable sample numbering.
   */
  def denseIds(df: DataFrame, orderCols: Seq[String], nParts: Int = 0,
      idName: String = "dense_id"): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val parts =
      if (nParts > 0) nParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val parted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parted.groupBy(col("__pid")).agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.init.zip(counts).map { case ((_, off), (pid, _)) => (pid, off) }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
    parted.join(broadcast(offDf), "__pid")
      .withColumn(idName, col("__off") + row_number().over(w) - 1L)
      .drop("__pid", "__off")
  }
}
