package graft.queries

import graft.functions.Kit
import graft.ops.{Asof, Integrity, Quality, Sampling}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multi-join decision-support analytics + deterministic sampling +
 * table-integrity queries (round-6 continuation surface).
 *
 * The first three are the classic TPC-H shapes (Q3/Q5/Q10) — they gate the
 * JOIN-HEAVY side of the engine: 3-to-6-table star joins where the plan
 * quality question (filter-before-join, dim broadcast vs shuffle, AQE join
 * re-selection) matters more than any single operator. Filters are applied
 * at the scan (pushdown-visible), tiny dims (`region`, `nation`) broadcast
 * explicitly, big-side joins left to AQE.
 *
 * Cross-engine conventions as in [[RelationalQueries]]: exact-integer money
 * (`*_c` cents), total ORDER BY with unique tie-breaks, identical aliases
 * both sides.
 */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── TPC-H Q3 shape: shipping-priority revenue of unshipped orders ───────
  // customer(segment) ⋈ orders(< date) ⋈ lineitem(> date), top-10 revenue.
  private val q3Shipping: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .filter(to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
    val l = Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) > lit(java.sql.Date.valueOf("1998-01-01")))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("orderdate"), col("o_orderpriority"))
      .agg(Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"))
      .orderBy(col("revenue_c").desc, col("l_orderkey"))
      .limit(10)
      .select(col("l_orderkey"), col("revenue_c"), col("orderdate"),
        col("o_orderpriority"))
  }
  private val q3ShippingSql =
    """SELECT l_orderkey,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS revenue_c,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |  AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
      |GROUP BY l_orderkey, orderdate, o_orderpriority
      |ORDER BY revenue_c DESC, l_orderkey LIMIT 10""".stripMargin

  // ── TPC-H Q5 shape: local-supplier volume per nation in one region ──────
  // 6-table star with the c_nationkey = s_nationkey "local" twist: the dim
  // chain region→nation is broadcast (KBs at any SF), the supplier join
  // carries the composite equi-key (l_suppkey, c_nationkey).
  private val q5LocalVolume: Q = (s, dir) => {
    val asiaNations = broadcast(
      Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
    val o = Tables.orders(s, dir)
      .filter(to_date(col("o_orderdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"),
        count(lit(1)).as("n"))
      .orderBy(col("revenue_c").desc, col("n_name"))
  }
  private val q5LocalVolumeSql =
    """SELECT n_name,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS revenue_c,
      |  count(*) AS n
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |GROUP BY n_name ORDER BY revenue_c DESC, n_name""".stripMargin

  // ── TPC-H Q10 shape: returned-item revenue per customer, one quarter ────
  private val q10Returns: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val o = Tables.orders(s, dir)
      .filter(to_date(col("o_orderdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1997-04-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val n = broadcast(Tables.nation(s, dir).select(col("n_nationkey"), col("n_name")))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"))
      .agg(min(col("c_name")).as("c_name"),
        Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_c"),
        Kit.cents(min(col("c_acctbal"))).as("acctbal_c"),
        min(col("n_name")).as("n_name"))
      .orderBy(col("revenue_c").desc, col("c_custkey"))
      .limit(20)
  }
  private val q10ReturnsSql =
    """SELECT c_custkey, min(c_name) AS c_name,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS revenue_c,
      |  CAST(round(min(c_acctbal)*100, 0) AS BIGINT) AS acctbal_c,
      |  min(n_name) AS n_name
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      |GROUP BY c_custkey
      |ORDER BY revenue_c DESC, c_custkey LIMIT 20""".stripMargin

  // ── Subquery decorrelation: EXISTS / correlated scalar / NOT IN ────────
  // The three classic correlated-subquery shapes (TPC-H Q4/Q17/Q16),
  // expressed as SQL so the gate covers Catalyst's decorrelation: EXISTS
  // becomes a left-semi join, the correlated scalar average becomes an
  // aggregate joined back on the correlation key, NOT IN becomes a
  // null-aware anti join — never a per-row re-execution of the inner query
  // (which at 100 TB would be a scan per outer row). Plan shapes pinned in
  // `test/spark/SubqueryDecorrelationSpec`.
  private val q4Exists: Q = (s, dir) => {
    Tables.orders(s, dir).createOrReplaceTempView("orders_q4")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q4")
    s.sql("""
      SELECT o_orderpriority, count(*) AS n
      FROM orders_q4
      WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
        AND EXISTS (SELECT 1 FROM lineitem_q4
                    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")
  }
  private val q4ExistsSql =
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(o_orderdate AS DATE) < DATE '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // l_quantity is integral in this testdata, so sum(quantity) is exact in
  // double at any scale and 0.2*avg is the same IEEE value on both engines
  // — the boundary comparison cannot flip between engines.
  private val q17CorrelatedScalar: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q17")
    Tables.part(s, dir).createOrReplaceTempView("part_q17")
    s.sql("""
      SELECT CAST(round(sum(l_extendedprice)*100, 0) AS BIGINT) AS total_c,
        count(*) AS n
      FROM lineitem_q17 JOIN part_q17 ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#1'
        AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem_q17 l2
                          WHERE l2.l_partkey = part_q17.p_partkey)""")
  }
  private val q17CorrelatedScalarSql =
    """SELECT CAST(round(sum(l_extendedprice)*100, 0) AS BIGINT) AS total_c,
      |  count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = part.p_partkey)""".stripMargin

  private val q16NotIn: Q = (s, dir) => {
    Tables.part(s, dir).createOrReplaceTempView("part_q16")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q16")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_q16")
    s.sql("""
      SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM part_q16 JOIN lineitem_q16 ON l_partkey = p_partkey
      WHERE p_size >= 30
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier_q16
                              WHERE s_acctbal < 0)
      GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand""")
  }
  private val q16NotInSql =
    """SELECT p_brand, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part JOIN lineitem ON l_partkey = p_partkey
      |WHERE p_size >= 30
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY p_brand ORDER BY supplier_cnt DESC, p_brand""".stripMargin

  // The Q21 shape — DOUBLE correlation on the same inner table (EXISTS +
  // NOT EXISTS over lineitem), the hardest of the classic decorrelation
  // cases: both subqueries decorrelate against the same fact, planned as a
  // semi join AND an anti join on l_orderkey (two passes over one shuffle
  // of lineitem keys, not a per-row rescan).
  private val q21Waiting: Q = (s, dir) => {
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_q21")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q21")
    Tables.orders(s, dir).createOrReplaceTempView("orders_q21")
    s.sql("""
      SELECT s_name, count(*) AS numwait
      FROM supplier_q21 JOIN lineitem_q21 l1 ON s_suppkey = l1.l_suppkey
      JOIN orders_q21 ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        AND EXISTS (SELECT 1 FROM lineitem_q21 l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem_q21 l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""")
  }
  private val q21WaitingSql =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin

  // The Q2 shape — correlated ARGMIN: rows selling at their part's minimum
  // price. Decorrelates to a per-part min aggregate joined back on the
  // correlation key; the double equality is engine-safe because both
  // engines compare the same stored IEEE values (min picks, never computes).
  private val q2MinSubquery: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q2")
    Tables.part(s, dir).createOrReplaceTempView("part_q2")
    s.sql("""
      SELECT p_partkey, CAST(round(l_extendedprice*100, 0) AS BIGINT) AS price_c,
        l_suppkey
      FROM lineitem_q2 JOIN part_q2 ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#2'
        AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem_q2 l2
                               WHERE l2.l_partkey = part_q2.p_partkey)
      ORDER BY p_partkey, l_suppkey""")
  }
  private val q2MinSubquerySql =
    """SELECT p_partkey, CAST(round(l_extendedprice*100, 0) AS BIGINT) AS price_c,
      |  l_suppkey
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#2'
      |  AND l_extendedprice = (SELECT min(l2.l_extendedprice) FROM lineitem l2
      |                         WHERE l2.l_partkey = part.p_partkey)
      |ORDER BY p_partkey, l_suppkey""".stripMargin

  // The Q22 shape — uncorrelated scalar average + NOT EXISTS: high-balance
  // customers with no recent orders. The balance compares in exact CENTS so
  // the average is an exact-integer-sum division — bit-identical across
  // engines and partitionings (a raw double avg is order-dependent and
  // could flip boundary rows between engines).
  private val q22NoOrders: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("customer_q22")
    Tables.orders(s, dir).createOrReplaceTempView("orders_q22")
    s.sql("""
      WITH c AS (
        SELECT c_custkey, CAST(round(c_acctbal*100, 0) AS BIGINT) AS bal_c
        FROM customer_q22
      )
      SELECT count(*) AS numcust, CAST(sum(bal_c) AS BIGINT) AS totbal_c
      FROM c
      WHERE bal_c > (SELECT avg(bal_c) FROM c c2 WHERE c2.bal_c > 0)
        AND NOT EXISTS (SELECT 1 FROM orders_q22 WHERE o_custkey = c_custkey
                        AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')""")
  }
  private val q22NoOrdersSql =
    """WITH c AS (
      |  SELECT c_custkey, CAST(round(c_acctbal*100, 0) AS BIGINT) AS bal_c
      |  FROM customer
      |)
      |SELECT count(*) AS numcust, CAST(sum(bal_c) AS BIGINT) AS totbal_c
      |FROM c
      |WHERE bal_c > (SELECT avg(bal_c) FROM c c2 WHERE c2.bal_c > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')""".stripMargin

  // ── Point-in-time (PIT) dimension probe: facts × SCD2 as-of ────────────
  // The warehouse "value as of T" join: SCD2 intervals built from the event
  // log (x_scd2), probed per fact at fact time. Implemented as a BACKWARD
  // AS-OF join on the interval STARTS — latest valid_from <= probe time IS
  // the covering interval, so no range join / interval explosion: one
  // merge-shaped window pass ([[Asof.joinBackward]]). Orders fold onto the
  // events' user and month ranges (deterministic remap, mirrored in the
  // oracle); the oracle replays through DuckDB's native ASOF LEFT JOIN —
  // an independent implementation of the same semantics.
  private val xPitJoin: Q = (s, dir) => {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        Kit.nanosToMillis("ts").as("ts_ms"))
    val iv = Quality.scd2Intervals(e, "user_id", "ts_ms", "event_id", "event_type")
      .select(col("user_id"), col("valid_from_ms").as("__rt"),
        col("value").as("value_asof"), col("valid_from_ms"))
    val probe = Tables.orders(s, dir)
      .select(col("o_orderkey"),
        (col("o_custkey") % 150).as("user_id"),
        (expr("unix_millis(cast(o_orderdate as timestamp))") % 2592000000L +
          lit(1704067200000L)).as("ts_ms"))
    Asof.joinBackward(probe, iv, "user_id", "ts_ms", "__rt")
      .select(col("o_orderkey"), col("user_id"), col("ts_ms"),
        // probes before the key's first interval have no covering version;
        // sentinel-coalesced so the gate compares exact ints/strings, never
        // engine-null representations
        coalesce(col("value_asof"), lit("(none)")).as("value_asof"),
        coalesce(col("valid_from_ms"), lit(-1L)).as("valid_from_ms"))
      .orderBy(col("o_orderkey"))
  }
  private val xPitJoinSql =
    """WITH iv AS MATERIALIZED (
      |  WITH e AS (
      |    SELECT user_id, event_id, event_type,
      |      epoch_ns(ts) // 1000000 AS ts_ms FROM events
      |  ), r AS (
      |    SELECT user_id, event_id, event_type, ts_ms,
      |      CASE WHEN lag(event_type) OVER w IS NULL
      |             OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
      |    FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
      |  ), s AS (
      |    SELECT user_id, event_type, ts_ms,
      |      sum(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |    FROM r
      |  )
      |  SELECT user_id, min(event_type) AS value, min(ts_ms) AS valid_from_ms
      |  FROM s GROUP BY user_id, run
      |), probe AS (
      |  SELECT o_orderkey, o_custkey % 150 AS user_id,
      |    epoch_ms(o_orderdate) % 2592000000 + 1704067200000 AS ts_ms
      |  FROM orders
      |)
      |SELECT p.o_orderkey, p.user_id, p.ts_ms,
      |  coalesce(iv.value, '(none)') AS value_asof,
      |  coalesce(iv.valid_from_ms, -1) AS valid_from_ms
      |FROM probe p ASOF LEFT JOIN iv
      |  ON p.user_id = iv.user_id AND p.ts_ms >= iv.valid_from_ms
      |ORDER BY o_orderkey""".stripMargin

  // ── Deterministic stratified sampling (pure filter, no shuffle) ─────────
  // Per-language corpus downsampling: en at ~50%, de at ~25%, the rest at
  // ~12.5% — the language-rebalancing step of a multilingual corpus build.
  private val xStratifiedSample: Q = (s, dir) => {
    Sampling.stratifiedByHash(Tables.documents(s, dir), "lang", "doc_id",
        Map("en" -> "8", "de" -> "4"), default = "2")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }
  private val xStratifiedSampleSql =
    """SELECT doc_id, lang FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <
      |  CASE lang WHEN 'en' THEN '8' WHEN 'de' THEN '4' ELSE '2' END
      |ORDER BY doc_id""".stripMargin

  // ── Deterministic bottom-k reservoir per group ─────────────────────────
  // 5 docs per language, selected by hashed priority through the k-bounded
  // aggregator (map-side collapse; no per-group sort). The oracle replays
  // the SAME priorities and ranks them with a window — the window IS the
  // quadratic-memory formulation the aggregator replaces.
  private val xReservoirSample: Q = (s, dir) => {
    Sampling.reservoirPerGroup(Tables.documents(s, dir), "lang", "doc_id", k = 5)
      .orderBy(col("lang"), col("rnk"))
  }
  private val xReservoirSampleSql =
    """WITH pr AS (
      |  SELECT lang, doc_id,
      |    ('0x' || substr(md5(lang || '|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS prio
      |  FROM documents
      |), rk AS (
      |  SELECT lang, doc_id, prio,
      |    row_number() OVER (PARTITION BY lang ORDER BY prio, doc_id) AS rnk
      |  FROM pr
      |)
      |SELECT lang, doc_id, prio, CAST(rnk AS INT) AS rnk FROM rk WHERE rnk <= 5
      |ORDER BY lang, rnk""".stripMargin

  // ── Order-independent replica checksum ─────────────────────────────────
  // 32-bucket fingerprint of lineitem over its full business key + two
  // value columns (quantity in cents — exact-integer, engine-portable).
  // One scan, 32 output rows; the anti-entropy primitive for comparing a
  // 100 TB table to its mirror without shuffling either.
  private val xTableChecksum: Q = (s, dir) => {
    val l = Tables.lineitem(s, dir)
    val sig = Integrity.rowSignature(col("l_orderkey"), col("l_linenumber"),
      Kit.cents(col("l_quantity")), col("l_returnflag"))
    Integrity.bucketSignature(l, col("l_orderkey") % 32, sig)
      .orderBy(col("bucket"))
  }
  private val xTableChecksumSql =
    """SELECT l_orderkey % 32 AS bucket, count(*) AS n_rows,
      |  bit_xor(('0x' || substr(md5(concat_ws(chr(1),
      |     coalesce(CAST(l_orderkey AS VARCHAR), chr(2)),
      |     coalesce(CAST(l_linenumber AS VARCHAR), chr(2)),
      |     coalesce(CAST(CAST(round(l_quantity*100, 0) AS BIGINT) AS VARCHAR), chr(2)),
      |     coalesce(l_returnflag, chr(2)))), 1, 15))::BIGINT) AS sig
      |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin

  // ── Storage-partitioned join through the bucketed DSv2 connector ───────
  // Both sides report KeyGroupedPartitioning(identity(bucket)) from storage
  // ([[graft.sources.v2.GraftBucketedSource]]); with v2 bucketing enabled
  // Catalyst aligns the reported partitions and plans the sort-merge join
  // with NO exchange on either side — the `no_shuffle` pin column records
  // that from the executed plan, and the oracle replays the join itself
  // (connector content is pure id arithmetic). requireAllClusterKeys=false
  // lets the partition keys be a SUBSET of the join keys (bucket ⊂
  // {bucket, doc_id}) — the realistic shape: tables bucketed by a key
  // prefix, joined on the full key. The merge hint (not a conf) keeps the
  // plan a sort-merge join so the pin measures SPJ, not broadcast.
  /** Save/restore session confs around `f` — gate queries must not leak
    * session state into whichever query the harness runs next (plans and
    * bench numbers would become order-dependent). Mirrors the test-side
    * GraftBucketedSourceSpec.withConfs. */
  private def withConfs[T](s: SparkSession, confs: (String, String)*)(f: => T): T = {
    val saved = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  private val xSpjJoin: Q = (s, dir) => withConfs(s,
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.requireAllClusterKeysForCoPartition" -> "false") {
    def side(rows: Int) = s.read.format("graft.sources.v2.GraftBucketedSource")
      .option("rows", rows.toString).option("buckets", "8").load()
    val a = side(20000)
    val b = side(12000).withColumnRenamed("v", "v2")
    val j = a.hint("merge").join(b, Seq("bucket", "doc_id"))
    val noShuffle = !j.queryExecution.executedPlan.toString.contains("Exchange")
    val out = j.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("v") + col("v2")).as("sum_v"))
      .select(col("bucket"), col("n"), col("sum_v"), lit(noShuffle).as("no_shuffle"))
      .orderBy(col("bucket"))
    // force physical planning while the SPJ confs are still set: the
    // QueryExecution caches its executedPlan, so the returned frame keeps
    // the exchange-free plan after the confs are restored
    out.queryExecution.executedPlan
    out
  }
  private val xSpjJoinSql =
    """WITH a AS (
      |  SELECT i AS doc_id, i % 8 AS bucket, (i*31) % 1000 AS v
      |  FROM range(0, 20000) t(i)
      |), b AS (
      |  SELECT i AS doc_id, i % 8 AS bucket, (i*31) % 1000 AS v2
      |  FROM range(0, 12000) t(i)
      |)
      |SELECT a.bucket AS bucket, count(*) AS n,
      |  CAST(sum(a.v + b.v2) AS BIGINT) AS sum_v, true AS no_shuffle
      |FROM a JOIN b ON a.bucket = b.bucket AND a.doc_id = b.doc_id
      |GROUP BY a.bucket ORDER BY a.bucket""".stripMargin

  // ── SQL-addressable connector tables through the DSv2 catalog ──────────
  // The catalog rung of the DSv2 ladder: `graft.docs_<rows>` resolves by
  // NAME in plain SQL ([[graft.sources.v2.GraftCatalog]]), with all the
  // table's pushdowns intact — the doc_id filter below still tightens the
  // generated range inside the scan on the SQL path. Content is id
  // arithmetic, so DuckDB replays the whole query.
  private val s10CatalogSql_ : Q = (s, dir) => withConfs(s,
    "spark.sql.catalog.graft" -> "graft.sources.v2.GraftCatalog") {
    val out = s.sql("""
      SELECT lang, count(*) AS n, sum(length(text)) AS chars
      FROM graft.docs_5000
      WHERE doc_id >= 500 AND doc_id < 3000
      GROUP BY lang ORDER BY lang""")
    // resolution AND planning complete while the catalog is registered;
    // the restored session no longer carries the registration
    out.queryExecution.executedPlan
    out
  }
  private val s10CatalogSqlSql =
    """WITH d AS (
      |  SELECT i AS doc_id,
      |    ['en','de','fr','es','pt'][CAST(i % 5 AS INT) + 1] AS lang,
      |    'tok' || CAST(i % 97 AS VARCHAR) || ' tok'
      |      || CAST((i * 7) % 89 AS VARCHAR) || ' tok'
      |      || CAST((i * 13) % 83 AS VARCHAR) AS text
      |  FROM range(500, 3000) t(i)
      |)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(length(text)) AS BIGINT) AS chars
      |FROM d GROUP BY lang ORDER BY lang""".stripMargin

  // ── The runnable log bus, oracle-gated (S1/S2/K3 storage model) ────────
  // Publish 5,000 deterministic frames to an 8-partition topic from ONE
  // ordered producer task (so record offsets are a pure function of the
  // data: offset = id div 8 within partition id mod 8), then batch-read the
  // log back and verify, per partition: record count, id sum, and that
  // EVERY record sits at its predicted offset (`offset_exact`). DuckDB
  // replays the whole thing as arithmetic — the bus's framing, segment
  // commit, and offset accounting are what's actually under test.
  private val s11LogBus: Q = (s, dir) => {
    val fmt = "graft.sources.v2.GraftLogBusSource"
    val root = java.nio.file.Files.createTempDirectory("busgate").toString
    val pub = s.range(0, 5000)
      .select((col("id") % 8).cast("int").as("partition"),
        col("id").cast("string").cast("binary").as("value"))
      .orderBy(col("id")).coalesce(1)
    pub.write.format(fmt).option("root", root).option("topic", "gate")
      .option("partitions", "8").mode("append").save()
    s.read.format(fmt).option("root", root).option("topic", "gate")
      .option("partitions", "8").load()
      .select(col("partition"), col("offset"),
        col("value").cast("string").cast("long").as("id"))
      .groupBy(col("partition"))
      .agg(count(lit(1)).as("n"), sum(col("id")).as("sum_ids"),
        (sum(when(col("offset") === expr("id div 8"), 0L).otherwise(1L)) === 0)
          .as("offset_exact"))
      .orderBy(col("partition"))
  }
  private val s11LogBusSql =
    """WITH pub AS (
      |  SELECT i AS id, CAST(i % 8 AS INT) AS partition, i // 8 AS off
      |  FROM range(0, 5000) t(i)
      |)
      |SELECT partition, count(*) AS n, CAST(sum(id) AS BIGINT) AS sum_ids,
      |  true AS offset_exact
      |FROM pub GROUP BY partition ORDER BY partition""".stripMargin

  // ── S5: typed external-table-service scan, oracle-gated ────────────────
  // The storage-read-API shape: the connector sends projection + range
  // pushdown OVER THE WIRE and reassembles 4 parallel Avro streams; the
  // served table is id arithmetic, so DuckDB replays the CONTENT and the
  // gate checks the protocol (framing, striping, schema negotiation).
  // The server is the JVM-lifetime shared instance (daemon threads) —
  // DataFrames are lazy, so a per-query server would be gone by the time
  // the driver's write action executes the scan.
  private val s12TableService: Q = (s, dir) => {
    val srv = graft.sources.v2.GraftTableService.shared
    s.read.format("graft.sources.v2.GraftServiceSource")
      .option("host", "127.0.0.1").option("port", srv.port.toString)
      .option("slices", "4").load()
      .filter(col("doc_id") >= 2000L && col("doc_id") < 12000L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("score")).as("sum_score"),
        sum(col("doc_id")).as("sum_ids"))
      .orderBy(col("lang"))
  }
  private val s12TableServiceSql =
    """WITH t AS (
      |  SELECT i AS doc_id,
      |    ['en','de','fr','es','pt'][CAST(i % 5 AS INT) + 1] AS lang,
      |    (i*31) % 1000 AS score
      |  FROM range(2000, 12000) x(i)
      |)
      |SELECT lang, count(*) AS n, CAST(sum(score) AS BIGINT) AS sum_score,
      |  CAST(sum(doc_id) AS BIGINT) AS sum_ids
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  val all: Map[String, Q] = Map(
    "x_spj_join" -> xSpjJoin,
    "s10_catalog_sql" -> s10CatalogSql_,
    "s11_log_bus" -> s11LogBus,
    "s12_table_service" -> s12TableService,
    "q3_shipping" -> q3Shipping,
    "q5_local_volume" -> q5LocalVolume,
    "q10_returns" -> q10Returns,
    "q4_exists" -> q4Exists,
    "q17_correlated_scalar" -> q17CorrelatedScalar,
    "q16_not_in" -> q16NotIn,
    "q21_waiting" -> q21Waiting,
    "q2_min_subquery" -> q2MinSubquery,
    "q22_no_orders" -> q22NoOrders,
    "x_pit_join" -> xPitJoin,
    "x_stratified_sample" -> xStratifiedSample,
    "x_reservoir_sample" -> xReservoirSample,
    "x_table_checksum" -> xTableChecksum)

  val oracles: Map[String, String] = Map(
    "x_spj_join" -> xSpjJoinSql,
    "s10_catalog_sql" -> s10CatalogSqlSql,
    "s11_log_bus" -> s11LogBusSql,
    "s12_table_service" -> s12TableServiceSql,
    "q3_shipping" -> q3ShippingSql,
    "q5_local_volume" -> q5LocalVolumeSql,
    "q10_returns" -> q10ReturnsSql,
    "q4_exists" -> q4ExistsSql,
    "q17_correlated_scalar" -> q17CorrelatedScalarSql,
    "q16_not_in" -> q16NotInSql,
    "q21_waiting" -> q21WaitingSql,
    "q2_min_subquery" -> q2MinSubquerySql,
    "q22_no_orders" -> q22NoOrdersSql,
    "x_pit_join" -> xPitJoinSql,
    "x_stratified_sample" -> xStratifiedSampleSql,
    "x_reservoir_sample" -> xReservoirSampleSql,
    "x_table_checksum" -> xTableChecksumSql)
}
