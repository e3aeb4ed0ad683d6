package graft.queries

import graft.functions.Kit
import graft.ops.{Dedup, Lookup, Routing}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Relational operator inventory (SURVEY §2.1-2.8) as oracle-checked queries.
 *
 * Cross-engine compare conventions (driver hashes Spark parquet vs DuckDB):
 *  - every column aliased identically on both sides;
 *  - total ORDER BY with a unique tie-break;
 *  - float aggregates quantized to exact integers (`*_c` cents, `*_bps`
 *    basis points) via round→cast so no double-ulp can flip the hash;
 *  - event time handled as epoch-millis longs derived with integer `div`
 *    from the raw nano longs (`epoch_ns(ts) // 1000000` on the DuckDB side).
 */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── A1/§2.7 + S3: scan → filter → hash agg (TPC-H Q1 shape) ─────────────
  private val q1Agg: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) <= lit(java.sql.Date.valueOf("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Kit.cents(sum(col("l_quantity"))).as("sum_qty_c"),
        Kit.cents(sum(col("l_extendedprice"))).as("sum_base_c"),
        Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_c"),
        Kit.bps(avg(col("l_discount"))).as("avg_disc_bps"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q1AggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(l_quantity)*100, 0) AS BIGINT) AS sum_qty_c,
      |  CAST(round(sum(l_extendedprice)*100, 0) AS BIGINT) AS sum_base_c,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS sum_disc_c,
      |  CAST(round(avg(l_discount)*10000, 0) AS BIGINT) AS avg_disc_bps,
      |  count(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ── S4/J3: multi-path union scan → agg ──────────────────────────────────
  private val s4Union: Q = (s, dir) => {
    val o = Tables.orders(s, dir)
    val cut = lit(java.sql.Date.valueOf("1995-01-01"))
    val early = o.filter(to_date(col("o_orderdate")) < cut)
    val late = o.filter(to_date(col("o_orderdate")) >= cut)
    early.unionByName(late)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Kit.cents(sum(col("o_totalprice"))).as("total_c"))
      .orderBy(col("o_orderstatus"))
  }
  private val s4UnionSql =
    """SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(sum(o_totalprice)*100, 0) AS BIGINT) AS total_c
      |FROM (
      |  SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1995-01-01'
      |  UNION ALL
      |  SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1995-01-01'
      |)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  // ── P1/U1: idempotent-key extraction ────────────────────────────────────
  private val p1Key: Q = (s, dir) => {
    Tables.events(s, dir)
      .select(col("event_id"),
        Kit.idempotentKey(col("event_type"), col("user_id").cast("string"))
          .as("idempotent_key"))
      .orderBy(col("event_id"))
  }
  private val p1KeySql =
    """SELECT event_id,
      |  coalesce(event_type, 'null') || '-' || coalesce(CAST(user_id AS VARCHAR), 'null') AS idempotent_key
      |FROM events ORDER BY event_id""".stripMargin

  // ── F1/F2: validity predicate + OK/KO routing ───────────────────────────
  private val f2Route: Q = (s, dir) => {
    val e = Tables.events(s, dir)
    // synthesize the reference's nullable-field validity check: 'error'
    // rows act as the records with a missing mandatory field
    val valid = Kit.isValidBer(
      nullif(col("event_type"), lit("error")), col("event_id"), col("user_id"))
    Routing.tagRoute(e, valid)
      .groupBy(col("route"))
      .agg(count(lit(1)).as("n"), Kit.cents(sum(col("value"))).as("value_c"))
      .orderBy(col("route"))
  }
  private val f2RouteSql =
    """SELECT CASE WHEN nullif(event_type, 'error') IS NOT NULL
      |            AND event_id IS NOT NULL AND user_id IS NOT NULL
      |       THEN 'OK' ELSE 'KO' END AS route,
      |  count(*) AS n,
      |  CAST(round(sum(value)*100, 0) AS BIGINT) AS value_c
      |FROM events GROUP BY 1 ORDER BY route""".stripMargin

  // ── F5/U12: business-calendar filter ────────────────────────────────────
  private val f5Weekend: Q = (s, dir) => {
    Tables.orders(s, dir)
      .filter(Kit.isBusinessDay(col("o_orderdate")))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("month"))
  }
  private val f5WeekendSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n
      |FROM orders
      |WHERE NOT (dayofweek(o_orderdate) = 0)
      |  AND NOT (dayofweek(o_orderdate) = 6 AND month(o_orderdate) BETWEEN 5 AND 9)
      |GROUP BY 1 ORDER BY month""".stripMargin

  // ── F6: deterministic top-n (limit after total order) ───────────────────
  private val f6TopN: Q = (s, dir) => {
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(25)
      .select(col("o_orderkey"), col("o_custkey"), Kit.cents(col("o_totalprice")).as("price_c"))
  }
  private val f6TopNSql =
    """SELECT o_orderkey, o_custkey,
      |  CAST(round(o_totalprice*100, 0) AS BIGINT) AS price_c
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ── D1: exact dedup by key, deterministic winner ────────────────────────
  private val d1Dedup: Q = (s, dir) => {
    val e = Tables.events(s, dir).withColumn("ts_ms", Kit.nanosToMillis("ts"))
    Dedup.exactDedup(e, Seq("user_id", "event_type"), Seq("ts_ms", "event_id"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts_ms"))
      .orderBy(col("event_id"))
  }
  private val d1DedupSql =
    """SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000000 AS ts_ms
      |FROM events
      |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
      |                           ORDER BY epoch_ns(ts) // 1000000, event_id) = 1
      |ORDER BY event_id""".stripMargin

  // ── D2/J1: historical-vs-fresh anti/semi split ──────────────────────────
  // historical = even customer keys, so both the novel (anti) and duplicate
  // (semi) branches are non-empty at every scale factor
  private val d2Anti: Q = (s, dir) => {
    val fresh = Tables.events(s, dir).withColumnRenamed("user_id", "k")
    val hist = Tables.customer(s, dir)
      .filter(col("c_custkey") % 2 === 0).select(col("c_custkey").as("k"))
    val (novel, _) = Lookup.semiAntiSplit(fresh, hist, "k")
    novel.select(col("event_id"), col("k").as("user_id")).orderBy(col("event_id"))
  }
  private val d2AntiSql =
    """SELECT event_id, user_id FROM events e
      |WHERE NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_custkey % 2 = 0 AND c.c_custkey = e.user_id)
      |ORDER BY event_id""".stripMargin

  private val d2Semi: Q = (s, dir) => {
    val fresh = Tables.events(s, dir).withColumnRenamed("user_id", "k")
    val hist = Tables.customer(s, dir)
      .filter(col("c_custkey") % 2 === 0).select(col("c_custkey").as("k"))
    val (_, dups) = Lookup.semiAntiSplit(fresh, hist, "k")
    dups.select(col("event_id"), col("k").as("user_id")).orderBy(col("event_id"))
  }
  private val d2SemiSql =
    """SELECT event_id, user_id FROM events e
      |WHERE EXISTS (SELECT 1 FROM customer c
      |              WHERE c.c_custkey % 2 = 0 AND c.c_custkey = e.user_id)
      |ORDER BY event_id""".stripMargin

  // ── D3 (relational contract): every row out, SENT vs SENT_OR_DUPLICATED ─
  private val d3Markers: Q = (s, dir) => {
    val e = Tables.events(s, dir).withColumn("ts_ms", Kit.nanosToMillis("ts"))
    Dedup.dedupMarkers(e,
      Kit.idempotentKey(col("event_type"), col("user_id").cast("string")),
      Seq(col("ts_ms"), col("event_id")))
      .select(col("event_id"), col("status"))
      .orderBy(col("event_id"))
  }
  private val d3MarkersSql =
    """SELECT event_id,
      |  CASE WHEN row_number() OVER (
      |         PARTITION BY coalesce(event_type,'null') || '-' || coalesce(CAST(user_id AS VARCHAR),'null')
      |         ORDER BY epoch_ns(ts) // 1000000, event_id) = 1
      |       THEN 'SENT' ELSE 'SENT_OR_DUPLICATED' END AS status
      |FROM events ORDER BY event_id""".stripMargin

  // ── J2/A4: broadcast enrichment lookup with defaults ────────────────────
  private val j2Lookup: Q = (s, dir) => {
    val stream = Tables.events(s, dir).withColumnRenamed("user_id", "k")
    val lookup = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_name").as("cust_name"),
        col("c_mktsegment").as("segment"))
    Lookup.enrichLookup(stream, lookup, "k",
      Map("cust_name" -> lit(""), "segment" -> lit("UNKNOWN")), strictUnique = true)
      .select(col("event_id"), col("k").as("user_id"), col("cust_name"), col("segment"))
      .orderBy(col("event_id"))
  }
  private val j2LookupSql =
    """SELECT event_id, user_id,
      |  coalesce(c.c_name, '') AS cust_name,
      |  coalesce(c.c_mktsegment, 'UNKNOWN') AS segment
      |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
      |ORDER BY event_id""".stripMargin

  // ── W1/A2: tumbling event-time window aggregation (1 hour) ──────────────
  private val w1Window: Q = (s, dir) => {
    Tables.events(s, dir)
      .withColumn("window_start_ms", Kit.tumblingStartMs("ts", 3600000L))
      .groupBy(col("window_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("n"), Kit.cents(sum(col("value"))).as("value_c"),
        max(Kit.nanosToMillis("ts")).as("latest_ms"))
      .orderBy(col("window_start_ms"), col("event_type"))
  }
  private val w1WindowSql =
    """SELECT (epoch_ns(ts) // 3600000000000) * 3600000 AS window_start_ms,
      |  event_type, count(*) AS n,
      |  CAST(round(sum(value)*100, 0) AS BIGINT) AS value_c,
      |  max(epoch_ns(ts) // 1000000) AS latest_ms
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start_ms, event_type""".stripMargin

  // ── A1: counts + distinct agg ───────────────────────────────────────────
  private val a1Count: Q = (s, dir) => {
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("event_type"))
  }
  private val a1CountSql =
    """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ── broadcast 3-way dim join (J1 shape over the star schema) ────────────
  private val j1StarJoin: Q = (s, dir) => {
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), Kit.cents(sum(col("c_acctbal"))).as("acctbal_c"))
      .orderBy(col("r_name"), col("n_name"))
  }
  private val j1StarJoinSql =
    """SELECT r_name, n_name, count(*) AS n_cust,
      |  CAST(round(sum(c_acctbal)*100, 0) AS BIGINT) AS acctbal_c
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin

  // ── salted shuffled join (skew path): result identical to the plain join,
  //    which IS the oracle — salting must never change the answer ──────────
  private val xSaltedJoin: Q = (s, dir) => {
    import graft.ops.Skew
    val big = Tables.events(s, dir).withColumnRenamed("user_id", "k")
    val small = Tables.customer(s, dir)
      .select(col("c_custkey").as("k"), col("c_mktsegment").as("segment"))
    // deterministic scatter so the physical plan is replayable
    Skew.saltedJoin(big, small, "k", salt = 8, joinType = "left_outer",
      scatter = Some(pmod(hash(col("event_id")), lit(8))))
      .groupBy(coalesce(col("segment"), lit("NONE")).as("segment"))
      .agg(count(lit(1)).as("n"), Kit.cents(sum(col("value"))).as("value_c"))
      .orderBy(col("segment"))
  }
  private val xSaltedJoinSql =
    """SELECT coalesce(c.c_mktsegment, 'NONE') AS segment,
      |  count(*) AS n,
      |  CAST(round(sum(e.value) * 100, 0) AS BIGINT) AS value_c
      |FROM events e LEFT JOIN customer c ON c.c_custkey = e.user_id
      |GROUP BY 1 ORDER BY segment""".stripMargin

  // ── as-of join: each event matched to the user's most recent order at or
  //    before the event, via the single-pass window-merge operator ─────────
  // forward twin of x_asof_join: "the next order at or after this event";
  // DuckDB's ASOF takes the direction from the inequality (<=) directly
  private val xAsofForward: Q = (s, dir) => {
    import graft.ops.Asof
    val l = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), Kit.nanosToMillis("ts").as("ts_ms"))
    val r = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("user_id"),
        expr("unix_millis(cast(o_orderdate as timestamp))").as("order_ms"))
      .agg(Kit.cents(max(col("o_totalprice"))).as("next_price_c"))
    Asof.joinForward(l, r, "user_id", "ts_ms", "order_ms")
      .select(col("event_id"), col("user_id"), col("next_price_c"))
      .orderBy(col("event_id"))
  }
  private val xAsofForwardSql =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS order_ms,
      |    CAST(round(max(o_totalprice) * 100, 0) AS BIGINT) AS next_price_c
      |  FROM orders GROUP BY 1, 2
      |), l AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events
      |)
      |SELECT l.event_id, l.user_id, r.next_price_c
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_ms <= r.order_ms
      |ORDER BY event_id""".stripMargin

  private val xAsofJoin: Q = (s, dir) => {
    import graft.ops.Asof
    val l = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), Kit.nanosToMillis("ts").as("ts_ms"))
    val r = Tables.orders(s, dir)
      .groupBy(col("o_custkey").as("user_id"),
        expr("unix_millis(cast(o_orderdate as timestamp))").as("order_ms"))
      .agg(Kit.cents(max(col("o_totalprice"))).as("last_price_c"))
    Asof.joinBackward(l, r, "user_id", "ts_ms", "order_ms")
      .select(col("event_id"), col("user_id"), col("last_price_c"))
      .orderBy(col("event_id"))
  }
  private val xAsofJoinSql =
    """WITH r AS (
      |  SELECT o_custkey AS user_id, epoch_ms(o_orderdate) AS order_ms,
      |    CAST(round(max(o_totalprice) * 100, 0) AS BIGINT) AS last_price_c
      |  FROM orders GROUP BY 1, 2
      |), l AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events
      |)
      |SELECT l.event_id, l.user_id, r.last_price_c
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_ms >= r.order_ms
      |ORDER BY event_id""".stripMargin

  // ── range join: events inside the user's 7-day post-order windows, via
  //    the bucket-chunked operator; oracle = plain inequality join ─────────
  private val xRangeJoin: Q = (s, dir) => {
    import graft.ops.RangeJoin
    val day = 86400000L
    // orders are 1995-2001 but events are 2024 — fold each order date into
    // the events' month (deterministic modulo remap, mirrored in the
    // oracle) so the windows actually cover event timestamps
    val remapped = expr("unix_millis(cast(o_orderdate as timestamp))") % (30L * day) +
      lit(1704067200000L)
    val l = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), Kit.nanosToMillis("ts").as("ts_ms"))
    val r = Tables.orders(s, dir)
      .select(col("o_custkey").as("user_id"), remapped.as("w_start"),
        (remapped + day).as("w_end"))
    RangeJoin.byBucket(l, r, Seq("user_id"), "ts_ms", "w_start", "w_end",
        bucketMs = day)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_windows"), min(col("w_start")).as("first_w_ms"))
      .orderBy(col("event_id"))
  }
  private val xRangeJoinSql =
    """WITH l AS (
      |  SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS ts_ms FROM events
      |), r AS (
      |  SELECT o_custkey AS user_id,
      |    epoch_ms(o_orderdate) % 2592000000 + 1704067200000 AS w_start,
      |    epoch_ms(o_orderdate) % 2592000000 + 1704067200000 + 86400000 AS w_end
      |  FROM orders
      |)
      |SELECT l.event_id, count(*) AS n_windows, min(r.w_start) AS first_w_ms
      |FROM l JOIN r ON l.user_id = r.user_id
      |  AND l.ts_ms >= r.w_start AND l.ts_ms < r.w_end
      |GROUP BY l.event_id ORDER BY event_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q1_agg" -> q1Agg,
    "x_range_join" -> xRangeJoin,
    "x_asof_join" -> xAsofJoin,
    "x_asof_forward" -> xAsofForward,
    "x_salted_join" -> xSaltedJoin,
    "s4_union_scan" -> s4Union,
    "p1_key_extraction" -> p1Key,
    "f2_validity_route" -> f2Route,
    "f5_weekend_filter" -> f5Weekend,
    "f6_topn" -> f6TopN,
    "d1_exact_dedup" -> d1Dedup,
    "d2_anti_join" -> d2Anti,
    "d2_semi_join" -> d2Semi,
    "d3_dedup_markers" -> d3Markers,
    "j2_lookup_join" -> j2Lookup,
    "w1_tumbling_window" -> w1Window,
    "a1_count_agg" -> a1Count,
    "j1_star_join" -> j1StarJoin)

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "x_range_join" -> xRangeJoinSql,
    "x_asof_join" -> xAsofJoinSql,
    "x_asof_forward" -> xAsofForwardSql,
    "x_salted_join" -> xSaltedJoinSql,
    "s4_union_scan" -> s4UnionSql,
    "p1_key_extraction" -> p1KeySql,
    "f2_validity_route" -> f2RouteSql,
    "f5_weekend_filter" -> f5WeekendSql,
    "f6_topn" -> f6TopNSql,
    "d1_exact_dedup" -> d1DedupSql,
    "d2_anti_join" -> d2AntiSql,
    "d2_semi_join" -> d2SemiSql,
    "d3_dedup_markers" -> d3MarkersSql,
    "j2_lookup_join" -> j2LookupSql,
    "w1_tumbling_window" -> w1WindowSql,
    "a1_count_agg" -> a1CountSql,
    "j1_star_join" -> j1StarJoinSql)
}
