package graft.queries

import graft.functions.Kit
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The remainder of the TPC-H decision-support suite (Q6–Q9, Q11–Q15,
 * Q18–Q20), completing the full 22-query set together with
 * [[RelationalQueries]] (Q1) and [[AnalyticsQueries]] (Q2–Q5, Q10, Q16,
 * Q17, Q21, Q22). Each keeps the STANDARD query's plan shape — that is
 * what gates the engine — with predicates adapted to this testdata's
 * domains (no `partsupp` table, no `l_shipmode`/`l_commitdate`/
 * `p_container` columns; adaptations noted per query).
 *
 * Shapes covered here that the earlier queries don't: pure scan-bound
 * scalar aggregate with tight range+equality pushdown (Q6), dual dimension
 * role-playing joins — the same dim table joined twice under different
 * roles (Q7 supplier-nation × customer-nation, Q8 likewise + region gate),
 * CASE-conditional market/promo shares as exact basis points (Q8/Q14),
 * expression-heavy profit aggregation (Q9), group-agg filtered by an
 * uncorrelated scalar subquery over the SAME aggregate (Q11, Q15's argmax
 * twin), left-outer count distribution with a join-condition filter (Q13),
 * IN over a HAVING-filtered group-by (Q18), disjunction-of-conjunctions
 * across fact and dim columns (Q19 — partial pushdown/CNF territory), and
 * nested IN with a reused aggregate at two granularities (Q20).
 *
 * Cross-engine conventions as in [[RelationalQueries]]: exact-integer
 * money (cents / basis points via round→cast, integer `div` for shares),
 * total ORDER BY with unique tie-breaks, identical aliases both sides.
 */
object DecisionSupportQueries {
  type Q = (SparkSession, String) => DataFrame

  // ── Q6: forecasting revenue change — scan-bound scalar aggregate ────────
  // The pure-pushdown query: every predicate (date range, discount band,
  // quantity cap) reaches the parquet scan as a PushedFilter; no join, no
  // regroup — at 100 TB this is I/O-bound and nothing else.
  private val q6Forecast: Q = (s, dir) => {
    Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1998-01-01")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(Kit.cents(sum(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
        count(lit(1)).as("n"))
  }
  private val q6ForecastSql =
    """SELECT CAST(round(sum(l_extendedprice*l_discount)*100, 0) AS BIGINT) AS revenue_c,
      |  count(*) AS n
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  // ── Q7: volume shipping between two nations, by direction and year ──────
  // The same nation dim joined TWICE under different roles (supplier side,
  // customer side); both copies broadcast — the pair filter is a disjunction
  // across the two roles, so it runs after both attaches.
  private val q7NationVolume: Q = (s, dir) => {
    val n1 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation")))
    val l = Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1999-01-01")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        col("l_extendedprice"), col("l_discount"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    l.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("sn_key"))
      .join(n2, col("c_nationkey") === col("cn_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"),
        count(lit(1)).as("n"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }
  private val q7NationVolumeSql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(strftime(l_shipdate, '%Y') AS INT) AS l_year,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS revenue_c,
      |  count(*) AS n
      |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN customer ON c_custkey = o_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1999-01-01'
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ── Q8: national market share within a region, per year ─────────────────
  // 7-table join with the region gate on the CUSTOMER's nation and the
  // share measured on the SUPPLIER's nation; the share is emitted as exact
  // basis points (integer division of the two cent sums), never a double
  // ratio — bit-identical across engines and partitionings.
  private val q8MarketShare: Q = (s, dir) => {
    val asiaKeys = broadcast(Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("an_key")))
    val suppNation = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation")))
    val p = Tables.part(s, dir).filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val l = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    val o = Tables.orders(s, dir)
      .filter(to_date(col("o_orderdate")) >= lit(java.sql.Date.valueOf("1996-01-01")) &&
        to_date(col("o_orderdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"), year(col("o_orderdate")).as("o_year"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(asiaKeys, col("c_nationkey") === col("an_key"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("sn_key"))
      .groupBy(col("o_year"))
      .agg(Kit.cents(sum(when(col("supp_nation") === "NATION_2", col("volume"))
          .otherwise(lit(0.0)))).as("nation_c"),
        Kit.cents(sum(col("volume"))).as("total_c"))
      .select(col("o_year"), col("nation_c"), col("total_c"),
        expr("nation_c * 10000L div total_c").as("share_bp"))
      .orderBy(col("o_year"))
  }
  private val q8MarketShareSql =
    """WITH all_sales AS (
      |  SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
      |    l_extendedprice*(1-l_discount) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part JOIN lineitem ON p_partkey = l_partkey
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      |    AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
      |    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
      |)
      |SELECT o_year,
      |  CAST(round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)*100, 0) AS BIGINT) AS nation_c,
      |  CAST(round(sum(volume)*100, 0) AS BIGINT) AS total_c,
      |  CAST(round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END)*100, 0) AS BIGINT) * 10000
      |    // CAST(round(sum(volume)*100, 0) AS BIGINT) AS share_bp
      |FROM all_sales GROUP BY o_year ORDER BY o_year""".stripMargin

  // ── Q9: product-type profit by supplier nation and year ─────────────────
  // No `partsupp` in this schema, so supply cost is synthesized as
  // 0.5·p_retailprice·l_quantity (deterministic, mirrored in the oracle) —
  // the plan shape is unchanged: a name-pattern dim filter (contains, still
  // a pushable string predicate), a 5-table join, and an expression-heavy
  // aggregate over the fact.
  private val q9Profit: Q = (s, dir) => {
    val p = Tables.part(s, dir).filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), col("p_retailprice"))
    val n = broadcast(Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name").as("nation")))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(n, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("nation"), col("o_year"))
      // quantized per ROW (not after the sum): the profit expression mixes
      // three double products, so the group sum is order-dependent at the
      // last ulp and a post-sum round can flip a cent between engines;
      // per-row cents are identical doubles on both sides, summed exactly
      // as integers
      .agg(sum(Kit.cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
          lit(0.5) * col("p_retailprice") * col("l_quantity"))).as("profit_c"),
        count(lit(1)).as("n"))
      .orderBy(col("nation"), col("o_year"))
  }
  private val q9ProfitSql =
    """SELECT n_name AS nation, CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
      |  CAST(sum(CAST(round((l_extendedprice*(1-l_discount) - 0.5*p_retailprice*l_quantity)*100, 0) AS BIGINT)) AS BIGINT) AS profit_c,
      |  count(*) AS n
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN orders ON o_orderkey = l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY n_name, o_year
      |ORDER BY nation, o_year""".stripMargin

  // ── Q11: important parts — group-agg gated by a scalar of ITSELF ────────
  // `partsupp` adaptation: "stock value" = lineitem revenue per part from
  // one nation's suppliers. The HAVING threshold is a scalar subquery over
  // the same aggregate — Catalyst plans ONE aggregate, reused (exchange
  // reuse), with the scalar broadcast back; the 0.2% threshold is exact
  // integer division of the cent total. SQL-expressed so the gate covers
  // the scalar-subquery planning path.
  private val q11ImportantParts: Q = (s, dir) => {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q11")
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_q11")
    Tables.nation(s, dir).createOrReplaceTempView("nation_q11")
    s.sql("""
      WITH v AS (
        SELECT l_partkey,
          CAST(round(sum(l_extendedprice)*100, 0) AS BIGINT) AS value_c
        FROM lineitem_q11 JOIN supplier_q11 ON l_suppkey = s_suppkey
        JOIN nation_q11 ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
      )
      SELECT l_partkey, value_c FROM v
      WHERE value_c > (SELECT sum(value_c) div 500 FROM v)
      ORDER BY value_c DESC, l_partkey""")
  }
  private val q11ImportantPartsSql =
    """WITH v AS (
      |  SELECT l_partkey,
      |    CAST(round(sum(l_extendedprice)*100, 0) AS BIGINT) AS value_c
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name = 'NATION_3'
      |  GROUP BY l_partkey
      |)
      |SELECT l_partkey, value_c FROM v
      |WHERE value_c > (SELECT sum(value_c) // 500 FROM v)
      |ORDER BY value_c DESC, l_partkey""".stripMargin

  // ── Q12: priority counts by line status (shipmode adaptation) ───────────
  // No `l_shipmode`/`l_commitdate` columns: the grouping key is
  // l_linestatus and the late-shipment filter is the returnflag + shipdate
  // year — the gated shape is Q12's CASE-conditional priority counting
  // after a fact-to-fact join.
  private val q12PriorityByStatus: Q = (s, dir) => {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, dir)
      .filter(col("l_returnflag") === "R" &&
        to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1998-01-01")))
      .select(col("l_orderkey"), col("l_linestatus"))
      .join(o, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(high, 1L).otherwise(0L)).as("high_n"),
        sum(when(high, 0L).otherwise(1L)).as("low_n"))
      .orderBy(col("l_linestatus"))
  }
  private val q12PriorityByStatusSql =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_n,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_n
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_returnflag = 'R'
      |  AND CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ── Q13: customer order-count distribution (left outer + double agg) ────
  // The filter lives in the JOIN CONDITION (priority <> '5-LOW' standing in
  // for the comment NOT LIKE), not a WHERE — customers with zero qualifying
  // orders must survive with count 0. Two aggregations: per-customer count,
  // then the distribution over counts.
  private val q13Custdist: Q = (s, dir) => {
    val c = Tables.customer(s, dir).select(col("c_custkey"))
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"))
    val co = c.join(o,
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "5-LOW",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    co.groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }
  private val q13CustdistSql =
    """WITH co AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey
      |)
      |SELECT c_count, count(*) AS custdist
      |FROM co GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ── Q14: promotion revenue share for one month, exact basis points ──────
  private val q14Promo: Q = (s, dir) => {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_type"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-03-01")) &&
        to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1997-04-01")))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .agg(Kit.cents(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))))
          .as("promo_c"),
        Kit.cents(sum(rev)).as("total_c"))
      .select(col("promo_c"), col("total_c"),
        expr("promo_c * 10000L div total_c").as("share_bp"))
  }
  private val q14PromoSql =
    """SELECT
      |  CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END)*100, 0) AS BIGINT) AS promo_c,
      |  CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS total_c,
      |  CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice*(1-l_discount) ELSE 0 END)*100, 0) AS BIGINT) * 10000
      |    // CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS share_bp
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_shipdate AS DATE) >= DATE '1997-03-01'
      |  AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'""".stripMargin

  // ── Q15: top supplier — revenue argmax via broadcast scalar attach ──────
  // The "view + max" query: the per-supplier revenue aggregate is computed
  // once; the max is a one-row broadcast joined back (never a global sort
  // or a second scan of the fact). Comparison is on exact cents, so the
  // argmax tie-set is engine-portable.
  private val q15TopSupplier: Q = (s, dir) => {
    val rev = Tables.lineitem(s, dir)
      .filter(to_date(col("l_shipdate")) >= lit(java.sql.Date.valueOf("1997-01-01")) &&
        to_date(col("l_shipdate")) < lit(java.sql.Date.valueOf("1997-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("total_revenue_c"))
    val mx = rev.agg(max(col("total_revenue_c")).as("__mx"))
    val sup = Tables.supplier(s, dir).select(col("s_suppkey"), col("s_name"))
    rev.join(broadcast(mx), col("total_revenue_c") === col("__mx"))
      .join(sup, col("s_suppkey") === col("l_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_c"))
      .orderBy(col("s_suppkey"))
  }
  private val q15TopSupplierSql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS total_revenue_c
      |  FROM lineitem
      |  WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
      |    AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, total_revenue_c
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue_c = (SELECT max(total_revenue_c) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ── Q18: large-volume orders — IN over a HAVING-filtered group-by ───────
  // The IN subquery is itself an aggregate (orders whose total quantity
  // exceeds the threshold); Catalyst plans it as a semi join against the
  // aggregated keys — one pass over lineitem for the keys, one for the
  // detail. l_quantity is integral, so the HAVING sum is exact. SQL-
  // expressed to gate that planning path.
  private val q18LargeOrders: Q = (s, dir) => {
    Tables.customer(s, dir).createOrReplaceTempView("customer_q18")
    Tables.orders(s, dir).createOrReplaceTempView("orders_q18")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q18")
    s.sql("""
      SELECT c_custkey, min(c_name) AS c_name, o_orderkey,
        date_format(min(o_orderdate), 'yyyy-MM-dd') AS orderdate,
        CAST(round(min(o_totalprice)*100, 0) AS BIGINT) AS totalprice_c,
        CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      FROM customer_q18 JOIN orders_q18 ON c_custkey = o_custkey
      JOIN lineitem_q18 ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem_q18 GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300)
      GROUP BY c_custkey, o_orderkey
      ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""")
  }
  private val q18LargeOrdersSql =
    """SELECT c_custkey, min(c_name) AS c_name, o_orderkey,
      |  strftime(min(o_orderdate), '%Y-%m-%d') AS orderdate,
      |  CAST(round(min(o_totalprice)*100, 0) AS BIGINT) AS totalprice_c,
      |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 300)
      |GROUP BY c_custkey, o_orderkey
      |ORDER BY totalprice_c DESC, o_orderkey LIMIT 100""".stripMargin

  // ── Q19: disjunction of conjunctions across fact and dim columns ────────
  // Three AND-groups OR'd together, each constraining BOTH part attributes
  // (brand, size band — p_container adaptation) and lineitem attributes
  // (quantity band). The brand/size half of the disjunction prunes the dim
  // scan; the cross-table residual runs post-join — the classic partial-
  // pushdown query.
  private val q19Disjunctive: Q = (s, dir) => {
    val p = Tables.part(s, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
        col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(11, 25) &&
        col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(26, 50) &&
        col("l_quantity") >= 20 && col("l_quantity") <= 50)
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(Kit.cents(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
        .as("revenue_c"),
        count(lit(1)).as("n"))
  }
  private val q19DisjunctiveSql =
    """SELECT CAST(round(sum(l_extendedprice*(1-l_discount))*100, 0) AS BIGINT) AS revenue_c,
      |  count(*) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity >= 1 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50
      |       AND l_quantity >= 20 AND l_quantity <= 50)""".stripMargin

  // ── Q20: suppliers holding a dominant share of a part's volume ──────────
  // `partsupp` adaptation of the availability test: a supplier qualifies
  // when it shipped >10% of some PROMO part's total shipped quantity. The
  // same per-(part,supplier) aggregate is reused at two granularities
  // (pair and part total) — one shuffle, two reads (exchange reuse) — and
  // the qualifying suppliers feed a semi join (IN) under a broadcast
  // nation gate. Quantities are integral, so the 10%-share comparison is
  // exact integer math on both engines.
  private val q20PartSuppliers: Q = (s, dir) => {
    Tables.supplier(s, dir).createOrReplaceTempView("supplier_q20")
    Tables.nation(s, dir).createOrReplaceTempView("nation_q20")
    Tables.part(s, dir).createOrReplaceTempView("part_q20")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_q20")
    s.sql("""
      WITH psq AS (
        SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
        FROM lineitem_q20 JOIN part_q20 ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
        GROUP BY l_partkey, l_suppkey
      ), pt AS (
        SELECT l_partkey, sum(qty) AS tot FROM psq GROUP BY l_partkey
      )
      SELECT s_suppkey, s_name
      FROM supplier_q20 JOIN nation_q20 ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_4'
        AND s_suppkey IN (
          SELECT l_suppkey FROM psq JOIN pt USING (l_partkey)
          WHERE qty*10 > tot)
      ORDER BY s_suppkey""")
  }
  private val q20PartSuppliersSql =
    """WITH psq AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem JOIN part ON p_partkey = l_partkey
      |  WHERE p_type = 'PROMO'
      |  GROUP BY l_partkey, l_suppkey
      |), pt AS (
      |  SELECT l_partkey, sum(qty) AS tot FROM psq GROUP BY l_partkey
      |)
      |SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_4'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM psq JOIN pt USING (l_partkey)
      |    WHERE qty*10 > tot)
      |ORDER BY s_suppkey""".stripMargin

  val all: Map[String, Q] = Map(
    "q6_forecast" -> q6Forecast,
    "q7_nation_volume" -> q7NationVolume,
    "q8_market_share" -> q8MarketShare,
    "q9_profit" -> q9Profit,
    "q11_important_parts" -> q11ImportantParts,
    "q12_priority_by_status" -> q12PriorityByStatus,
    "q13_custdist" -> q13Custdist,
    "q14_promo" -> q14Promo,
    "q15_top_supplier" -> q15TopSupplier,
    "q18_large_orders" -> q18LargeOrders,
    "q19_disjunctive" -> q19Disjunctive,
    "q20_part_suppliers" -> q20PartSuppliers)

  val oracles: Map[String, String] = Map(
    "q6_forecast" -> q6ForecastSql,
    "q7_nation_volume" -> q7NationVolumeSql,
    "q8_market_share" -> q8MarketShareSql,
    "q9_profit" -> q9ProfitSql,
    "q11_important_parts" -> q11ImportantPartsSql,
    "q12_priority_by_status" -> q12PriorityByStatusSql,
    "q13_custdist" -> q13CustdistSql,
    "q14_promo" -> q14PromoSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q20_part_suppliers" -> q20PartSuppliersSql)
}
