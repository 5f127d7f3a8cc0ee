package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deep-relational completeness (SURVEY.md §2): the hard TPC-H query
  * shapes — correlated scalar subqueries, double-correlated
  * EXISTS/NOT EXISTS, outer-join histograms, argmax-per-group,
  * conditional market-share ratios — adapted to the fixture's star
  * schema (no partsupp/commitdate; date ranges 1995–2001, nations
  * NATION_0..24). These exercise exactly the decorrelation paths a
  * Postgres user leans on; in Spark each is expressed as the join
  * form Catalyst's decorrelator would produce, so the plan is the
  * one you'd want at scale: fact-fact shuffles on true keys only,
  * every dimension broadcast.
  *
  * Determinism: monetary sums go through DECIMAL then DOUBLE
  * (order-independent); thresholds/argmax compare those exact values.
  */
object TpchDeepQueries {

  private val D2 = "decimal(18,2)"

  private def revenueAgg = sum(
    col("l_extendedprice").cast(D2) * (lit(1).cast(D2) - col("l_discount").cast(D2))
  ).cast("double")

  private val revenueSql =
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)"

  // ----------------------------------------------- q4: priority semi-count
  /** TPC-H Q4: orders with at least one late lineitem (shipped > 30
    * days after order date — the fixture has no commitdate), counted
    * by priority: EXISTS as a left-semi join whose correlated date
    * condition rides INTO the join (not a post-filter). */
  private def q4Priority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1996-07-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q4Sql = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority"""

  // ------------------------------------------------------- q9: profit
  /** TPC-H Q9 shape without partsupp: profit per (supplier nation,
    * order year) with the part's retail price standing in for
    * supplycost (amount = revenue − 10% of retailprice × quantity),
    * over the 'widget' part family (TPC-H's '%green%'). Exercises the
    * widest decimal-exact arithmetic in the suite: three decimal
    * operands per row folded into one sum. */
  private def q9Profit(s: SparkSession, d: String): DataFrame = {
    // The unbounded triple product (18,2)·(18,2)·(18,6) overflows
    // decimal precision 38, where Spark rounds (allowPrecisionLoss)
    // and DuckDB promotes differently — a 1-ulp divergence first
    // visible at sf1.0 magnitudes. Each intermediate cast below is
    // VALUE-exact (true scales are ≤4 digits, magnitudes ≪ 10^12),
    // so both engines stay in the exact-decimal domain end to end.
    val amount =
      (col("l_extendedprice").cast(D2) * (lit(1).cast(D2) - col("l_discount").cast(D2)))
        .cast("decimal(18,6)") -
      (col("p_retailprice").cast(D2) * col("l_quantity").cast(D2)).cast("decimal(18,4)") *
        lit(0.1).cast("decimal(2,1)")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_name").contains("widget"))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(amount).cast("double").as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q9Sql = """
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,6))
                    - CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(0.1 AS DECIMAL(2,1)))
             AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC"""

  // ------------------------------------------------- q2: min-price supplier
  /** TPC-H Q2 shape without partsupp: for each of the 100 priciest
    * parts, the supplier(s) achieving the minimum lineitem price —
    * a correlated MIN subquery, decorrelated into agg + re-join on
    * (key, extremum). `min` over doubles is order-exact, so no
    * decimal detour is needed. */
  private def q2MinPrice(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
    val mins = l.groupBy(col("l_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
      .select(col("l_partkey").as("mp_partkey"), col("min_price"))
    // re-join on the extremum: shuffle on partkey both sides, then
    // the 100-part cap is applied by rank over retailprice
    val achievers = l.join(mins,
        col("l_partkey") === col("mp_partkey") &&
        col("l_extendedprice") === col("min_price"))
      .select(col("l_partkey"), col("l_suppkey"), col("min_price"))
      .distinct()
    achievers
      .join(Tables.part(s, d), achievers("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
        col("s_name"), col("min_price"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"), col("s_name"))
      .limit(100)
  }

  private val q2Sql = """
    SELECT p_partkey, p_name, p_retailprice, s_name, l_extendedprice AS min_price
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    WHERE l_extendedprice = (
      SELECT min(l2.l_extendedprice) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    GROUP BY ALL
    ORDER BY p_retailprice DESC, p_partkey, s_name
    LIMIT 100"""

  // ------------------------------------------------------- q7: trade volume
  /** TPC-H Q7: bilateral trade volume between nation pairs (1..4 ×
    * 1..4, supp ≠ cust — widened from the original single pair so
    * the smallest fixture still produces rows) by ship year.
    * Fact-fact shuffle on orderkey; supplier/customer/nation dims
    * broadcast; the nation-pair predicate lands after the dim joins
    * exactly as the decorrelated form would. */
  private def q7Volume(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(
        lit("1995-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp")))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        col("s_nk").isin(1, 2, 3, 4) && col("c_nk").isin(1, 2, 3, 4) &&
        col("s_nk") =!= col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(revenueAgg.as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q7Sql = s"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year, $revenueSql AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_nationkey IN (1, 2, 3, 4) AND n2.n_nationkey IN (1, 2, 3, 4)
      AND n1.n_nationkey <> n2.n_nationkey
      AND l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3"""

  // ----------------------------------------------------- q8: market share
  /** TPC-H Q8: NATION_2's share of PROMO-part revenue sold into ASIA
    * by order year — a conditional-sum ratio. Both sums are
    * decimal-exact before the single double division, so the ratio is
    * bit-deterministic at any parallelism. */
  private def q8Share(s: SparkSession, d: String): DataFrame = {
    val asiaNations = Tables.nation(s, d)
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("asia_nk"))
    val suppNation = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_nk"), col("n_name").as("supp_nation"))
    val volume = col("l_extendedprice").cast(D2) *
      (lit(1).cast(D2) - col("l_discount").cast(D2))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).filter(
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") <  lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("asia_nk"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_2", volume)
          .otherwise(lit(0).cast(D2))).cast("double").as("nation_volume"),
        sum(volume).cast("double").as("total_volume"))
      .select(col("o_year"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql = """
    SELECT year(o_orderdate) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_2'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS mkt_share
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY o_year"""

  // -------------------------------------------------- q13: customer distrib
  /** TPC-H Q13: distribution of order counts per customer — LEFT
    * OUTER join with an ON-clause filter (the not-specified
    * priority), so customers with zero qualifying orders land in the
    * c_count=0 bucket, then a histogram over the counts. */
  private def q13Custdist(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"))
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q13Sql = """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC"""

  // -------------------------------------------------- q15: top supplier(s)
  /** TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    * scalar-MAX subquery decorrelated as a 1-row broadcast
    * cross-join; equality is on the decimal-exact double, so ties
    * surface all argmax suppliers identically in both engines. */
  private def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(revenueAgg.as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    revenue.join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  private val q15Sql = s"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, $revenueSql AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey"""

  // ---------------------------------------------- q21: sole late supplier
  private val LateDays = 60

  /** TPC-H Q21 shape without commitdate ("late" = shipped more than
    * [[LateDays]] days after the order date): late lineitems in
    * finished multi-supplier orders where their supplier is the ONLY
    * late one. The doubly-correlated EXISTS / NOT EXISTS pair
    * decorrelates into one per-order aggregate (distinct suppliers,
    * distinct late suppliers) re-joined to the late rows — a single
    * orderkey shuffle instead of two correlated scans. */
  private def q21SoleLate(s: SparkSession, d: String): DataFrame = {
    val lo = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $LateDays DAYS"))
          .as("late"))
    val perOrder = lo.groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("ok"))
    // shuffled-hash: the per-order qualifier table is one row per
    // surviving order (≪ lineitems) — hashing it beats sorting both
    // sides, and the join key is pure equality
    lo.filter(col("late"))
      .join(perOrder.hint("shuffle_hash"), col("l_orderkey") === col("ok"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  private val q21Sql = s"""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL $LateDays DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL $LateDays DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20"""

  // ------------------------------------------------------ q22: prospects
  /** TPC-H Q22: well-funded customers gone quiet (no order since
    * 2000 — the fixture's every-customer-orders density makes the
    * original "never ordered" empty), by nation — an uncorrelated
    * scalar AVG threshold (1-row broadcast) plus an anti join
    * against the recent-orders slice, whose date filter pushes to
    * the orders scan before the anti join shuffles. */
  private def q22Prospects(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast(D2)).cast("double") / count(lit(1)))
        .as("avg_bal"))
    c.join(broadcast(avgBal), col("c_acctbal") > col("avg_bal"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast(D2)).cast("double").as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  private val q22Sql = """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey"""

  // --------------------------------------------------- q6: filtered revenue
  /** TPC-H Q6: the pure filter-scan aggregate — every predicate must
    * reach the parquet scan (PushedFilters), the whole plan is one
    * codegen span to a 1-row result. */
  private def q6Revenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(D2) * col("l_discount").cast(D2))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  private val q6Sql = """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24"""

  // ------------------------------------------------ q10: returned items
  /** TPC-H Q10: top 20 customers by revenue lost to returns in a
    * quarter — fact-fact orderkey shuffle, customer/nation broadcast,
    * TakeOrderedAndProject for the top-k. */
  private def q10Returns(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d).filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") <  lit("1996-07-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(revenueAgg.as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  private val q10Sql = s"""
    SELECT c_custkey, c_name, n_name, c_acctbal, $revenueSql AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
    GROUP BY 1, 2, 3, 4
    ORDER BY revenue DESC, c_custkey
    LIMIT 20"""

  // ------------------------------------------------- q14: promo share
  /** TPC-H Q14: promo revenue share by ship month — conditional-sum
    * ratio, decimal-exact on both sides of the one double division. */
  private def q14Promo(s: SparkSession, d: String): DataFrame = {
    val volume = col("l_extendedprice").cast(D2) *
      (lit(1).cast(D2) - col("l_discount").cast(D2))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).as("l_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", volume).otherwise(lit(0).cast(D2)))
          .cast("double").as("promo_volume"),
        sum(volume).cast("double").as("total_volume"))
      .select(col("l_month"),
        (col("promo_volume") * 100.0 / col("total_volume")).as("promo_share"))
      .orderBy(col("l_month"))
  }

  private val q14Sql = """
    SELECT month(l_shipdate) AS l_month,
           CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY 1
    ORDER BY l_month"""

  // ------------------------------------------------- q18: large orders
  /** TPC-H Q18: orders whose total quantity exceeds 140 — the
    * HAVING-subquery shape as an aggregate + re-join on the fact key
    * (one orderkey shuffle feeds both the qualifier and the join). */
  private def q18Large(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(D2)).cast("double").as("sum_qty"))
      .filter(col("sum_qty") > 140.0)
    big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_s"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  private val q18Sql = """
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 140.0)
    SELECT c_custkey, c_name, o_orderkey,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s,
           o_totalprice, sum_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20"""

  // ------------------------------------------- q19: disjunctive predicates
  /** TPC-H Q19: revenue under a disjunction of (brand-set, size
    * range, quantity range) triples — the OR-of-ANDs shape that
    * tests predicate normalization; the part dimension broadcasts
    * with its own size filter pushed down. */
  private def q19Disjunct(s: SparkSession, d: String): DataFrame = {
    val p1 = col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
      col("p_size").between(1, 15) && col("l_quantity").between(5, 35)
    val p2 = col("p_brand").isin("Brand#4", "Brand#5", "Brand#6") &&
      col("p_size").between(10, 30) && col("l_quantity").between(10, 40)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(p1 || p2)
      .agg(revenueAgg.as("revenue"), count(lit(1)).as("n_items"))
  }

  private val q19Sql = s"""
    SELECT $revenueSql AS revenue, count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
           AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 5 AND 35)
       OR (p_brand IN ('Brand#4', 'Brand#5', 'Brand#6')
           AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)"""

  val defs: Map[String, QueryDef] = Map(
    "q4_priority"       -> QueryDef(q4Priority _, q4Sql),
    "q6_filter_revenue" -> QueryDef(q6Revenue _, q6Sql),
    "q10_returns"       -> QueryDef(q10Returns _, q10Sql),
    "q14_promo_share"   -> QueryDef(q14Promo _, q14Sql),
    "q18_large_orders"  -> QueryDef(q18Large _, q18Sql),
    "q19_disjunct"      -> QueryDef(q19Disjunct _, q19Sql),
    "q2_min_price_supp" -> QueryDef(q2MinPrice _, q2Sql),
    "q7_volume"         -> QueryDef(q7Volume _, q7Sql),
    "q8_mkt_share"      -> QueryDef(q8Share _, q8Sql),
    "q9_profit"         -> QueryDef(q9Profit _, q9Sql),
    "q13_custdist"      -> QueryDef(q13Custdist _, q13Sql),
    "q15_top_supplier"  -> QueryDef(q15TopSupplier _, q15Sql),
    "q21_sole_late"     -> QueryDef(q21SoleLate _, q21Sql),
    "q22_prospects"     -> QueryDef(q22Prospects _, q22Sql),
  )
}
