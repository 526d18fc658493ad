package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** The rest of the TPC-H query shapes (Q8, Q10-Q13, Q15-Q17, Q20,
  * Q21) — with TpchAnalytics this completes all 22 classic shapes on
  * the driver's star schema. Where the schema lacks a TPC-H column
  * (no partsupp table, no l_shipmode/commitdate/receiptdate, no
  * p_container, no c_phone), the adaptation keeps the query's
  * *signature shape* — the join topology, subquery structure, and
  * aggregate pattern — and derives the missing fact from lineitem,
  * exactly as TpchAnalytics does for Q2/Q4/Q9.
  *
  * Determinism contract (same as TpchAnalytics): money in
  * DECIMAL(18,2) until the final cast, ratios as one double op on
  * exact inputs, counts cast BIGINT both engines, every ranking
  * totally ordered by a unique tiebreaker.
  */
object TpchAnalytics2 {

  private val decQty = col("l_quantity").cast(DecimalType(18, 2))
  private val decPrice = col("l_extendedprice").cast(DecimalType(18, 2))
  private val decDisc = col("l_discount").cast(DecimalType(18, 2))
  private val decZero = lit(0).cast(DecimalType(18, 2))
  private val decVol = decPrice * (lit(1) - decDisc)

  // ------------------------------------------------------------ TPC-H 8
  /** National market share: NATION_5's share of AMERICA-market PROMO
    * revenue by order year. Every dimension (part, supplier+nation,
    * customer-in-region) broadcasts onto the lineitem scan; the only
    * shuffle is lineitem↔orders. The share is one double division of
    * two decimal-exact sums.
    */
  private def tpchQ8(spark: SparkSession, dir: String): DataFrame = {
    val reg = Tables.region(spark, dir).filter(col("r_name") === "AMERICA")
    val custNations = Tables.nation(spark, dir)
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(custNations), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    val suppNations = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(suppNations), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val prt = Tables.part(spark, dir)
      .filter(col("p_type") === "PROMO").select(col("p_partkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", decVol).otherwise(decZero))
          .cast("double").as("nation_volume"),
        sum(decVol).cast("double").as("total_volume"))
      .select(col("o_year"),
        // guard the zero-volume year: NULL, not NaN — NaN ordering
        // differs across downstream consumers
        when(col("total_volume") =!= 0.0,
          col("nation_volume") / col("total_volume")).as("mkt_share"),
        col("nation_volume"), col("total_volume"))
  }

  private val tpchQ8Oracle =
    """WITH s AS (
      |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |    CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
      |         THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS nation_volume,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_volume
      |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |    AND p_type = 'PROMO'
      |  GROUP BY 1)
      |SELECT o_year,
      |       CASE WHEN total_volume <> 0.0 THEN nation_volume / total_volume END AS mkt_share,
      |       nation_volume, total_volume
      |FROM s""".stripMargin

  // ----------------------------------------------------------- TPC-H 10
  /** Returned-item reporting: top-20 customers by revenue lost to
    * returns in one quarter. lineitem pre-filters on the return flag
    * before the orders shuffle; customer+nation broadcast; top-20 is a
    * TakeOrderedAndProject with c_custkey as the tiebreaker.
    */
  private def tpchQ10(spark: SparkSession, dir: String): DataFrame = {
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(decVol).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val tpchQ10Oracle =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ----------------------------------------------------------- TPC-H 11
  /** Important stock (adapted Q11 — no partsupp, so a part's "supply
    * value" held by NATION_7's suppliers is the decimal sum of its
    * lineitem extended prices shipped by them): group-by value with a
    * HAVING-fraction-of-total scalar subquery. The per-part rollup is
    * materialized ONCE (localCheckpoint) and feeds both the outer
    * filter and the total — the same reused-aggregate discipline as
    * Q2's offers view. The threshold is 2× the average per-part value
    * (not TPC-H's fixed fraction, which goes to zero rows as the part
    * count grows — the 2×-average form selects a stable tail at every
    * scale factor).
    */
  private def tpchQ11(spark: SparkSession, dir: String): DataFrame = {
    val suppN = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir).filter(col("n_name") === "NATION_7")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(decPrice).as("pv"))
      .localCheckpoint()
      .createOrReplaceTempView("graft_q11_supply")
    spark.sql(
      """SELECT l_partkey AS p_key, CAST(pv AS DOUBLE) AS part_value
        |FROM graft_q11_supply
        |WHERE CAST(pv AS DOUBLE) > (
        |  SELECT CAST(SUM(pv) AS DOUBLE) * 2.0 / COUNT(*) FROM graft_q11_supply)""".stripMargin)
  }

  private val tpchQ11Oracle =
    """WITH supply AS (
      |  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS pv
      |  FROM lineitem, supplier, nation
      |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |    AND n_name = 'NATION_7'
      |  GROUP BY 1)
      |SELECT l_partkey AS p_key, CAST(pv AS DOUBLE) AS part_value
      |FROM supply
      |WHERE CAST(pv AS DOUBLE) > (SELECT CAST(SUM(pv) AS DOUBLE) * 2.0 / COUNT(*) FROM supply)""".stripMargin

  // ----------------------------------------------------------- TPC-H 12
  /** Shipping-priority audit (adapted Q12 — no l_shipmode or
    * commit/receipt dates, so lines class into FAST / MEDIUM / SLOW by
    * ship delay after the order date): the CASE-bucketed dual
    * conditional count over the fact↔fact join, Q12's signature.
    */
  private def tpchQ12(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_shipdate"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .withColumn("delay_class",
        when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 21 DAYS"), "SLOW")
          .when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 7 DAYS"), "MEDIUM")
          .otherwise("FAST"))
      .groupBy(col("delay_class"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
  }

  private val tpchQ12Oracle =
    """SELECT
      |  CASE WHEN l_shipdate > o_orderdate + INTERVAL 21 DAY THEN 'SLOW'
      |       WHEN l_shipdate > o_orderdate + INTERVAL 7 DAY THEN 'MEDIUM'
      |       ELSE 'FAST' END AS delay_class,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  // ----------------------------------------------------------- TPC-H 13
  /** Customer order-count distribution: the left-outer-join double
    * aggregation (customers keep their zero bucket). The join and the
    * first group-by share the customer-key partitioning, so the
    * exchange is reused; the histogram rollup is a second small
    * shuffle. Priority filter stands in for Q13's comment NOT LIKE.
    */
  private def tpchQ13(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  private val tpchQ13Oracle =
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_custkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count""".stripMargin

  // ----------------------------------------------------------- TPC-H 15
  /** Top supplier: the max-revenue-view query. The quarterly
    * per-supplier revenue rollup is materialized once and feeds both
    * the join and the scalar MAX subquery; the decimal equality
    * against the max is exact, so no epsilon games. Ordered by
    * s_suppkey for a total order under revenue ties.
    */
  private def tpchQ15(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(decVol).as("total_rev"))
      .localCheckpoint()
      .createOrReplaceTempView("graft_q15_revenue")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q15_supplier")
    spark.sql(
      """SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM graft_q15_supplier, graft_q15_revenue
        |WHERE s_suppkey = l_suppkey
        |  AND total_rev = (SELECT MAX(total_rev) FROM graft_q15_revenue)
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val tpchQ15Oracle =
    """WITH revenue AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = l_suppkey
      |  AND total_rev = (SELECT MAX(total_rev) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ----------------------------------------------------------- TPC-H 16
  /** Parts/supplier relationship (adapted Q16 — the (part, supplier)
    * pairs come from DISTINCT lineitem instead of partsupp, and the
    * "complaints" exclusion becomes negative-balance suppliers):
    * distinct-count of suppliers per (brand, type, size) bucket with
    * an anti-joined exclusion list, Q16's signature.
    */
  private def tpchQ16(spark: SparkSession, dir: String): DataFrame = {
    // no pre-distinct on the (partkey, suppkey) pairs: countDistinct's
    // partial aggregate dedupes (brand, type, size, suppkey) map-side
    // before its own exchange anyway, so the explicit distinct only
    // added a full extra shuffle of the pair table (plan: 3 Exchange →
    // 2); both joins below are broadcast, so the extra probed rows
    // never cross the network.
    val ps = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
    val badSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val prt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= "Brand#4" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size").cast("long").as("p_size"))
    ps.join(broadcast(badSupp), ps("l_suppkey") === badSupp("s_suppkey"), "left_anti")
      .join(broadcast(prt), col("l_partkey") === prt("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  private val tpchQ16Oracle =
    """SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#4'
      |  AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3""".stripMargin

  // ----------------------------------------------------------- TPC-H 17
  /** Small-quantity-order revenue (adapted Q17 — p_size<10 stands in
    * for the container filter): the per-part correlated average
    * subquery, written in SQL so Catalyst decorrelates it into an
    * aggregate + join. The 20% threshold is decimal-sum/count — one
    * double multiply — so both engines compare against the identical
    * scalar.
    */
  private def tpchQ17(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_q17_lineitem")
    Tables.part(spark, dir).createOrReplaceTempView("graft_q17_part")
    spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_weekly_revenue,
        |       CAST(COUNT(*) AS BIGINT) AS n_small
        |FROM graft_q17_lineitem l, graft_q17_part p
        |WHERE p.p_partkey = l.l_partkey
        |  AND p.p_brand = 'Brand#2' AND p.p_size < 10
        |  AND l.l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |    FROM graft_q17_lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
  }

  private val tpchQ17Oracle =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_weekly_revenue,
      |       CAST(COUNT(*) AS BIGINT) AS n_small
      |FROM lineitem l, part p
      |WHERE p.p_partkey = l.l_partkey
      |  AND p.p_brand = 'Brand#2' AND p.p_size < 10
      |  AND l.l_quantity < (
      |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin

  // ----------------------------------------------------------- TPC-H 20
  /** Potential part promotion (adapted Q20 — no partsupp availqty, so
    * the "excess supply" test becomes: the supplier moved more than
    * 30% of a red part's 1996 volume): the nested-IN + correlated
    * threshold shape. The (supplier, part) rollup is materialized
    * once; the per-part total is a correlated scalar over it,
    * decorrelated by Catalyst.
    */
  private def tpchQ20(spark: SparkSession, dir: String): DataFrame = {
    val redParts = Tables.part(spark, dir)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(redParts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(decQty).as("sq"))
      .localCheckpoint()
      .createOrReplaceTempView("graft_q20_shipped")
    Tables.supplier(spark, dir).createOrReplaceTempView("graft_q20_supplier")
    Tables.nation(spark, dir).createOrReplaceTempView("graft_q20_nation")
    spark.sql(
      """SELECT s_suppkey, s_name
        |FROM graft_q20_supplier JOIN graft_q20_nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_19'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM graft_q20_shipped g
        |    WHERE CAST(sq AS DOUBLE) > (
        |      SELECT CAST(SUM(sq) AS DOUBLE) * 0.3
        |      FROM graft_q20_shipped g2 WHERE g2.l_partkey = g.l_partkey))
        |ORDER BY s_suppkey""".stripMargin)
  }

  private val tpchQ20Oracle =
    """WITH shipped AS (
      |  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sq
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE 'red%'
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY 1, 2)
      |SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_name = 'NATION_19'
      |  AND s_suppkey IN (
      |    SELECT l_suppkey FROM shipped g
      |    WHERE CAST(sq AS DOUBLE) > (
      |      SELECT CAST(SUM(sq) AS DOUBLE) * 0.3
      |      FROM shipped g2 WHERE g2.l_partkey = g.l_partkey))
      |ORDER BY s_suppkey""".stripMargin

  // ----------------------------------------------------------- TPC-H 21
  /** Suppliers who kept orders waiting (adapted Q21 — "late" is
    * shipment >10 days after the order date, per Q4's adaptation):
    * late lines on finished multi-supplier orders where the supplier
    * was the ONLY late one. Instead of the classic EXISTS/NOT-EXISTS
    * pair (which re-probes lineitem twice per line), the plan
    * aggregates per-order supplier/late-supplier distinct counts ONCE
    * and semi-joins the late lines back — same result set, one
    * lineitem pass + an orderkey-partitioned reuse, the 100 TB shape.
    * The DuckDB oracle states the classic double-EXISTS form, proving
    * the rewrite equivalent.
    */
  private def tpchQ21(spark: SparkSession, dir: String): DataFrame = {
    val ordF = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val lo = li.join(ordF, li("l_orderkey") === ordF("o_orderkey"))
      .withColumn("late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 10 DAYS"))
    // two-level distinct instead of countDistinct×2 (r16): the double
    // distinct planned as an Expand that doubled every joined row before
    // the aggregation; grouping by (orderkey, suppkey) first needs no new
    // exchange (hash(l_orderkey) from the join already clusters it) and
    // n_late_supp = #suppliers with any late line = sum(any_late)
    val target = lo.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("any_late"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"),
        sum(when(col("any_late"), 1L).otherwise(0L)).as("n_late_supp"))
      .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .select(col("l_orderkey").as("wait_okey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))
    lo.filter(col("late"))
      .join(target, col("l_orderkey") === col("wait_okey"), "left_semi")
      .join(broadcast(supp), col("l_suppkey") === supp("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  private val tpchQ21Oracle =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 10 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 10 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("tpch_q8_market_share", Some(tpchQ8Oracle), tpchQ8),
    GraftQuery("tpch_q10_returned_items", Some(tpchQ10Oracle), tpchQ10),
    GraftQuery("tpch_q11_important_stock", Some(tpchQ11Oracle), tpchQ11),
    GraftQuery("tpch_q12_ship_priority", Some(tpchQ12Oracle), tpchQ12),
    GraftQuery("tpch_q13_order_distribution", Some(tpchQ13Oracle), tpchQ13),
    GraftQuery("tpch_q15_top_supplier", Some(tpchQ15Oracle), tpchQ15),
    GraftQuery("tpch_q16_supplier_parts", Some(tpchQ16Oracle), tpchQ16),
    GraftQuery("tpch_q17_small_qty_revenue", Some(tpchQ17Oracle), tpchQ17),
    GraftQuery("tpch_q20_excess_supply", Some(tpchQ20Oracle), tpchQ20),
    GraftQuery("tpch_q21_waiting_suppliers", Some(tpchQ21Oracle), tpchQ21),
  )
}
