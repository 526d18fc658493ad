package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Batch analytic coverage beyond the reference's streaming jobs:
  * TPC-H-style aggregation/join/sort queries, SQL window functions, and
  * set operations on the driver's star schema. These exercise the
  * relational surface a warehouse user expects (the reference has no
  * batch tier at all — SURVEY.md §2.3 notes the gap).
  *
  * Money math is done in DECIMAL(18,2) (exact, order-independent) and
  * cast to DOUBLE only at the end, so Spark and DuckDB agree bit-for-bit
  * regardless of aggregation order.
  */
object TpchAnalytics {

  private val decQty = col("l_quantity").cast(DecimalType(18, 2))
  private val decPrice = col("l_extendedprice").cast(DecimalType(18, 2))
  private val decDisc = col("l_discount").cast(DecimalType(18, 2))
  private val decTax = col("l_tax").cast(DecimalType(18, 2))

  // ------------------------------------------------------------ TPC-H 1
  /** Pricing summary report: wide multi-aggregate scan of lineitem. The
    * whole query is one codegen'd partial+final HashAggregate over the
    * parquet scan — no shuffle besides the 6-group final agg.
    */
  private def tpchQ1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(decQty).cast("double").as("sum_qty"),
        sum(decPrice).cast("double").as("sum_base_price"),
        sum(decPrice * (lit(1) - decDisc)).cast("double").as("sum_disc_price"),
        sum(decPrice * (lit(1) - decDisc) * (lit(1) + decTax)).cast("double").as("sum_charge"),
        (sum(decQty).cast("double") / count(lit(1))).as("avg_qty"),
        (sum(decPrice).cast("double") / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
  }

  private val tpchQ1Oracle =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1999-09-02 00:00:00'
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ TPC-H 3
  /** Shipping-priority: 3-way join + grouped revenue + top-10. The
    * customer side is filtered then broadcast; lineitem↔orders is the
    * only shuffle. Top-10 is a TakeOrderedAndProject (per-partition
    * heap, no global sort materialization).
    */
  private def tpchQ3(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(decPrice * (lit(1) - decDisc)).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("odate_sec"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val tpchQ3Oracle =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS odate_sec
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ----------------------------------------------- multi-dim broadcast
  /** Star-join rollup: revenue per region/nation through the full
    * customer→nation→region dimension chain. All three dims broadcast;
    * the fact scans once.
    */
  private def starJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val reg = Tables.region(spark, dir).select(col("r_regionkey"), col("r_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(decPrice * (lit(1) - decDisc)).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  private val starJoinOracle =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- window functions
  /** SQL window-function surface: rank / dense_rank / lag / running sum
    * per nation over customer balances. Running sum is decimal-exact so
    * the cross-engine compare is deterministic.
    */
  private def windowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val decBal = col("c_acctbal").cast(DecimalType(18, 2))
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"), col("c_acctbal"), decBal.as("dec_bal"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rnk", rank().over(w).cast("long"))
      .withColumn("drnk", dense_rank().over(w).cast("long"))
      .withColumn("prev_bal", lag(col("c_acctbal"), 1).over(w))
      .withColumn("running_bal",
        sum(col("dec_bal")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter(col("rn") <= 3)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("rn"), col("rnk"),
        col("drnk"), col("prev_bal"), col("running_bal"))
  }

  private val windowFuncsOracle =
    """SELECT c_nationkey, c_custkey, c_acctbal, rn, rnk, drnk, prev_bal, running_bal FROM (
      |  SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal,
      |    row_number() OVER w AS rn,
      |    rank() OVER w AS rnk,
      |    dense_rank() OVER w AS drnk,
      |    lag(c_acctbal) OVER w AS prev_bal,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_bal
      |  FROM customer
      |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)) t
      |WHERE rn <= 3""".stripMargin

  // ------------------------------------------------------- set algebra
  /** UNION / INTERSECT / EXCEPT: users who purchased or signed up, also
    * clicked, and are not heavy error producers (≥10 errors).
    */
  private def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def usersOf(t: String) = ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    val heavyErrorUsers = ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).count().filter(col("count") >= 10)
      .select(col("user_id"))
    usersOf("purchase").union(usersOf("signup")).distinct()
      .intersect(usersOf("click"))
      .except(heavyErrorUsers)
  }

  private val setOpsOracle =
    """SELECT user_id FROM (
      |  SELECT user_id FROM events WHERE event_type = 'purchase'
      |  UNION
      |  SELECT user_id FROM events WHERE event_type = 'signup')
      |INTERSECT
      |SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |EXCEPT
      |SELECT user_id FROM events WHERE event_type = 'error'
      |GROUP BY user_id HAVING count(*) >= 10""".stripMargin

  // ---------------------------------------------------- semi/anti join
  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS): parts that were
    * never ordered vs suppliers with at least one shipment.
    */
  private def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val partsNeverOrdered = Tables.part(spark, dir)
      .join(li, col("p_partkey") === col("l_partkey"), "left_anti")
      .select(col("p_partkey").as("key"), lit("part_never_ordered").as("tag"))
    val suppliersActive = Tables.supplier(spark, dir)
      .join(li, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey").as("key"), lit("supplier_active").as("tag"))
    partsNeverOrdered.unionAll(suppliersActive)
  }

  private val semiAntiOracle =
    """SELECT p_partkey AS key, 'part_never_ordered' AS tag FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      |UNION ALL
      |SELECT s_suppkey AS key, 'supplier_active' AS tag FROM supplier
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)""".stripMargin

  // ------------------------------------------------------- cube/rollup
  /** Grouping-set rollup over (returnflag, linestatus) — subtotals and
    * grand total in one pass, a capability the reference lacks entirely.
    */
  private def rollupQuery(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(decQty).cast("double").as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
  }

  private val rollupOracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ------------------------------------------------------------ TPC-H 5
  /** Local-supplier volume: the join-order showcase. Five joins, but
    * only lineitem↔orders moves data — region/nation/supplier/customer
    * are filtered then broadcast, so the fact tables shuffle once on
    * the orderkey and every dimension lookup is map-side.
    */
  private def tpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(supp),
        li("l_suppkey") === supp("s_suppkey") &&
          cust("c_nationkey") === supp("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(decPrice * (lit(1) - decDisc)).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val tpchQ5Oracle =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1""".stripMargin

  // ----------------------------------------------------------- TPC-H 14
  /** Promotion-effect: conditional aggregate over a fact↔dimension
    * broadcast join — promo revenue share for one ship-month.
    */
  private def tpchQ14(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", decPrice * (lit(1) - decDisc))
          .otherwise(lit(0).cast(DecimalType(18, 2)))).cast("double").as("promo_revenue"),
        sum(decPrice * (lit(1) - decDisc)).cast("double").as("total_revenue"))
      .select(col("promo_revenue"), col("total_revenue"),
        (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_pct"))
  }

  private val tpchQ14Oracle =
    """WITH s AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |         THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00')
      |SELECT promo_revenue, total_revenue,
      |       100.0 * promo_revenue / total_revenue AS promo_pct
      |FROM s""".stripMargin

  // ------------------------------------------------------------ TPC-H 7
  /** Volume shipping between two nations by year: both nation sides
    * broadcast onto their fact tables before lineitem↔orders shuffles
    * once; the bidirectional nation-pair predicate and year extraction
    * happen map-side.
    */
  private def tpchQ7(spark: SparkSession, dir: String): DataFrame = {
    val (na, nb) = ("NATION_3", "NATION_7")
    val nat = Tables.nation(spark, dir)
      .filter(col("n_name").isin(na, nb))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
        col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(decPrice * (lit(1) - decDisc)).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val tpchQ7Oracle =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n1.n_name IN ('NATION_3', 'NATION_7')
      |  AND n2.n_name IN ('NATION_3', 'NATION_7')
      |  AND n1.n_name <> n2.n_name
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3""".stripMargin

  // --------------------------------------------- correlated subquery
  /** Customers above their nation's average balance — the classic
    * correlated scalar subquery, written as SQL so Catalyst's
    * decorrelation rewrites it (to an aggregate + join) rather than
    * hand-planning the join. The inner average is a decimal sum over a
    * double count so both engines compute the identical scalar.
    */
  private def correlatedSubquery(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_corr_customer")
    spark.sql(
      """SELECT c_custkey, c_acctbal,
        |       CAST(c_nationkey AS BIGINT) AS c_nationkey
        |FROM graft_corr_customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |  FROM graft_corr_customer c2
        |  WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin)
  }

  private val correlatedSubqueryOracle =
    """SELECT c_custkey, c_acctbal, CAST(c_nationkey AS BIGINT) AS c_nationkey
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |  FROM customer c2
      |  WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin

  // ------------------------------------------- extended window surface
  /** The rest of the SQL window-function surface: ntile, percent_rank,
    * cume_dist, lead-with-default, nth_value, and a value-RANGE frame
    * (running sum over balances within 100.0 below the current row's).
    * Same single sort per partition spec as the base window query.
    */
  private def windowFuncsExt(spark: SparkSession, dir: String): DataFrame = {
    val decBal = col("c_acctbal").cast(DecimalType(18, 2))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val wRange = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal"))
      .rangeBetween(-100, Window.currentRow)
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("c_nationkey"),
        col("c_acctbal"), decBal.as("dec_bal"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("next_bal", lead(col("c_acctbal"), 1, -1.0).over(w))
      .withColumn("second_bal",
        nth_value(col("c_acctbal"), 2).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("near_sum", sum(col("dec_bal")).over(wRange).cast("double"))
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        col("quartile"), col("pct_rank"), col("cdist"), col("next_bal"),
        col("second_bal"), col("near_sum"))
  }

  private val windowFuncsExtOracle =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey, c_custkey, c_acctbal,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS pct_rank,
      |  cume_dist() OVER w AS cdist,
      |  lead(c_acctbal, 1, -1.0) OVER w AS next_bal,
      |  nth_value(c_acctbal, 2) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal DESC, c_custkey ROWS UNBOUNDED PRECEDING) AS second_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER (PARTITION BY c_nationkey
      |    ORDER BY c_acctbal RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""".stripMargin

  // ------------------------------------------------------------ TPC-H 2
  /** Minimum-cost supplier (adapted Q2 — the schema has no partsupp, so
    * the per-(part, supplier) "supply cost" is derived as the minimum
    * unit price ever shipped in lineitem; the query keeps Q2's
    * signature shape: a correlated scalar-min subquery over a
    * dimension-chained join, decorrelated by Catalyst into an
    * aggregate + join rather than hand-planned). Doubles stay exact
    * cross-engine: min() is order-independent and the unit-price
    * division is a single IEEE op on identical inputs.
    */
  /** TPC-H Q2 decorrelated by hand. The textbook correlated-min form
    * makes the optimizer aggregate the FULL (partkey, suppkey) offers
    * rollup before any pruning — the subquery's rewrite can't see that
    * only size-15 parts and EUROPE suppliers ever reach the equality.
    * Pushing both filters BELOW the rollup as broadcast semi-joins
    * shrinks the lineitem aggregation ~50× (p_size = 15 is 1/50 of
    * parts), after which the per-part min and the equality join-back
    * are small-table work. Semantics are identical: the subquery's
    * domain is exactly the outer row's partkey, and its EUROPE
    * restriction matches the outer supplier chain, so min-per-partkey
    * over the pre-filtered offers IS the correlated min.
    */
  private def tpchQ2(spark: SparkSession, dir: String): DataFrame = {
    val part15 = Tables.part(spark, dir)
      .filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_brand"))
    val eurSupp = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    // one lineitem scan, pre-filtered by both broadcast dimensions,
    // then the rollup; checkpointed because the equality join reads it
    // on both sides (offers and its own per-part min)
    val offers = Tables.lineitem(spark, dir)
      .join(broadcast(part15.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      .localCheckpoint()
    val minCost = offers.groupBy(col("l_partkey"))
      .agg(min(col("unit_cost")).as("min_cost"))
      .select(col("l_partkey").as("mc_partkey"), col("min_cost"))
    offers
      .join(minCost,
        col("l_partkey") === col("mc_partkey") &&
          col("unit_cost") === col("min_cost"))
      .join(broadcast(part15), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), col("unit_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  private val tpchQ2Oracle =
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand, o.unit_cost
      |FROM part p, offers o, supplier s, nation n, region r
      |WHERE p.p_partkey = o.l_partkey AND s.s_suppkey = o.l_suppkey
      |  AND p.p_size = 15
      |  AND s.s_nationkey = n.n_nationkey AND n.n_regionkey = r.r_regionkey
      |  AND r.r_name = 'EUROPE'
      |  AND o.unit_cost = (
      |    SELECT min(o2.unit_cost)
      |    FROM offers o2, supplier s2, nation n2, region r2
      |    WHERE o2.l_partkey = p.p_partkey AND s2.s_suppkey = o2.l_suppkey
      |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      |      AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------ TPC-H 9
  /** Product-type profit by nation and year (adapted Q9 — supply cost
    * is p_retailprice·quantity in place of the absent
    * ps_supplycost·quantity; the shape is Q9's: five-way join, LIKE
    * filter on the part name, year extraction, profit expression summed
    * per (nation, year)). part/supplier/nation broadcast; lineitem
    * shuffles once onto orders. Profit is computed in DECIMAL and cast
    * to double after the sum.
    */
  private def tpchQ9(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
      .filter(col("p_name").like("%red%"))
      .select(col("p_partkey"), col("p_retailprice"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val supp = Tables.supplier(spark, dir)
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val decRetail = col("p_retailprice").cast(DecimalType(18, 2))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .join(broadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(decPrice * (lit(1) - decDisc) - decRetail * decQty)
        .cast("double").as("sum_profit"))
  }

  private val tpchQ9Oracle =
    """SELECT n_name AS nation,
      |       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))
      |            - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
      |FROM part, supplier, lineitem, orders, nation
      |WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |  AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |  AND p_name LIKE '%red%'
      |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------------- TPC-H 18
  /** Large-volume customers: the classic IN-aggregate-subquery top-N.
    * The HAVING subquery is a semi-join of orders against the
    * per-order quantity rollup (one lineitem aggregation, reused);
    * customers broadcast; top-100 is a TakeOrderedAndProject.
    */
  private def tpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_quantity"))
    val bigOrders = li.groupBy(col("l_orderkey"))
      .agg(sum(decQty).as("q")).filter(col("q") > 250)
      .select(col("l_orderkey").as("big_okey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(bigOrders, col("o_orderkey") === col("big_okey"), "left_semi")
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("odate_sec"),
        col("o_totalprice"))
      .agg(sum(decQty).cast("double").as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  private val tpchQ18Oracle =
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS odate_sec,
      |       o_totalprice,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (
      |    SELECT l_orderkey FROM lineitem
      |    GROUP BY l_orderkey
      |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  // ------------------------------------------------------------ TPC-H 4
  /** Order-priority checking (adapted Q4 — lineitem has no
    * commit/receipt dates, so "late" is a shipment more than 10 days
    * after the order date): EXISTS semi-join with a cross-table
    * predicate, grouped priority counts. The semi-join keeps the
    * orders side lean — no lineitem row survives the probe.
    */
  private def tpchQ4(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > ord("o_orderdate") + expr("INTERVAL 10 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  private val tpchQ4Oracle =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 10 DAY)
      |GROUP BY 1""".stripMargin

  // ----------------------------------------------------------- TPC-H 19
  /** Discounted-revenue (Q19 shape): a three-branch disjunctive
    * predicate over joined (brand, size, quantity) bands — the classic
    * test that OR-of-ANDs stays a single broadcast join + filter
    * rather than a union of three scans.
    */
  private def tpchQ19(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 30)) ||
        (col("p_brand") === "Brand#7" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 40)) ||
        (col("p_brand") === "Brand#13" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 50)))
      .agg(sum(decPrice * (lit(1) - decDisc)).cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val tpchQ19Oracle =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
      |   OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
      |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  // ----------------------------------------------------------- TPC-H 22
  /** Global-sales-opportunity (Q22 shape — no phone column, so grouped
    * by nation): customers above the global positive-balance average
    * who have placed no orders since mid-2000 — lapsed high-balance
    * accounts. Scalar subquery (decimal-exact average) + NOT EXISTS
    * anti-join, written in SQL so Catalyst plans the decorrelation.
    */
  private def tpchQ22(spark: SparkSession, dir: String): DataFrame = {
    Tables.customer(spark, dir).createOrReplaceTempView("graft_q22_customer")
    Tables.orders(spark, dir).createOrReplaceTempView("graft_q22_orders")
    spark.sql(
      """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
        |       count(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM graft_q22_customer c
        |WHERE c_acctbal > (
        |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        |    FROM graft_q22_customer WHERE c_acctbal > 0.0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM graft_q22_orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
        |GROUP BY 1""".stripMargin)
  }

  private val tpchQ22Oracle =
    """SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
      |       count(*) AS numcust,
      |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
      |GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("tpch_q1_pricing_summary", Some(tpchQ1Oracle), tpchQ1),
    GraftQuery("tpch_q3_shipping_priority", Some(tpchQ3Oracle), tpchQ3),
    GraftQuery("star_join_rollup", Some(starJoinOracle), starJoin),
    GraftQuery("window_functions", Some(windowFuncsOracle), windowFuncs),
    GraftQuery("set_operations", Some(setOpsOracle), setOps),
    GraftQuery("semi_anti_join", Some(semiAntiOracle), semiAnti),
    GraftQuery("rollup_agg", Some(rollupOracle), rollupQuery),
    GraftQuery("tpch_q5_local_supplier", Some(tpchQ5Oracle), tpchQ5),
    GraftQuery("tpch_q14_promo", Some(tpchQ14Oracle), tpchQ14),
    GraftQuery("window_functions_ext", Some(windowFuncsExtOracle), windowFuncsExt),
    GraftQuery("tpch_q7_nation_volume", Some(tpchQ7Oracle), tpchQ7),
    GraftQuery("correlated_subquery", Some(correlatedSubqueryOracle), correlatedSubquery),
    GraftQuery("tpch_q2_min_cost_supplier", Some(tpchQ2Oracle), tpchQ2),
    GraftQuery("tpch_q9_product_profit", Some(tpchQ9Oracle), tpchQ9),
    GraftQuery("tpch_q18_large_orders", Some(tpchQ18Oracle), tpchQ18),
    GraftQuery("tpch_q4_priority_check", Some(tpchQ4Oracle), tpchQ4),
    GraftQuery("tpch_q19_disjunctive_rev", Some(tpchQ19Oracle), tpchQ19),
    GraftQuery("tpch_q22_lapsed_customers", Some(tpchQ22Oracle), tpchQ22),
  )
}
