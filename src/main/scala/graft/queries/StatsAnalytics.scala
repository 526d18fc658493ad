package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Statistical / aggregate-surface extras: exact second-moment
  * statistics (variance, stddev, correlation) computed from decimal
  * sums, the TPC-H Q6 filter-scan aggregate, and explicit GROUPING
  * SETS.
  *
  * The moment statistics deliberately avoid the engines' native
  * `var_pop`/`corr` aggregates: those stream floating-point updates
  * whose result depends on accumulation order (non-deterministic under
  * parallel partial aggregation). Summing in DECIMAL is exact and
  * order-independent — the same plan property that makes the TPC-H
  * money sums reproducible — and the double-precision moment formulas
  * are then evaluated identically on both engines' identical sums.
  */
object StatsAnalytics {

  // ---------------------------------------------------- moment stats
  private def statsMoments(spark: SparkSession, dir: String): DataFrame = {
    val q = col("l_quantity")
    val p = col("l_extendedprice")
    val sums = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(q.cast(DecimalType(18, 2))).as("sx"),
        sum((q * q).cast(DecimalType(28, 4))).as("sxx"),
        sum(p.cast(DecimalType(18, 2))).as("sy"),
        sum((p * p).cast(DecimalType(38, 4))).as("syy"),
        sum((q * p).cast(DecimalType(38, 4))).as("sxy"))
    val (n, sx, sxx, sy, syy, sxy) = (col("n"),
      col("sx").cast("double"), col("sxx").cast("double"),
      col("sy").cast("double"), col("syy").cast("double"),
      col("sxy").cast("double"))
    // greatest(0, ·) clamps: the moment difference can round to a tiny
    // negative double for a (near-)constant column, where Spark's
    // sqrt(negative) silently yields NaN but DuckDB's sqrt raises —
    // clamping BOTH engines identically keeps the oracle runnable and
    // the results equal. The nullif still catches the exact-zero case
    // (corr undefined for constants → NULL on both engines).
    sums.select(
      col("l_returnflag"), n,
      (sx / n).as("mean_qty"),
      greatest(lit(0.0), sxx / n - (sx / n) * (sx / n)).as("var_qty"),
      sqrt(greatest(lit(0.0), sxx / n - (sx / n) * (sx / n))).as("std_qty"),
      ((n * sxy - sx * sy) /
        nullif(sqrt(greatest(lit(0.0), n * sxx - sx * sx)) *
          sqrt(greatest(lit(0.0), n * syy - sy * sy)), lit(0.0)))
        .as("corr_qty_price"))
  }

  private val statsMomentsOracle =
    """WITH s AS (
      |  SELECT l_returnflag, count(*) AS n,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
      |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |  sx / n AS mean_qty,
      |  greatest(0.0, sxx / n - (sx / n) * (sx / n)) AS var_qty,
      |  sqrt(greatest(0.0, sxx / n - (sx / n) * (sx / n))) AS std_qty,
      |  (n * sxy - sx * sy) /
      |    nullif(sqrt(greatest(0.0, n * sxx - sx * sx)) * sqrt(greatest(0.0, n * syy - sy * sy)), 0.0) AS corr_qty_price
      |FROM s""".stripMargin

  // -------------------------------------------------------- TPC-H Q6
  /** Forecast-revenue-change: the canonical pushdown showcase — all
    * three predicates reach the parquet scan (`PushedFilters`), the
    * scan reads 4 of 11 columns, and the whole query is one
    * partial+final agg with no shuffle beyond the single-group merge.
    */
  private def tpchQ6(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(28, 4)))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
  }

  private val tpchQ6Oracle =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,4))) AS DOUBLE) AS revenue,
      |  count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  // --------------------------------------------------- grouping sets
  /** Explicit GROUPING SETS — the three levels a report needs, without
    * cube's fourth; same single-pass Expand plan as cube/rollup.
    */
  private def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"), col("gid"))
  }

  private val groupingSetsOracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))""".stripMargin

  // -------------------------------------------------- exact quantiles
  /** Exact multi-quantile summary per event type (linear-interpolated
    * continuous quantiles, the SQL `percentile_cont` family). Rounded
    * to 6 decimals so the two engines' interpolation arithmetic cannot
    * flip the hash. An exact sort-based percentile is O(n log n) per
    * group — the right tool up to moderate group sizes; at 100 TB the
    * same query shape swaps in `approx_percentile` (t-digest-style
    * mergeable sketch) without touching callers.
    */
  private def quantiles(spark: SparkSession, dir: String): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(percentile(col("value"), typedLit(qs)).as("q"))
      .select(col("event_type"), posexplode(col("q")))
      // QRound: interpolated quantiles of 2-decimal values over
      // rational fractions are small-denominator rationals —
      // exact-boundary class (ROUND_AUDIT U3)
      .select(col("event_type"), (col("pos") + 1).cast("long").as("q_idx"),
        QRound.col(col("col"), 6).as("q_value"))
  }

  private val quantilesOracle =
    s"""WITH q AS (
      |  SELECT event_type, quantile_cont(value, [0.25, 0.5, 0.75, 0.95]) AS qs
      |  FROM events GROUP BY 1)
      |SELECT event_type, CAST(g.i AS BIGINT) AS q_idx, ${QRound.duck("qs[g.i]", 6)} AS q_value
      |FROM q CROSS JOIN generate_series(1, 4) g(i)""".stripMargin

  // ---------------------------------------------------- outlier scan
  /** Z-score outlier detection per event type: events more than 3σ
    * from their group mean, with the score. Group statistics come from
    * the same decimal-exact moment sums as `stats_moments` (order-
    * independent, reproducible) and broadcast back onto the scan —
    * one pass for stats, one filtered pass for the tails, no shuffle
    * of the fact table at any scale.
    */
  private def outlierEvents(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value")
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(v.cast(DecimalType(18, 2))).as("sx"),
        sum((v * v).cast(DecimalType(38, 4))).as("sxx"))
      .select(col("event_type"),
        (col("sx").cast("double") / col("n")).as("mean"),
        sqrt(greatest(lit(0.0),
          col("sxx").cast("double") / col("n") -
            (col("sx").cast("double") / col("n")) * (col("sx").cast("double") / col("n"))))
          .as("std"))
    Tables.events(spark, dir)
      .join(broadcast(stats), "event_type")
      .filter(abs(v - col("mean")) > lit(3.0) * col("std"))
      .select(col("event_id"), col("event_type"), v.as("value"),
        round((v - col("mean")) / col("std"), 6).as("z_score"))
  }

  private val outlierOracle =
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value * value AS DECIMAL(38,4))) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT event_type, sx / n AS mean,
      |         sqrt(greatest(0.0, sxx / n - (sx / n) * (sx / n))) AS std
      |  FROM s)
      |SELECT event_id, e.event_type, value,
      |       round((value - mean) / std, 6) AS z_score
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE abs(value - mean) > 3.0 * std""".stripMargin

  // ---------------------------------------------- equi-depth histogram
  /** Equi-depth (equal-frequency) histogram per event type: 10 ntile
    * buckets with count and value range — the histogram a cost-based
    * optimizer keeps per column. Deterministic: tile assignment orders
    * by (value, event_id), a unique total order both engines share.
    * One group-partitioned sort; the rollup rides the same exchange.
    */
  private def equiDepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("tile", ntile(10).over(w).cast("long"))
      .groupBy(col("event_type"), col("tile"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 6).as("lo"),
        round(max(col("value")), 6).as("hi"))
  }

  private val equiDepthOracle =
    """SELECT event_type, CAST(tile AS BIGINT) AS tile, count(*) AS n,
      |       round(min(value), 6) AS lo, round(max(value), 6) AS hi
      |FROM (
      |  SELECT event_type, value,
      |         ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS tile
      |  FROM events) s
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- rolling features
  /** Trailing-7-day activity features per event (count + decimal-exact
    * value sum over the preceding week, current event excluded): the
    * rolling time-window feature a training pipeline joins onto every
    * example. RANGE frame on epoch seconds — frame membership depends
    * only on the ordering VALUE, so ties cannot flip the result; one
    * user-partitioned sort serves both features. Sampled 1-in-20 users
    * keep the dump compact; the filter pushes to the scan.
    */
  private def rollingFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-7L * 86400L, -1L)
    Tables.events(spark, dir)
      .filter(col("user_id") % 20 === 0)
      .withColumn("sec", expr("CAST(ts AS LONG)"))
      .select(col("user_id"), col("event_id"), col("sec"),
        count(lit(1)).over(w).as("n_prev_7d"),
        coalesce(sum(col("value").cast(DecimalType(18, 2))).over(w), lit(0))
          .cast("decimal(18,2)").cast("double").as("sum_prev_7d"))
  }

  private val rollingOracle =
    """SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec,
      |       CAST(count(*) OVER w AS BIGINT) AS n_prev_7d,
      |       CAST(coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DECIMAL(18,2)), 0) AS DOUBLE) AS sum_prev_7d
      |FROM events
      |WHERE user_id % 20 = 0
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
      |             RANGE BETWEEN 604800 PRECEDING AND 1 PRECEDING)""".stripMargin

  // --------------------------------------------------- column stats
  private val StatCols =
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount")

  /** ANALYZE-style column statistics for the CBO: NDV, null count,
    * min/max per numeric lineitem column — ONE pass computing all 24
    * aggregates, then an unpivot of the single stats row (the stats
    * table a cost-based optimizer and a data-skipping index both read).
    *
    * The REGISTERED default (`column_stats`) uses
    * `approx_count_distinct` (HLL++, rsd 2%): six exact
    * `count(distinct)` in one pass compile to an Expand that multiplies
    * the fact scan 6× before the shuffle — fine at sf0.1, the #2
    * slowest query; fatal at 100 TB. HLL keeps the single-scan shape
    * with a constant-size sketch per column. Sketch internals are
    * engine-private, so the default is rows-only at the driver (the
    * q5_uv_approx precedent) and StatsSpec bounds every approx NDV
    * within 3×rsd of exact. The exact Expand plan stays registered as
    * `column_stats_exact` — the hash-matched fidelity twin.
    */
  // NOTE r16: the exact twin's per-column restructure was TRIED here too
  // (HLL over grouped values is estimate-identical) and REVERTED on
  // measurement — approx has no Expand to remove, so six groupBy(value)
  // subtrees only ADD work over the single 24-agg pass (pin cpu
  // 2.2 -> 3.3 s). The single-scan HLL pass IS this query's design point.
  private def columnStatsApprox(spark: SparkSession, dir: String): DataFrame = {
    val aggs = StatCols.flatMap { c =>
      Seq(approx_count_distinct(col(c), 0.02).as(s"ndv_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        round(min(col(c)).cast("double"), 6).as(s"min_$c"),
        round(max(col(c)).cast("double"), 6).as(s"max_$c"))
    }
    val one = Tables.lineitem(spark, dir).agg(aggs.head, aggs.tail: _*)
    val stackArgs = StatCols.map(c =>
      s"'$c', ndv_$c, nulls_$c, min_$c, max_$c").mkString(", ")
    one.selectExpr(
      s"stack(${StatCols.size}, $stackArgs) AS (column_name, ndv, null_count, min_value, max_value)")
  }

  /** Exact-NDV twin of [[columnStatsApprox]] — see its doc.
    *
    * Shape (r16): one independent per-column subtree instead of the
    * six-way Expand. The old single-pass agg multiplied the fact scan
    * 6× through Expand BEFORE any aggregation — 3.6M expanded rows
    * through one partial-agg task at sf0.1 (the driver data is one
    * parquet row group, so the pre-exchange side is single-threaded) —
    * measured 2.7-3.4 s wall / 5-7 executor-CPU-s. Per column, a
    * column-pruned scan groups by the value (partial agg collapses to
    * the column's NDV map-side) and ndv/nulls/min/max all come from the
    * grouped frame; the six subtrees are independent query stages AQE
    * materializes concurrently. Same values by construction; at 100 TB
    * six pruned scans of one column each replace one scan expanded 6×,
    * and the shuffles carry NDV-sized grouped partials instead of
    * Expand output.
    */
  private def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val perCol = StatCols.map { c =>
      Tables.lineitem(spark, dir)
        .groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          lit(c).as("column_name"),
          count(col("v")).as("ndv"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("null_count"),
          round(min(col("v")).cast("double"), 6).as("min_value"),
          round(max(col("v")).cast("double"), 6).as("max_value"))
        .select(col("column_name"), col("ndv"), col("null_count"),
          col("min_value"), col("max_value"))
    }
    perCol.reduce(_.unionAll(_))
  }

  private val columnStatsOracle = {
    val selects = StatCols.map(c =>
      s"""SELECT '$c' AS column_name, count(DISTINCT $c) AS ndv,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
         |  round(CAST(min($c) AS DOUBLE), 6) AS min_value,
         |  round(CAST(max($c) AS DOUBLE), 6) AS max_value
         |FROM lineitem""".stripMargin)
    selects.mkString("\nUNION ALL\n")
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("stats_moments", Some(statsMomentsOracle), statsMoments),
    GraftQuery("tpch_q6_revenue", Some(tpchQ6Oracle), tpchQ6),
    GraftQuery("grouping_sets_agg", Some(groupingSetsOracle), groupingSets),
    GraftQuery("quantile_summary", Some(quantilesOracle), quantiles),
    GraftQuery("outlier_events", Some(outlierOracle), outlierEvents),
    GraftQuery("equi_depth_histogram", Some(equiDepthOracle), equiDepthHistogram),
    GraftQuery("rolling_features", Some(rollingOracle), rollingFeatures),
    GraftQuery("column_stats", None, columnStatsApprox),
    GraftQuery("column_stats_exact", Some(columnStatsOracle), columnStats),
  )
}
