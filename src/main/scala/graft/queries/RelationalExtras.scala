package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Relational-surface extras: PIVOT / UNPIVOT, CUBE with grouping_id,
  * and exact median — rounding out the warehouse SQL surface beyond
  * the reference's operator set.
  */
object RelationalExtras {

  private val EventTypes = Seq("click", "view", "purchase", "signup", "error")

  // -------------------------------------------------------------- pivot
  /** Events long→wide: one row per user, one count column per event
    * type (explicit value list keeps the plan a single pass —
    * conditional aggregation, no second job for value discovery).
    */
  private def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    EventTypes.foldLeft(wide)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
  }

  private val pivotOracle = {
    val cols = EventTypes.map(t =>
      s"count(*) FILTER (WHERE event_type = '$t') AS $t").mkString(",\n  ")
    s"""SELECT user_id,
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  // ------------------------------------------------------------ unpivot
  /** Lineitem wide→long over three measures (sampled keys). */
  private def unpivotAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") % 500 === 0)
      .select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
  }

  private val unpivotOracle =
    """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
      |       'l_quantity' AS metric, l_quantity AS value
      |FROM lineitem WHERE l_orderkey % 500 = 0
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_extendedprice', l_extendedprice
      |FROM lineitem WHERE l_orderkey % 500 = 0
      |UNION ALL
      |SELECT l_orderkey, CAST(l_linenumber AS BIGINT), 'l_discount', l_discount
      |FROM lineitem WHERE l_orderkey % 500 = 0""".stripMargin

  // --------------------------------------------------------------- cube
  /** Full CUBE over (returnflag, linestatus) with grouping_id — all
    * four aggregation levels in one pass.
    */
  private def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("gid"))
  }

  private val cubeOracle =
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |       coalesce(l_linestatus, 'ALL') AS linestatus,
      |       count(*) AS n,
      |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ------------------------------------------------------------- median
  /** Exact interpolated median of event values per type. */
  private def medianValue(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(round(median(col("value")), 6).as("median_value"),
        count(lit(1)).as("n"))
  }

  private val medianOracle =
    """SELECT event_type, round(median(value), 6) AS median_value, count(*) AS n
      |FROM events GROUP BY 1""".stripMargin

  // ---------------------------------------------------- band join
  /** Numeric band self-join: for each event, how many other events
    * have a `value` within ±0.05. Runs through
    * [[graft.operators.Joins.bandJoin]] — bucketed equi-join on
    * floor(value/band), never the nested-loop range join the naive
    * predicate would plan. The oracle states the naive range join; the
    * result sets are identical.
    */
  /** Round 9 scale rewrite: the pair-materializing band SELF-join on
    * raw events ([[graft.operators.Joins.bandJoin]] stays the operator
    * for joins that NEED the pairs — as-of, reconciliation) went
    * superlinear on the sf1 probe (2.2 s at sf0.1 → 52 s at 10×): this
    * query only COUNTS neighbors, so the pair intermediate is Σ n_b²
    * while the answer is Σ n_i. The count form collapses to DISTINCT
    * values first: monetary values are cent-quantized, so events
    * sharing a value share their entire answer — band-join the
    * (value, multiplicity) frame (≤ 11 distinct candidates per value
    * at 2 dp under a 0.05 band), roll up the weighted in-band total
    * per value, and map it back to events with one broadcast-scale
    * join. The in-band predicate is the SAME `abs(v − u) <= band` on
    * the same doubles the naive oracle evaluates, so the result is
    * row-identical; every value's own multiplicity is in its total,
    * and the −1 removes the event itself (events with no true
    * neighbor drop, like the oracle's inner join). On a truly
    * continuous value domain distinct ≈ n and this degrades to the
    * pair join — quantized/low-cardinality domains are what a 100 TB
    * events table actually carries.
    */
  private def valueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val eps = 0.05
    val ev = Tables.events(spark, dir)
      .select(col("event_id").as("id_a"), col("value").as("va"))
    val dv = ev.groupBy(col("va").as("v")).agg(count(lit(1)).as("m"))
    val other = dv.select(col("v").as("u"), col("m").as("mu"))
    val totals = graft.operators.Joins.bandJoin(dv, other, col("v"), col("u"), eps)
      .groupBy(col("v")).agg(sum(col("mu")).as("t"))
    ev.join(totals, ev("va") === totals("v"))
      .select(col("id_a"), (col("t") - 1L).as("n_neighbors"))
      .filter(col("n_neighbors") >= 1)
  }

  /** r15: the naive pair self-join oracle is Σ n·(in-band multiplicity)
    * ≈ 10¹¹ pairs at sf10 (3600s-timeout-infeasible) while the ANSWER
    * is only n rows — the oracle now states the same distinct-value
    * collapse the engine uses (band-join the (value, multiplicity)
    * frame, ≤11 candidates per cent-quantized value, map back), with
    * the identical `abs(v − u) <= band` predicate on the same doubles.
    * Row-identical to the naive form (it was the gate at sf0.01/sf1
    * through r14), feasible at every probe scale.
    */
  private val valueBandJoinOracle =
    """WITH dv AS (SELECT value AS v, count(*) AS m FROM events GROUP BY 1),
      |t AS (
      |  SELECT a.v, sum(b.m) AS t
      |  FROM dv a JOIN dv b ON abs(a.v - b.v) <= 0.05
      |  GROUP BY 1)
      |SELECT e.event_id AS id_a, CAST(t.t - 1 AS BIGINT) AS n_neighbors
      |FROM events e JOIN t ON e.value = t.v
      |WHERE t.t - 1 >= 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("pivot_agg", Some(pivotOracle), pivotAgg),
    GraftQuery("unpivot_agg", Some(unpivotOracle), unpivotAgg),
    GraftQuery("cube_agg", Some(cubeOracle), cubeAgg),
    GraftQuery("median_value", Some(medianOracle), medianValue),
    GraftQuery("value_band_join", Some(valueBandJoinOracle), valueBandJoin),
  )
}
