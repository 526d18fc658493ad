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
  private def valueBandJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val a = ev.select(col("event_id").as("id_a"), col("value").as("va"))
    val b = ev.select(col("event_id").as("id_b"), col("value").as("vb"))
    graft.operators.Joins.bandJoin(a, b, col("va"), col("vb"), 0.05)
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"))
      .agg(count(lit(1)).as("n_neighbors"))
  }

  private val valueBandJoinOracle =
    """SELECT a.event_id AS id_a, count(*) AS n_neighbors
      |FROM events a JOIN events b
      |  ON abs(a.value - b.value) <= 0.05 AND a.event_id <> b.event_id
      |GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("pivot_agg", Some(pivotOracle), pivotAgg),
    GraftQuery("unpivot_agg", Some(unpivotOracle), unpivotAgg),
    GraftQuery("cube_agg", Some(cubeOracle), cubeAgg),
    GraftQuery("median_value", Some(medianOracle), medianValue),
    GraftQuery("value_band_join", Some(valueBandJoinOracle), valueBandJoin),
  )
}
