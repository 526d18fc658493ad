package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.BloomUv
import graft.sources.Tables

/** Extended operator coverage: tumbling-window join (J2), user
  * sessionization (session windows), RANGE-frame burst detection (the
  * C2 count-in-window login-fail variant), value histograms, and the
  * Bloom-bitmap UV fidelity mode (A5).
  */
object ExtendedAnalytics {

  // ------------------------------------------------- window join (J2)
  /** The reference's tumbling-window join (OT/app/TxMatchWithJoin.scala:
    * 42-47): equi-key join where both sides must fall in the SAME
    * tumbling window — expressed as key + window-bucket equality, which
    * keeps it a plain shuffle equi-join on (key, bucket).
    */
  private def q10WindowJoin(spark: SparkSession, dir: String): DataFrame = {
    val bucket = 30L * 86400
    val o = Tables.orders(spark, dir).select(col("o_orderkey"),
      (unix_seconds(col("o_orderdate").cast("timestamp")) / bucket).cast("long").as("wb"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_linenumber"),
      (unix_seconds(col("l_shipdate").cast("timestamp")) / bucket).cast("long").as("wb"))
    o.join(l, o("o_orderkey") === l("l_orderkey") && o("wb") === l("wb"))
      .select(col("o_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        o("wb").as("window_bucket"))
  }

  private val q10WindowJoinOracle =
    """SELECT o.o_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(FLOOR(EPOCH(o.o_orderdate) / 2592000) AS BIGINT) AS window_bucket
      |FROM orders o JOIN lineitem l
      |  ON o.o_orderkey = l.l_orderkey
      | AND FLOOR(EPOCH(o.o_orderdate) / 2592000) = FLOOR(EPOCH(l.l_shipdate) / 2592000)""".stripMargin

  // ----------------------------------------------------- sessionization
  /** Per-user session windows (30-minute inactivity gap) via Spark's
    * `session_window` — merging windows with watermark-driven state at
    * stream time, a gap in the reference's operator set. Timestamps are
    * floored to seconds on both engines so gap comparisons agree.
    */
  private def sessionize(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("tsec", timestamp_seconds(col("ts").cast("long")))
      .groupBy(session_window(col("tsec"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("n_events"))
  }

  private val sessionizeOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es FROM events),
      |m AS (
      |  SELECT user_id, es,
      |         -- Spark session_window merges when the next event starts AT
      |         -- the previous window end (boundary-inclusive): break only > gap
      |         CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
      |              THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es)),
      |g AS (
      |  SELECT user_id, es,
      |         sum(brk) OVER (PARTITION BY user_id ORDER BY es ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM m)
      |SELECT user_id, min(es) AS session_start, max(es) + 1800 AS session_end,
      |       count(*) AS n_events
      |FROM g GROUP BY user_id, grp""".stripMargin

  // ------------------------------------ burst detection (C2, RANGE frame)
  /** Count-in-window login-fail variant (LF/app/LoginFail.scala:39-69
    * intent: >= 3 fails within 2 hours): a RANGE-frame running count
    * over event time — no state machine needed in batch, and the frame
    * is exactly the reference's buffered-window semantics.
    */
  private def loginBurst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("fail_sec"))
      .rangeBetween(-7200, Window.currentRow)
    Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").cast("long").as("fail_sec"))
      .withColumn("n_fails", count(lit(1)).over(w).cast("long"))
      .withColumn("first_fail", min(col("fail_sec")).over(w))
      .filter(col("n_fails") >= 3)
      .select(col("user_id"), col("first_fail"), col("fail_sec").as("last_fail"), col("n_fails"))
  }

  private val loginBurstOracle =
    """WITH f AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS fail_sec
      |  FROM events WHERE event_type = 'error')
      |SELECT user_id, first_fail, fail_sec AS last_fail, n_fails FROM (
      |  SELECT user_id, fail_sec,
      |         count(*) OVER w AS n_fails,
      |         min(fail_sec) OVER w AS first_fail
      |  FROM f
      |  WINDOW w AS (PARTITION BY user_id ORDER BY fail_sec
      |               RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW)) t
      |WHERE n_fails >= 3""".stripMargin

  // -------------------------------------------------- value histogram
  /** Fixed-width histogram of event values per type — decimal-exact
    * sums, integer buckets.
    */
  private def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .withColumn("bucket", floor(col("value") / 25).cast("long"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
  }

  private val valueHistogramOracle =
    """SELECT event_type, CAST(FLOOR(value / 25) AS BIGINT) AS bucket,
      |       count(*) AS n,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------- Bloom UV (A5)
  /** Hourly UV via the reference-faithful Bloom bitmap aggregator.
    * The reference's Bloom uses a SINGLE hash function
    * (NF/app/UvWithBloom.scala:103-114), so its set-bit count equals
    * the number of distinct hash buckets — order-independent, which
    * makes the collision-lossy result EXACTLY reproducible: the oracle
    * replays the same seed-61 polynomial hash in SQL and counts
    * distinct buckets per window.
    */
  private def uvBloom(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .filter(col("event_type") === "view")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(BloomUv.bloomUv(col("user_id"), 1 << 16).as("uv_bloom"))
      .select(col("window.start").cast("long").as("window_start"), col("uv_bloom"))
  }

  private val uvBloomOracle =
    """WITH h AS (
      |  SELECT CAST(FLOOR(EPOCH(ts)/3600)*3600 AS BIGINT) AS window_start,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(1, length(CAST(user_id AS VARCHAR)) + 1),
      |        i -> CAST(ascii(substr(CAST(user_id AS VARCHAR), i, 1)) AS BIGINT))),
      |      (acc, c) -> (acc * 61 + c) & 1099511627775) & 65535 AS bitpos
      |  FROM events WHERE event_type = 'view')
      |SELECT window_start, count(DISTINCT bitpos) AS uv_bloom
      |FROM h GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q10_window_join", Some(q10WindowJoinOracle), q10WindowJoin),
    GraftQuery("sessionize", Some(sessionizeOracle), sessionize),
    GraftQuery("q9_login_burst", Some(loginBurstOracle), loginBurst),
    GraftQuery("value_histogram", Some(valueHistogramOracle), valueHistogram),
    GraftQuery("q5_uv_bloom", Some(uvBloomOracle), uvBloom),
  )
}
