package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{TimeWindows, TopK}
import graft.sources.Tables

/** The reference's 10 analytics jobs (SURVEY.md §0 Q1-Q10) re-expressed
  * as declarative Spark plans over the driver's `events` table
  * (user_id ↔ userId, JSON props.k ↔ itemId, event_type ↔ behavior).
  * Every query is a pure DataFrame plan — Catalyst pushes the filters
  * into the parquet scan, plans partial+final aggregates, and
  * broadcasts the dimension sides of the geo join.
  */
object EventAnalytics {

  /** DuckDB fragment: sliding-window start (epoch sec) replicated via a
    * lateral generate_series — mirrors Spark's `window(ts, size, slide)`
    * Expand (both align window starts to multiples of `slide` from the
    * 1970 epoch, UTC).
    */
  private def duckSlide(slideSec: Long, tsExpr: String = "ts"): String =
    s"CAST(FLOOR(EPOCH($tsExpr)/$slideSec)*$slideSec - g.i*$slideSec AS BIGINT)"

  private def duckTumble(sizeSec: Long, tsExpr: String = "ts"): String =
    s"CAST(FLOOR(EPOCH($tsExpr)/$sizeSec)*$sizeSec AS BIGINT)"

  private val itemIdSql = "CAST(json_extract_string(props, '$.k') AS BIGINT)"

  // ---------------------------------------------------------------- Q1
  /** Hot items: top-3 items per 1h/5m sliding window.
    * Reference: DW-Flink/HotItemsAnalysis/.../app/HotItems.scala:34-63
    * (sliding keyed count + ListState/timer top-N process function).
    * Spark-first: window() group-by count, then rank-limit
    * (row_number <= 3), which plans as WindowGroupLimit — bounded
    * per-partition state, no driver sort.
    */
  private def q1HotItems(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsWithItem(spark, dir).filter(col("event_type") === "click")
    val counts = TimeWindows.slidingCount(ev, "ts", "1 hour", "5 minutes", col("item_id"))
    TopK.topK(counts, 3, Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn").cast("long").as("rn"))
  }

  private val q1Oracle =
    s"""WITH w AS (
       |  SELECT ${duckSlide(300)} AS window_start, $itemIdSql AS item_id
       |  FROM events CROSS JOIN generate_series(0, 11) g(i)
       |  WHERE event_type = 'click'),
       |c AS (SELECT window_start, item_id, count(*) AS cnt FROM w GROUP BY 1, 2)
       |SELECT window_start, item_id, cnt, rn FROM (
       |  SELECT c.*, row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, item_id) AS rn
       |  FROM c) t
       |WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------- Q2
  /** Hot pages: top-5 items per 30m/5m window, with the reference's
    * negated-regex URL filter (NF/app/NetworkFlow.scala:49-52) mapped to
    * `NOT event_type RLIKE ...` — the negation lives in the predicate,
    * so it still pushes down to the scan.
    */
  private def q2HotPages(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsWithItem(spark, dir)
      .filter(!col("event_type").rlike("(error|signup)$"))
    val counts = TimeWindows.slidingCount(ev, "ts", "30 minutes", "5 minutes", col("item_id"))
    TopK.topK(counts, 5, Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn").cast("long").as("rn"))
  }

  private val q2Oracle =
    s"""WITH w AS (
       |  SELECT ${duckSlide(300)} AS window_start, $itemIdSql AS item_id
       |  FROM events CROSS JOIN generate_series(0, 5) g(i)
       |  WHERE NOT regexp_matches(event_type, '(error|signup)$$')),
       |c AS (SELECT window_start, item_id, count(*) AS cnt FROM w GROUP BY 1, 2)
       |SELECT window_start, item_id, cnt, rn FROM (
       |  SELECT c.*, row_number() OVER (PARTITION BY window_start ORDER BY cnt DESC, item_id) AS rn
       |  FROM c) t
       |WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------- Q3
  /** Hourly page views (NF/app/PageView.scala:15-35): tumbling count. */
  private def q3PageView(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") === "view")
    TimeWindows.tumblingCount(ev, "ts", "1 hour")
      .select(col("window_start"), col("cnt").as("pv"))
  }

  private val q3Oracle =
    s"""SELECT ${duckTumble(3600)} AS window_start, count(*) AS pv
       |FROM events WHERE event_type = 'view' GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q4
  /** Hourly exact unique visitors (NF/app/UniqueVisitor.scala:18-36).
    * The reference materializes a per-window Set on one task; Spark's
    * countDistinct plans a two-phase (partial-distinct, final) agg —
    * same answer, fully parallel.
    */
  private def q4UniqueVisitors(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") === "view")
    TimeWindows.tumblingAgg(ev, "ts", "1 hour", Seq.empty,
        Seq(countDistinct(col("user_id")).as("uv")))
      .select(col("window_start"), col("uv"))
  }

  private val q4Oracle =
    s"""SELECT ${duckTumble(3600)} AS window_start, count(DISTINCT user_id) AS uv
       |FROM events WHERE event_type = 'view' GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q5
  /** Hourly approximate UV. The reference hand-rolls a Bloom filter in
    * a Redis bitmap (NF/app/UvWithBloom.scala:74-114); the Spark-native
    * answer is HLL++ (`approx_count_distinct`) — partial-mergeable,
    * bounded memory, no external store. No DuckDB oracle (different
    * sketch implementations); the driver records a rows-only check, and
    * UvSpec asserts the estimate is within rsd of q4's exact UV.
    */
  private def q5ApproxUv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") === "view")
    TimeWindows.tumblingAgg(ev, "ts", "1 hour", Seq.empty,
        Seq(approx_count_distinct(col("user_id"), 0.02).as("uv_approx")))
      .select(col("window_start"), col("uv_approx"))
  }

  // ---------------------------------------------------------------- Q6
  /** Marketing counts per (channel, behavior) on a 1h/15m sliding
    * window (MA/app/AppMarketingByChannel.scala:20-36). channel_id is a
    * derived dimension (user_id mod 5) to mirror the two-column key.
    */
  private def q6ByChannel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type") =!= "error")
      .withColumn("channel_id", col("user_id") % 5)
    TimeWindows.slidingCount(ev, "ts", "1 hour", "15 minutes",
        col("channel_id"), col("event_type"))
      .select(col("window_start"), col("channel_id"), col("event_type"), col("cnt"))
  }

  private val q6Oracle =
    s"""SELECT ${duckSlide(900)} AS window_start, user_id % 5 AS channel_id,
       |       event_type, count(*) AS cnt
       |FROM events CROSS JOIN generate_series(0, 3) g(i)
       |WHERE event_type <> 'error'
       |GROUP BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------- Q7
  /** Marketing totals, same window, no channel split
    * (MA/app/AppMarketing.scala:19-34). */
  private def q7Total(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") =!= "error")
    TimeWindows.slidingCount(ev, "ts", "1 hour", "15 minutes")
      .select(col("window_start"), col("cnt"))
  }

  private val q7Oracle =
    s"""SELECT ${duckSlide(900)} AS window_start, count(*) AS cnt
       |FROM events CROSS JOIN generate_series(0, 3) g(i)
       |WHERE event_type <> 'error'
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- Q8
  /** Ad clicks per geo region, 1h/20m sliding
    * (MA/app/AdStatisticByGeo.scala:21-44). Geo comes from joining the
    * events fact to the customer→nation dimensions — both dim sides are
    * small and broadcast, so the fact table never shuffles.
    */
  private def q8Geo(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") === "click")
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val joined = ev
      .join(broadcast(cust), ev("user_id") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
    TimeWindows.slidingCount(joined, "ts", "1 hour", "20 minutes", col("n_name"))
      .select(col("window_start"), col("n_name").as("province"), col("cnt"))
  }

  private val q8GeoOracle =
    s"""SELECT ${duckSlide(1200, "e.ts")} AS window_start, n.n_name AS province, count(*) AS cnt
       |FROM events e
       |JOIN customer c ON e.user_id = c.c_custkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |CROSS JOIN generate_series(0, 2) g(i)
       |WHERE e.event_type = 'click'
       |GROUP BY 1, 2""".stripMargin

  /** Click-fraud blacklist (MA/app/AdStatisticByGeo.scala:71-112): per
    * (user, item, day) click counts over a threshold. The reference's
    * per-key ValueState + midnight reset timer is exactly a day-bucketed
    * group-by in batch form.
    */
  private def q8Blacklist(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsWithItem(spark, dir).filter(col("event_type") === "click")
    TimeWindows.tumblingCount(ev, "ts", "1 day", col("user_id"), col("item_id"))
      .filter(col("cnt") >= 2)
      .select(col("window_start").as("day_start"), col("user_id"), col("item_id"),
        col("cnt"), lit("click over threshold").as("warn_msg"))
  }

  private val q8BlacklistOracle =
    s"""SELECT ${duckTumble(86400)} AS day_start, user_id, $itemIdSql AS item_id,
       |       count(*) AS cnt, 'click over threshold' AS warn_msg
       |FROM events WHERE event_type = 'click'
       |GROUP BY 1, 2, 3 HAVING count(*) >= 2""".stripMargin

  // ---------------------------------------------------------------- Q9
  /** Login-fail detection (LF/app/LoginFailWithCEP.scala:38-60): two
    * consecutive failures per user within an hour. The CEP NFA is a
    * lag() over an event-time-ordered per-user window — one shuffle,
    * no state machine needed in batch. (The streaming state-machine
    * variant lives in graft.streaming and is checked against this one.)
    */
  private def q9LoginFail(spark: SparkSession, dir: String): DataFrame = {
    val fails = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").cast("long").as("fail_sec"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("fail_sec"), col("event_id"))
    fails
      .withColumn("prev_sec", lag(col("fail_sec"), 1).over(w))
      .filter(col("prev_sec").isNotNull && col("fail_sec") - col("prev_sec") <= 3600)
      .select(col("user_id"), col("prev_sec").as("first_fail"),
        col("fail_sec").as("last_fail"), lit("repeated failures").as("warn_msg"))
  }

  /** Shared with the FSM twin (StatefulQueries) — same output contract. */
  val q9Oracle: String =
    s"""WITH f AS (
       |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS fail_sec, event_id
       |  FROM events WHERE event_type = 'error'),
       |l AS (
       |  SELECT user_id, fail_sec,
       |         lag(fail_sec) OVER (PARTITION BY user_id ORDER BY fail_sec, event_id) AS prev_sec
       |  FROM f)
       |SELECT user_id, prev_sec AS first_fail, fail_sec AS last_fail,
       |       'repeated failures' AS warn_msg
       |FROM l WHERE prev_sec IS NOT NULL AND fail_sec - prev_sec <= 3600""".stripMargin

  // --------------------------------------------------------------- Q10
  /** Order timeout (OT/app/OrderTimeout.scala:18-44): orders with no
    * lineitem shipped within 15 days of order date are "timeout". The
    * streaming create/pay state machine collapses to a left outer join
    * + existence flag in batch.
    */
  private def q10OrderTimeout(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 15 DAYS"),
        "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("l_orderkey")).as("n_shipped"))
      .select(col("o_orderkey"),
        when(col("n_shipped") > 0, "shipped").otherwise("timeout").as("status"))
  }

  private val q10TimeoutOracle =
    """SELECT o_orderkey, CASE WHEN n_shipped > 0 THEN 'shipped' ELSE 'timeout' END AS status
      |FROM (
      |  SELECT o.o_orderkey, count(l.l_orderkey) AS n_shipped
      |  FROM orders o LEFT JOIN lineitem l
      |    ON o.o_orderkey = l.l_orderkey
      |   AND l.l_shipdate >= o.o_orderdate
      |   AND l.l_shipdate <= o.o_orderdate + INTERVAL 15 DAY
      |  GROUP BY 1) t""".stripMargin

  /** Interval join (OT/app/TxMatchWithJoin.scala:50-62): lineitems
    * shipping within [orderdate, orderdate+30d] of their order — an
    * equi-join on the key plus a time-range predicate, Spark's canonical
    * interval-join shape (and at scale, an AQE-planned shuffle join on
    * the equi key with the range as a post-filter).
    */
  private def q10IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    o.join(l,
        o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(col("o_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        unix_seconds(col("l_shipdate").cast("timestamp")).as("ship_sec"))
  }

  private val q10IntervalOracle =
    """SELECT o.o_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
      |       CAST(FLOOR(EPOCH(l.l_shipdate)) AS BIGINT) AS ship_sec
      |FROM orders o JOIN lineitem l
      |  ON o.o_orderkey = l.l_orderkey
      | AND l.l_shipdate >= o.o_orderdate
      | AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("q1_hot_items", Some(q1Oracle), q1HotItems),
    GraftQuery("q2_hot_pages", Some(q2Oracle), q2HotPages),
    GraftQuery("q3_pv_hourly", Some(q3Oracle), q3PageView),
    GraftQuery("q4_uv_hourly", Some(q4Oracle), q4UniqueVisitors),
    GraftQuery("q5_uv_approx", None, q5ApproxUv),
    GraftQuery("q6_marketing_by_channel", Some(q6Oracle), q6ByChannel),
    GraftQuery("q7_marketing_total", Some(q7Oracle), q7Total),
    GraftQuery("q8_ad_geo", Some(q8GeoOracle), q8Geo),
    GraftQuery("q8_blacklist", Some(q8BlacklistOracle), q8Blacklist),
    GraftQuery("q9_login_fail", Some(q9Oracle), q9LoginFail),
    GraftQuery("q10_order_timeout", Some(q10TimeoutOracle), q10OrderTimeout),
    GraftQuery("q10_interval_join", Some(q10IntervalOracle), q10IntervalJoin),
  )
}
