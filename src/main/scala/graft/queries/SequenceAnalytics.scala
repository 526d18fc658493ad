package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.sources.Tables

/** Ordered-event analytics over the behavior stream: as-of join
  * (point-in-time attribution), funnel progression, and retention
  * cohorts — the event-sequence operators a behavior warehouse runs
  * beside the reference's windowed counts (SURVEY.md §2.8's CEP tier
  * generalized to batch sequence analysis).
  *
  * All three are one-shuffle-per-stage plans: the as-of join is a
  * union + running window (never a range-join explosion), the funnel
  * is a single per-user sort shared by two stacked window operators,
  * and retention reuses the user_id partitioning across its two
  * aggregations.
  */
object SequenceAnalytics {

  // ----------------------------------------------------------- as-of
  /** Click→purchase attribution: each purchase matched to the same
    * user's most recent click at-or-before it (ties on time resolve to
    * the highest click event_id; purchases with no prior click keep
    * nulls). Implemented with [[Joins.asofJoin]].
    */
  private def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("sec"), col("event_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("sec").as("purchase_sec"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("sec"))
    Joins.asofJoin(purchases, clicks,
        purchases("user_id"), clicks("user_id"),
        purchases("purchase_sec"), clicks("sec"),
        clicks("click_id"), Seq(col("click_id"), col("sec").as("click_sec")))
      .select(col("event_id"), col("user_id"), col("purchase_sec"),
        col("__match.click_id").as("click_id"),
        col("__match.click_sec").as("click_sec"))
  }

  /** Oracle mirrors the union + running-window formulation exactly
    * (DuckDB's native ASOF JOIN leaves equal-time ties unspecified;
    * this form pins them).
    */
  private val asofOracle =
    """WITH l AS (
      |  SELECT event_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t
      |  FROM events WHERE event_type = 'purchase'),
      |r AS (
      |  SELECT event_id AS click_id, user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS t
      |  FROM events WHERE event_type = 'click'),
      |u AS (
      |  SELECT user_id AS k, t, 0 AS side, event_id,
      |         NULL::BIGINT AS click_id, NULL::BIGINT AS click_t FROM l
      |  UNION ALL
      |  SELECT user_id, t, 1, NULL, click_id, t FROM r),
      |w AS (
      |  SELECT *,
      |    last_value(click_id IGNORE NULLS) OVER win AS m_click,
      |    last_value(click_t IGNORE NULLS) OVER win AS m_t
      |  FROM u
      |  WINDOW win AS (PARTITION BY k ORDER BY t, side DESC, click_id NULLS FIRST
      |                 ROWS UNBOUNDED PRECEDING))
      |SELECT event_id, k AS user_id, t AS purchase_sec,
      |       m_click AS click_id, m_t AS click_sec
      |FROM w WHERE side = 0""".stripMargin

  // ---------------------------------------------------------- funnel
  /** Per-user view→click→purchase funnel: the earliest click AFTER a
    * view and the earliest purchase AFTER such a click, via running
    * conditional minima over one per-user sort (the two stacked window
    * operators share the same partitioning and ordering — one
    * exchange, one sort).
    */
  private def funnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = e
      .withColumn("cum_view",
        min(when(col("event_type") === "view", col("sec"))).over(w))
      .withColumn("cum_click",
        min(when(col("event_type") === "click" && col("cum_view").isNotNull,
          col("sec"))).over(w))
    staged.groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("sec"))).as("t_view"),
        min(when(col("event_type") === "click" && col("cum_view").isNotNull,
          col("sec"))).as("t_click"),
        min(when(col("event_type") === "purchase" && col("cum_click").isNotNull,
          col("sec"))).as("t_purchase"))
      .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"),
        when(col("t_purchase").isNotNull, "purchase")
          .when(col("t_click").isNotNull, "click")
          .when(col("t_view").isNotNull, "view")
          .otherwise("none").as("stage"))
  }

  private val funnelOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, event_id, event_type
      |  FROM events),
      |w1 AS (
      |  SELECT *, min(CASE WHEN event_type = 'view' THEN sec END) OVER win AS cum_view
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING)),
      |w2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND cum_view IS NOT NULL THEN sec END)
      |              OVER win AS cum_click
      |  FROM w1
      |  WINDOW win AS (PARTITION BY user_id ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING)),
      |f AS (
      |  SELECT user_id,
      |    min(CASE WHEN event_type = 'view' THEN sec END) AS t_view,
      |    min(CASE WHEN event_type = 'click' AND cum_view IS NOT NULL THEN sec END) AS t_click,
      |    min(CASE WHEN event_type = 'purchase' AND cum_click IS NOT NULL THEN sec END) AS t_purchase
      |  FROM w2 GROUP BY 1)
      |SELECT user_id, t_view, t_click, t_purchase,
      |  CASE WHEN t_purchase IS NOT NULL THEN 'purchase'
      |       WHEN t_click IS NOT NULL THEN 'click'
      |       WHEN t_view IS NOT NULL THEN 'view'
      |       ELSE 'none' END AS stage
      |FROM f""".stripMargin

  // ------------------------------------------------------- retention
  /** Classic retention matrix: users bucketed by first-active day
    * (epoch-day), counted at each later active-day offset. The
    * (user, day) distinct, the per-user min, and the final rollup all
    * partition by user_id first — the exchange is planned once.
    */
  private def retention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  private val retentionOracle =
    """WITH d AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1)
      |SELECT c.cohort_day, d.day - c.cohort_day AS day_offset, count(*) AS n_users
      |FROM d JOIN c USING (user_id)
      |GROUP BY 1, 2""".stripMargin

  // ----------------------------------------------------- transitions
  /** Behavior path analysis: per-user consecutive event-type bigrams
    * (the Markov transition matrix of the site) — one per-user sort,
    * lead(1), then a count rollup.
    */
  private def transitions(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        col("event_id"), col("event_type"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    e.withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
  }

  private val transitionsOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS sec, event_id, event_type
      |  FROM events),
      |l AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS next_type
      |  FROM e)
      |SELECT event_type, next_type, count(*) AS n, count(DISTINCT user_id) AS n_users
      |FROM l WHERE next_type IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------ EWMA smooth
  /** Per-user exponentially weighted moving average of event values —
    * the standard stream-smoothing statistic. An EWMA is inherently a
    * sequential fold (each step depends on the previous), which SQL
    * windows cannot express; the distributed shape is
    * sort-within-group + fold: collect each user's (ts, id, value)
    * run, sort it deterministically, and fold `0.3·x + 0.7·acc` —
    * per-user state is one run in flight, partitioned by user across
    * the cluster. Both engines fold in the identical order, so the
    * doubles match bit-for-bit (same discipline as the vector dots).
    */
  private def ewmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("sec"),
        col("event_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("sec"), col("event_id"), col("value")))).as("run"))
      .select(col("user_id"), col("n_events"),
        round(aggregate(col("run"), lit(0.0).cast("double"),
          (acc, x) => lit(0.3) * x.getField("value") + lit(0.7) * acc), 6).as("ewma"))
  }

  private val ewmaOracle =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(list_reduce(
      |    list_prepend(CAST(0.0 AS DOUBLE), list(CAST(value AS DOUBLE)
      |      ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT), event_id)),
      |    (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma
      |FROM events
      |GROUP BY user_id""".stripMargin

  // ------------------------------------------------- session paths
  /** Top-20 session paths: the ordered event-type sequence (first 5
    * events) of each 30-minute-gap session, counted across sessions —
    * the navigation-pattern rollup behind "what do users do". Session
    * grouping is the gaps-and-islands form (same semantics as
    * `sessionize`); the per-session path folds a sorted collect of AT
    * MOST 5 events (bounded state per group), and the path rollup is
    * an ordinary string-keyed count with a TakeOrderedAndProject.
    */
  private def sessionPaths(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("es"),
        col("event_id"), col("event_type"))
      .withColumn("brk",
        when(lag(col("es"), 1).over(wOrd).isNull ||
          col("es") - lag(col("es"), 1).over(wOrd) > 1800, 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(wRun))
      .groupBy(col("user_id"), col("grp"))
      .agg(collect_list(struct(col("es"), col("event_id"), col("event_type"))).as("evs"))
      .withColumn("path",
        array_join(slice(transform(array_sort(col("evs")),
          e => e.getField("event_type")), 1, 5), ">"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(20)
  }

  private val sessionPathsOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es, event_id, event_type
      |  FROM events),
      |m AS (
      |  SELECT *, CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 1800
      |                 THEN 1 ELSE 0 END AS brk
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |g AS (
      |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY es, event_id
      |                           ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM m),
      |p AS (
      |  SELECT user_id, grp,
      |         array_to_string(list(event_type ORDER BY es, event_id)[1:5], '>') AS path
      |  FROM g GROUP BY 1, 2)
      |SELECT path, count(*) AS n_sessions
      |FROM p GROUP BY 1
      |ORDER BY n_sessions DESC, path
      |LIMIT 20""".stripMargin

  // -------------------------------------------- last-touch attribution
  /** Last-touch purchase attribution: each purchase credits the user's
    * most recent preceding NON-purchase event type (`none` when the
    * purchase opens the history). One user-partitioned window with an
    * ignore-nulls `last` over the preceding-exclusive frame — the
    * point-in-time attribution join expressed without any join at all.
    */
  private def purchaseAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), expr("CAST(ts AS LONG)").as("es"),
        col("event_id"), col("event_type"))
      .withColumn("prev_touch",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("prev_touch"), lit("none")).as("attributed_to"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val attributionOracle =
    """WITH e AS (
      |  SELECT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS es, event_id, event_type
      |  FROM events),
      |t AS (
      |  SELECT user_id, event_type,
      |         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY es, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_touch
      |  FROM e)
      |SELECT coalesce(prev_touch, 'none') AS attributed_to,
      |       count(*) AS n_purchases, count(DISTINCT user_id) AS n_users
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("asof_join", Some(asofOracle), asofJoin),
    GraftQuery("funnel_analysis", Some(funnelOracle), funnel),
    GraftQuery("retention_cohort", Some(retentionOracle), retention),
    GraftQuery("event_transitions", Some(transitionsOracle), transitions),
    GraftQuery("ewma_smooth", Some(ewmaOracle), ewmaSmooth),
    GraftQuery("session_paths", Some(sessionPathsOracle), sessionPaths),
    GraftQuery("purchase_attribution", Some(attributionOracle), purchaseAttribution),
  )
}
