package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal completeness + engagement operators: gap-filled time
  * series (the dense axis every dashboard and forecast model needs),
  * rolling active-user windows (DAU/WAU/MAU), and item co-occurrence
  * (market-basket pairs). All three reduce the fact stream to a
  * compact distinct/rollup table FIRST and do the expensive
  * combinatorics (grid join, offset explode, pair self-join) on that
  * compact table — the shape that keeps them linear-ish at 100 TB.
  */
object TemporalAnalytics {

  // ------------------------------------------------- gap-filled series
  /** Hourly event counts per type over the COMPLETE hour grid —
    * zero-filled gaps included (a missing hour is data, not absence of
    * a row). The grid is sequence(min_hour, max_hour) crossed with the
    * distinct types (both tiny, broadcast); counts left-join onto it.
    */
  private def gapfillHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("event_type"), expr("(CAST(ts AS LONG) DIV 3600) * 3600").as("hour"))
    val counts = e.groupBy(col("event_type"), col("hour")).agg(count(lit(1)).as("cnt"))
    val bounds = e.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val types = e.select(col("event_type")).distinct()
    val grid = broadcast(types)
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), lit(3600L))).as("hour"))
    grid.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("cnt"), lit(0L)).as("n"))
  }

  private val gapfillOracle =
    """WITH e AS (
      |  SELECT event_type,
      |         (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 3600) * 3600 AS hour
      |  FROM events),
      |c AS (SELECT event_type, hour, count(*) AS cnt FROM e GROUP BY 1, 2),
      |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
      |hours AS (
      |  SELECT unnest(range((SELECT h0 FROM b), (SELECT h1 FROM b) + 1, 3600)) AS hour),
      |g AS (
      |  SELECT t.event_type, hours.hour
      |  FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours)
      |SELECT g.event_type, g.hour, coalesce(c.cnt, 0) AS n
      |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour""".stripMargin

  // ------------------------------------------------ rolling actives
  /** DAU / WAU / MAU per day: distinct users active that day, in the
    * trailing 7 days, and in the trailing 30 days. The fact stream
    * first collapses to the distinct (user, day) table (memoized — one
    * event scan and one distinct shuffle feed all three measures).
    *
    * Rolling distincts are COVERAGE INTERVALS, not explodes (r12,
    * after the century probe measured the explode form at 43×/decade
    * on 100M events): a user counts toward WAU(X) iff their most
    * recent active day is ≥ X−6, so each (user, active day, next
    * active day) contributes the disjoint interval
    * [day, min(day+6, next−1)] — `lead` over the user's day sequence —
    * and WAU(X) is the number of intervals covering X: ±1 deltas at
    * interval ends, then a running sum over the (tiny) day grid. The
    * old form exploded ud × span and re-distinct-counted per window —
    * 1.2 G rows through countDistinct at sf100, where the partial
    * hash-agg's (day, user) keyspace outgrows the task maps and falls
    * back to sort+spill. Day grid is continuous min..max so a
    * zero-activity day still reports its rolling actives.
    */
  private def activeUserWindows(spark: SparkSession, dir: String): DataFrame = {
    val ud = Memo.frame(spark, dir, "user_days") {
      Tables.events(spark, dir)
        .select(col("user_id"), expr("CAST(ts AS LONG) DIV 86400").as("day"))
        .distinct()
    }
    val bounds = ud.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = broadcast(bounds)
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val wUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    // one pass computes both spans' deltas: the lead() shuffle on
    // user_id is the expensive step and is shared
    val iv = ud.withColumn("nxt", lead(col("day"), 1).over(wUser))
    def deltas(span: Int): DataFrame =
      iv.select(col("day").as("s"),
          (least(col("day") + (span - 1),
            coalesce(col("nxt") - 1, col("day") + (span - 1))) + 1).as("e1"))
        .select(explode(array(
          struct(col("s").as("day"), lit(1L).as("d")),
          struct(col("e1").as("day"), lit(-1L).as("d")))).as("x"))
        .groupBy(col("x.day").as("day")).agg(sum(col("x.d")).as("delta"))
    // running sum over the continuous day grid — a single-partition
    // window over ≤ (d1−d0+1) rows (the day axis is tiny by
    // construction; the users dimension is already summed away)
    val wDays = org.apache.spark.sql.expressions.Window
      .orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def rolling(span: Int, name: String): DataFrame =
      grid.join(deltas(span), Seq("day"), "left")
        .withColumn(name, sum(coalesce(col("delta"), lit(0L))).over(wDays))
        .select(col("day"), col(name))
    // ud is already DISTINCT (user, day), so the per-day user count is a
    // plain count — the old countDistinct re-planned a second distinct
    // aggregation over rows that carry no duplicates (r16)
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    grid
      .join(dau, Seq("day"), "left")
      .join(rolling(7, "wau"), Seq("day"), "left")
      .join(rolling(30, "mau"), Seq("day"), "left")
      .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"),
        coalesce(col("mau"), lit(0L)).as("mau"))
  }

  private val activeUsersOracle =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 AS day
      |  FROM events),
      |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud),
      |grid AS (
      |  SELECT unnest(range((SELECT d0 FROM b), (SELECT d1 FROM b) + 1)) AS day),
      |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
      |wau AS (
      |  SELECT ud.day + o.o AS day, count(DISTINCT user_id) AS wau
      |  FROM ud CROSS JOIN generate_series(0, 6) o(o) GROUP BY 1),
      |mau AS (
      |  SELECT ud.day + o.o AS day, count(DISTINCT user_id) AS mau
      |  FROM ud CROSS JOIN generate_series(0, 29) o(o) GROUP BY 1)
      |SELECT grid.day, coalesce(dau.dau, 0) AS dau,
      |       coalesce(wau.wau, 0) AS wau, coalesce(mau.mau, 0) AS mau
      |FROM grid LEFT JOIN dau USING (day) LEFT JOIN wau USING (day) LEFT JOIN mau USING (day)""".stripMargin

  // ---------------------------------------------- item co-occurrence
  /** Top-20 item pairs viewed by the same users (market-basket
    * co-occurrence). The stream collapses to distinct (user, item)
    * first, so the pair self-join's fan-out is per-user-basket², not
    * per-event² — with salting (`saltFactor > 1`) as the skew lever
    * when one user's basket dominates a partition: side A's rows
    * spread across the salts by deterministic row hash, side B
    * replicates per salt, so the hot basket's pair product computes
    * S-ways in parallel instead of on one straggler task. Identical
    * output either way (proven row-for-row on a planted-skew fixture
    * in ScalePostureSpec); the registered query keeps the unsalted
    * plan and leans on AQE's runtime skew split, the salted form is
    * the static lever for when the skew is known up front.
    */
  def cooccurrenceFrom(ui0: DataFrame, saltFactor: Int = 1): DataFrame = {
    val a = ui0.select(col("user_id"), col("item_id").as("ia"))
    val b = ui0.select(col("user_id").as("user_id_b"), col("item_id").as("ib"))
    val joined =
      if (saltFactor <= 1)
        a.join(b, col("user_id") === col("user_id_b") && col("ia") < col("ib"))
      else
        graft.operators.Joins
          .saltedJoin(a, b, col("user_id"), col("user_id_b"), saltFactor)
          .filter(col("ia") < col("ib"))
    joined
      .groupBy(col("ia").as("item_a"), col("ib").as("item_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
      .limit(20)
  }

  private def itemCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ui = Tables.eventsWithItem(spark, dir)
      .filter(col("item_id").isNotNull)
      .select(col("user_id"), col("item_id"))
      .distinct()
    cooccurrenceFrom(ui)
  }

  private val itemCooccurrenceOracle =
    """WITH ui AS (
      |  SELECT DISTINCT user_id, CAST(json_extract(props, '$.k') AS BIGINT) AS item_id
      |  FROM events
      |  WHERE json_extract(props, '$.k') IS NOT NULL)
      |SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS n_users
      |FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item_id < b.item_id
      |GROUP BY 1, 2
      |ORDER BY n_users DESC, item_a, item_b
      |LIMIT 20""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("gapfill_hourly", Some(gapfillOracle), gapfillHourly),
    GraftQuery("active_user_windows", Some(activeUsersOracle), activeUserWindows),
    GraftQuery("item_cooccurrence", Some(itemCooccurrenceOracle), itemCooccurrence),
  )
}
