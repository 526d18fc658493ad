package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Sketch / maintenance operators: count-min-sketch heavy hitters and
  * CDC latest-record compaction.
  *
  * The CMS here is the real mergeable sketch, not a simulation: cell
  * counts are plain sums (commutative, order-independent), the hash
  * family is md5-derived (identical hex in both engines), and the
  * estimate is the min over d rows — so the WHOLE sketch, including
  * its overcount error, is exactly reproducible in DuckDB and
  * hash-checked, not just bounded.
  */
object SketchQueries {

  private val CmsD = 4 // hash rows
  private val CmsW = 1024 // buckets per row

  /** Row-i CMS bucket of a key: first 8 md5 hex chars as an int, mod
    * width — the cross-engine-stable universal hash family used
    * throughout the repo (see graft-oracle-determinism).
    */
  private def cmsBucket(i: Int, key: Column): Column =
    conv(substring(md5(concat(lit(s"${i}_"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % CmsW

  private def duckCmsBucket(i: String, key: String): String =
    s"CAST(CAST('0x' || substr(md5($i || '_' || CAST($key AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) % $CmsW"

  /** Count-min-sketch heavy hitters over event item_ids: build the
    * d×w cell table (one explode to d cells per event, then a plain
    * count rollup — 4096 cells total, broadcastable at any corpus
    * size), estimate every distinct item as the min over its d cells,
    * and report the top-20 with their exact counts and the sketch's
    * overcount. At 100 TB the cell table is the ONLY global state —
    * fixed 4096 rows regardless of input — which is the whole point
    * of the sketch; the exact-count column (a second rollup) is the
    * test-time audit a production pipeline would sample, not compute
    * in full.
    */
  private def heavyHittersCms(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.eventsWithItem(spark, dir)
      .filter(col("item_id").isNotNull)
      .select(col("item_id"))
    def cellsOf(key: Column): Column = explode(array(
      (0 until CmsD).map(i =>
        struct(lit(i.toLong).as("r"), cmsBucket(i, key).as("bk"))): _*))
    val cells = ev.select(cellsOf(col("item_id")).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.bk").as("bk"))
      .agg(count(lit(1)).as("cnt"))
    val items = ev.groupBy(col("item_id")).agg(count(lit(1)).as("exact"))
    items
      .select(col("item_id"), col("exact"), cellsOf(col("item_id")).as("cell"))
      .select(col("item_id"), col("exact"),
        col("cell.r").as("r"), col("cell.bk").as("bk"))
      .join(broadcast(cells), Seq("r", "bk"))
      .groupBy(col("item_id"), col("exact"))
      .agg(min(col("cnt")).as("est"))
      .select(col("item_id"), col("est"), col("exact"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy(col("est").desc, col("item_id"))
      .limit(20)
  }

  private val heavyHittersOracle = {
    val itemId = "CAST(json_extract_string(props, '$.k') AS BIGINT)"
    s"""WITH ev AS (
       |  SELECT $itemId AS item_id FROM events WHERE $itemId IS NOT NULL),
       |cells AS (
       |  SELECT g.i AS r, ${duckCmsBucket("g.i", "item_id")} AS bk,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM ev CROSS JOIN generate_series(0, ${CmsD - 1}) g(i)
       |  GROUP BY 1, 2),
       |items AS (SELECT item_id, CAST(count(*) AS BIGINT) AS exact FROM ev GROUP BY 1),
       |est AS (
       |  SELECT it.item_id, it.exact, min(c.cnt) AS est
       |  FROM items it
       |  CROSS JOIN generate_series(0, ${CmsD - 1}) g(i)
       |  JOIN cells c ON c.r = g.i AND c.bk = ${duckCmsBucket("g.i", "it.item_id")}
       |  GROUP BY 1, 2)
       |SELECT item_id, est, exact, est - exact AS overcount
       |FROM est
       |ORDER BY est DESC, item_id
       |LIMIT 20""".stripMargin
  }

  /** CDC latest-record compaction: the newest event per user — the
    * upsert-log → current-snapshot materialization every warehouse
    * runs. One rank-1 window (WindowGroupLimit pushes the limit into
    * the shuffle, so per-partition state is one row per user), total
    * order pinned by (ts, event_id) desc.
    */
  private def cdcLatest(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"),
        col("ts").cast("long").as("ts_sec"), col("event_type"), col("value"))
  }

  private val cdcLatestOracle =
    """SELECT user_id, event_id,
      |       CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS ts_sec, event_type, value
      |FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1""".stripMargin

  // ------------------------------------------------- HLL sketch rollup
  /** Mergeable-sketch UV rollup: per-day user sketches
    * (`hll_sketch_agg`, the Datasketches HLL built into Spark 4)
    * unioned into a per-event-type total with `hll_union_agg` — the
    * store-sketch-bytes-not-raw-data pattern that makes distinct-count
    * rollups O(days × sketch_size) instead of a re-scan at 100 TB.
    * The sketch union is exactly associative, so the unioned estimate
    * EQUALS a direct sketch over the raw stream — asserted against
    * `hll_sketch_agg` over the unsliced data in PipelineShapingSpec, and
    * bounded against the exact distinct here (both engines' rows
    * carry the exact UV; the estimate column is rows-only for the
    * driver since HLL internals are engine-private).
    */
  private def uvSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    // ONE distinct (type, day, user) pass feeds the daily sketches, the
    // daily exact counts AND the per-type exact UV (r16): HLL updates
    // are idempotent, so a sketch built from the distinct rows is
    // byte-identical to one built from the raw stream — the r15 shape
    // re-scanned events a second time for uv_exact and paid the
    // countDistinct Expand twice. uv_exact re-rolls the distinct frame
    // (strictly smaller), and uv_day_exact is a plain count.
    val ud = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"), col("user_id"))
      .distinct()
    val daily = ud.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        count(lit(1)).as("uv_day_exact"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("uv_est"),
        sum(col("uv_day_exact")).as("uv_day_sum"))
      .join(
        ud.select(col("event_type"), col("user_id")).distinct()
          .groupBy(col("event_type")).agg(count(lit(1)).as("uv_exact")),
        "event_type")
      .select(col("event_type"), col("n_days"), col("uv_est"),
        col("uv_exact"), col("uv_day_sum"))
  }

  // ------------------------------------------------- KMV overlap
  private val KmvK = 64

  /** K-Minimum-Values audience overlap: per-segment KMV sketches (the
    * k smallest md5-derived user hashes) estimate pairwise Jaccard,
    * union, and INTERSECTION sizes between day-active audiences — the
    * day-over-day returning-user overlap, i.e. the set algebra HLL
    * cannot do (inclusion–exclusion on HLL compounds error; KMV
    * intersects natively). Sketches are k rows per segment regardless
    * of audience size — the only state that moves — and merging two
    * sketches is re-ranking 2k rows; the pair stage therefore costs
    * pairs × k rows, never a users×users join. Unlike a randomized
    * sketch, KMV over md5 is fully DETERMINISTIC, so the estimates —
    * including their error — replay exactly in DuckDB and are
    * hash-checked, with accuracy separately bounded against exact
    * overlaps in the spec. A sketch with fewer than k values IS its
    * set, so the union estimate switches to the exact count there.
    * (Segments are the 5 earliest active days; event-type audiences
    * are deliberately NOT used — every user touches every type in the
    * synthetic data, which would make every Jaccard exactly 1.)
    */
  private def kmvOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val days = ud.select(col("d")).distinct().orderBy(col("d")).limit(5)
    val uh = ud.join(broadcast(days), "d")
      .select(col("d").cast("string").as("t"),
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long").as("hv"))
      .distinct()
    val wT = Window.partitionBy(col("t")).orderBy(col("hv"))
    val sk = uh.withColumn("rk", row_number().over(wT)).filter(col("rk") <= KmvK)
      .select(col("t"), col("hv")).localCheckpoint() // read by both pair sides
    val tp = sk.select(col("t")).distinct()
    val pairs = tp.as("a").join(tp.as("b"), col("a.t") < col("b.t"))
      .select(col("a.t").as("ta"), col("b.t").as("tb"))
    val ma = pairs.join(sk, col("ta") === col("t"))
      .select(col("ta"), col("tb"), col("hv"), lit(1).as("ia"), lit(0).as("ib"))
    val mb = pairs.join(sk, col("tb") === col("t"))
      .select(col("ta"), col("tb"), col("hv"), lit(0).as("ia"), lit(1).as("ib"))
    val wM = Window.partitionBy(col("ta"), col("tb")).orderBy(col("hv"))
    val merged = ma.union(mb)
      .groupBy(col("ta"), col("tb"), col("hv"))
      .agg(max(col("ia")).as("ina"), max(col("ib")).as("inb"))
      .withColumn("rk", row_number().over(wM)).filter(col("rk") <= KmvK)
    merged.groupBy(col("ta"), col("tb"))
      .agg(count(lit(1)).as("k_used"), max(col("hv")).as("kmax"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L).otherwise(0L)).as("n_both"))
      // QRound on all three: integer ratios / products of terminating
      // decimals — exact-boundary class (ROUND_AUDIT U3), swept r16
      .withColumn("est_jaccard", QRound.col(col("n_both").cast("double") / col("k_used"), 6))
      .withColumn("est_union",
        when(col("k_used") < KmvK, col("k_used").cast("double"))
          .otherwise(QRound.col(lit((KmvK - 1) * 4294967296.0) / col("kmax"), 2)))
      .withColumn("est_intersection", QRound.col(col("est_jaccard") * col("est_union"), 2))
      .select(col("ta").as("day_a"), col("tb").as("day_b"), col("k_used"),
        col("n_both"), col("est_jaccard"), col("est_union"), col("est_intersection"))
  }

  private val kmvOverlapOracle =
    s"""WITH ud AS (
       |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
       |days AS (SELECT d FROM (SELECT DISTINCT d FROM ud ORDER BY d LIMIT 5) t),
       |uh AS (
       |  SELECT DISTINCT CAST(ud.d AS VARCHAR) AS t,
       |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) AS hv
       |  FROM ud JOIN days ON ud.d = days.d),
       |sk AS (
       |  SELECT t, hv FROM (
       |    SELECT t, hv, row_number() OVER (PARTITION BY t ORDER BY hv) AS rk FROM uh) s
       |  WHERE rk <= $KmvK),
       |tp AS (SELECT DISTINCT t FROM sk),
       |pairs AS (SELECT a.t AS ta, b.t AS tb FROM tp a JOIN tp b ON a.t < b.t),
       |m AS (
       |  SELECT ta, tb, hv, max(ia) AS ina, max(ib) AS inb FROM (
       |    SELECT pairs.ta, pairs.tb, sk.hv, 1 AS ia, 0 AS ib
       |    FROM pairs JOIN sk ON sk.t = pairs.ta
       |    UNION ALL
       |    SELECT pairs.ta, pairs.tb, sk.hv, 0 AS ia, 1 AS ib
       |    FROM pairs JOIN sk ON sk.t = pairs.tb) u
       |  GROUP BY 1, 2, 3),
       |mk AS (
       |  SELECT * FROM (
       |    SELECT m.*, row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rk FROM m) s
       |  WHERE rk <= $KmvK),
       |agg AS (
       |  SELECT ta, tb, count(*) AS k_used, max(hv) AS kmax,
       |         CAST(sum(CASE WHEN ina = 1 AND inb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
       |  FROM mk GROUP BY 1, 2),
       |est AS (
       |  SELECT ta, tb, k_used, n_both,
       |         ${QRound.duck("CAST(n_both AS DOUBLE) / k_used", 6)} AS est_jaccard,
       |         CASE WHEN k_used < $KmvK THEN CAST(k_used AS DOUBLE)
       |              ELSE ${QRound.duck(s"${(KmvK - 1) * 4294967296.0} / kmax", 2)} END AS est_union
       |  FROM agg)
       |SELECT ta AS day_a, tb AS day_b, k_used, n_both, est_jaccard, est_union,
       |       ${QRound.duck("est_jaccard * est_union", 2)} AS est_intersection
       |FROM est""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("heavy_hitters_cms", Some(heavyHittersOracle), heavyHittersCms),
    GraftQuery("cdc_latest_compaction", Some(cdcLatestOracle), cdcLatest),
    GraftQuery("uv_sketch_rollup", None, uvSketchRollup),
    GraftQuery("kmv_overlap", Some(kmvOverlapOracle), kmvOverlap),
  )
}
