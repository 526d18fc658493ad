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
    val e = Tables.events(spark, dir)
      .select(col("event_type"),
        expr("CAST(ts AS LONG) DIV 86400").as("day"), col("user_id"))
    val daily = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"),
        countDistinct(col("user_id")).as("uv_day_exact"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("uv_est"),
        sum(col("uv_day_exact")).as("uv_day_sum"))
      .join(
        e.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("uv_exact")),
        "event_type")
      .select(col("event_type"), col("n_days"), col("uv_est"),
        col("uv_exact"), col("uv_day_sum"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("heavy_hitters_cms", Some(heavyHittersOracle), heavyHittersCms),
    GraftQuery("cdc_latest_compaction", Some(cdcLatestOracle), cdcLatest),
    GraftQuery("uv_sketch_rollup", None, uvSketchRollup),
  )
}
