package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time window aggregation helpers.
  *
  * Re-expresses the reference's Flink window operators (SURVEY.md §2.4,
  * e.g. sliding 1h/5m keyed count at DW-Flink/HotItemsAnalysis/.../app/
  * HotItems.scala:56-58) as declarative `groupBy(window(...))` plans so
  * Catalyst plans a single partial+final HashAggregate with map-side
  * combine — the incremental pre-aggregation the reference hand-codes
  * with Flink `AggregateFunction` (HotItems.scala:66-74) is free here.
  *
  * Window bounds are emitted as **epoch-second BIGINT columns**
  * (`window_start`, `window_end`) rather than nested structs or
  * timestamps: integer columns hash identically across engines, which
  * keeps the DuckDB-oracle comparison exact and keeps downstream
  * re-keying (top-K per window) on a cheap fixed-width shuffle key.
  */
object TimeWindows {

  /** Flatten Spark's `window` struct to epoch-second longs. */
  private def flattenWindow(df: DataFrame): DataFrame =
    df.withColumn("window_start", col("window.start").cast("long"))
      .withColumn("window_end", col("window.end").cast("long"))
      .drop("window")

  /** Tumbling-window aggregation keyed by `keys` (possibly empty — the
    * reference's `timeWindowAll` at NF/app/UniqueVisitor.scala:31 is
    * just a no-key group-by here, but parallelized via partial aggs).
    */
  def tumblingAgg(df: DataFrame, tsCol: String, size: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    flattenWindow(
      df.groupBy((window(col(tsCol), size) +: keys): _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Sliding-window aggregation. Each row replicates into size/slide
    * windows inside the codegen'd Expand before the partial aggregate —
    * no driver-side loops, scales linearly with (rows × overlap).
    */
  def slidingAgg(df: DataFrame, tsCol: String, size: String, slide: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    flattenWindow(
      df.groupBy((window(col(tsCol), size, slide) +: keys): _*)
        .agg(aggs.head, aggs.tail: _*))

  /** Parse the interval strings this engine's windows use ("1 hour",
    * "30 minutes", "15 seconds") to whole seconds.
    */
  private def secondsOf(s: String): Long = {
    val Array(n, unit) = s.trim.split("\\s+")
    val mult = unit.toLowerCase match {
      case "second" | "seconds" => 1L
      case "minute" | "minutes" => 60L
      case "hour" | "hours" => 3600L
      case "day" | "days" => 86400L
      case other => throw new IllegalArgumentException(s"unsupported interval unit: $other")
    }
    n.toLong * mult
  }

  /** Sliding COUNT via panes (Flink's sliding-window pane optimization):
    * rows first aggregate into non-overlapping slide-sized panes — one
    * row per (pane, key) — and each pane row then fans out to the
    * size/slide windows containing it. The expand runs over PANE rows
    * instead of event rows, cutting map-side volume by the overlap
    * factor (12× for 1h/5m) before any shuffle; counts are associative
    * integers, so pane-sum == window-sum exactly and the plain
    * `window()` oracles stay hash-exact. Window starts are slide
    * multiples (epoch-aligned), identical to `window(ts, size, slide)`
    * with the default start time: an event in pane p belongs to
    * exactly the windows starting at p-(size-slide) .. p step slide.
    */
  def slidingCount(df: DataFrame, tsCol: String, size: String, slide: String, keys: Column*): DataFrame = {
    val sz = secondsOf(size)
    val sl = secondsOf(slide)
    require(sz % sl == 0, s"window size $size must be a multiple of slide $slide")
    // ts - pmod(ts, sl) is floor alignment for ALL timestamps (pmod is
    // non-negative), matching window()'s pre-epoch behavior where a
    // double-divide + cast("long") would truncate toward zero instead.
    val tsLong = col(tsCol).cast("long")
    val pane = (tsLong - pmod(tsLong, lit(sl))).as("__pane")
    df.groupBy((pane +: keys): _*)
      .agg(count(lit(1)).as("__pcnt"))
      .select((keys :+ col("__pcnt") :+
        explode(sequence(col("__pane") - (sz - sl), col("__pane"), lit(sl)))
          .as("window_start")): _*)
      .groupBy((col("window_start") +: keys): _*)
      .agg(sum(col("__pcnt")).as("cnt"))
      .withColumn("window_end", col("window_start") + sz)
  }

  def tumblingCount(df: DataFrame, tsCol: String, size: String, keys: Column*): DataFrame =
    tumblingAgg(df, tsCol, size, keys, Seq(count(lit(1)).as("cnt")))
}
