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

  def slidingCount(df: DataFrame, tsCol: String, size: String, slide: String, keys: Column*): DataFrame =
    slidingAgg(df, tsCol, size, slide, keys, Seq(count(lit(1)).as("cnt")))

  def tumblingCount(df: DataFrame, tsCol: String, size: String, keys: Column*): DataFrame =
    tumblingAgg(df, tsCol, size, keys, Seq(count(lit(1)).as("cnt")))
}
