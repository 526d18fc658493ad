package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed readers for the driver-provided parquet tables
  * (`/root/testdata/sf*`, see TESTDATA.md). All readers are plain
  * parquet scans — column pruning and predicate pushdown reach the
  * scan because nothing here materializes or caches eagerly.
  *
  * The `events` table stands in for the reference's user-behavior
  * stream (reference schema: DW-Flink/HotItemsAnalysis/.../bean/
  * UserBehavior.scala:15-19): `user_id` ↔ userId, `event_type` ↔
  * behavior, `ts` ↔ timestamp, and the JSON `props.k` field ↔ itemId.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** The events parquet stores `ts` as TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read nanos as raw longs and truncate to
    * microsecond timestamps with integer division — bit-identical to
    * how DuckDB (µs-native) loads the same file, so oracle comparisons
    * stay exact.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")

  /** events + `item_id` extracted from the JSON props column — the
    * analogue of the reference's itemId field. `get_json_object` is a
    * codegen'd built-in; no UDF.
    */
  def eventsWithItem(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("item_id", get_json_object(col("props"), "$.k").cast("long"))
}
