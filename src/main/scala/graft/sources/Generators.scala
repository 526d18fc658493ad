package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Simulated sources, Spark-first: the reference's hand-rolled
  * `RichSourceFunction` generator (MA/source/SimulatedEventSource.scala:
  * 17-41 — 100 events/s, uniform channel/behavior draw, UUID user) maps
  * to the built-in `rate` source plus column expressions. Deterministic
  * by construction (domain values indexed by the rate counter), so
  * tests can assert exact distributions — the reference's
  * `Random.nextInt` cannot.
  */
object Generators {

  /** Channel domain — `DOWNLOWD` typo kept deliberately: it is data
    * fidelity with the reference's generator
    * (MA/source/SimulatedEventSource.scala:20-22), not a bug to fix.
    */
  val Behaviors: Seq[String] = Seq("CLICK", "DOWNLOWD", "UPDATE", "INSTALL", "UNINSTALL")
  val Channels: Seq[String] = Seq("AppStore", "HuaweiStore", "XiaomiStore", "weibo", "wechat")

  private def pick(domain: Seq[String], idx: org.apache.spark.sql.Column) =
    element_at(array(domain.map(lit): _*), (pmod(idx, lit(domain.size)) + 1).cast("int"))

  /** Streaming marketing-event source at `rowsPerSecond`. Columns match
    * the reference's MarketingUserBehavior bean: (user_id, behavior,
    * channel, ts).
    */
  def marketingStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond)
      .load()
      .select(
        md5(col("value").cast("string")).as("user_id"),
        pick(Behaviors, col("value")).as("behavior"),
        pick(Channels, col("value") / lit(Behaviors.size)).as("channel"),
        col("timestamp").as("ts"))

  /** Batch variant with explicit event times — n events starting at
    * startEpochSec, one every stepMs (for tests and backfills).
    */
  def marketingBatch(spark: SparkSession, n: Long, startEpochSec: Long, stepMs: Long): DataFrame =
    spark.range(n)
      .select(
        md5(col("id").cast("string")).as("user_id"),
        pick(Behaviors, col("id")).as("behavior"),
        pick(Channels, col("id") / lit(Behaviors.size)).as("channel"),
        timestamp_millis(lit(startEpochSec * 1000) + col("id") * stepMs).as("ts"))
}
