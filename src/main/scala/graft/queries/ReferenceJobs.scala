package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomUv
import graft.operators.{TimeWindows, TopK}
import graft.streaming.StateMachines
import graft.streaming.StateMachines.{LoginEvent, LoginState, OrderEvent, OrderState}

/** The reference's job surface, 1:1 — each function is the batch form
  * of one reference `main()`, taking the SAME bean shape the reference
  * consumes (parsed by graft.sources.TextIngest) and emitting the same
  * result shape. A user of tiankx1003/Data-Warehouse-Flink switches by
  * pointing these at their files; the streaming forms compose the same
  * plans over `readStream` inputs (see graft.streaming).
  *
  * Column-name contract per bean: see TextIngest schemas
  * (user_id/item_id/behavior/ts..., FIXTURES.md §1-§6).
  */
object ReferenceJobs {

  /** Q1 HotItems (HI/app/HotItems.scala:34-63): top-N most-clicked
    * items per sliding window over UserBehavior beans.
    */
  def hotItems(ub: DataFrame, size: String = "1 hour", slide: String = "5 minutes",
      n: Int = 3): DataFrame = {
    val counts = TimeWindows.slidingCount(
      ub.filter(col("behavior") === "pv"), "ts", size, slide, col("item_id"))
    TopK.topK(counts, n, Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn"))
  }

  /** Q2 NetworkFlow hot URLs (NF/app/NetworkFlow.scala:32-60): top-N
    * URLs per sliding window over ApacheLogEvent beans, static
    * resources excluded.
    */
  def hotUrls(logs: DataFrame, size: String = "10 minutes", slide: String = "5 seconds",
      n: Int = 5): DataFrame = {
    val counts = TimeWindows.slidingCount(
      logs.filter(!col("url").rlike("\\.(css|js)$")), "ts", size, slide, col("url"))
    TopK.topK(counts, n, Seq(col("window_start")), Seq(col("cnt").desc, col("url")))
      .select(col("window_start"), col("url"), col("cnt"), col("rn"))
  }

  /** Q3 PageView (NF/app/PageView.scala:15-35): hourly site PV. */
  def pageView(ub: DataFrame, size: String = "1 hour"): DataFrame =
    TimeWindows.tumblingCount(ub.filter(col("behavior") === "pv"), "ts", size)
      .select(col("window_start"), col("cnt").as("pv"))

  /** Q4 UniqueVisitor (NF/app/UniqueVisitor.scala:18-36): hourly exact UV. */
  def uniqueVisitors(ub: DataFrame, size: String = "1 hour"): DataFrame =
    TimeWindows.tumblingAgg(ub.filter(col("behavior") === "pv"), "ts", size, Seq.empty,
        Seq(countDistinct(col("user_id")).as("uv")))
      .select(col("window_start"), col("uv"))

  /** Q5 UvWithBloom (NF/app/UvWithBloom.scala:25-46): hourly approx UV
    * via the Bloom-bitmap fidelity aggregator (or swap in
    * approx_count_distinct for HLL++).
    */
  def uvWithBloom(ub: DataFrame, size: String = "1 hour", bits: Int = 1 << 20): DataFrame =
    ub.filter(col("behavior") === "pv")
      .groupBy(window(col("ts"), size))
      .agg(BloomUv.bloomUv(col("user_id"), bits).as("uv"))
      .select(col("window.start").cast("long").as("window_start"), col("uv"))

  /** Q6 AppMarketingByChannel (MA/app/AppMarketingByChannel.scala:20-36). */
  def marketingByChannel(mkt: DataFrame, size: String = "1 hour",
      slide: String = "10 seconds"): DataFrame =
    TimeWindows.slidingCount(
      mkt.filter(col("behavior") =!= "UNINSTALL"), "ts", size, slide,
      col("channel"), col("behavior"))
      .select(col("window_start"), col("channel"), col("behavior"), col("cnt"))

  /** Q7 AppMarketing total (MA/app/AppMarketing.scala:19-34). */
  def marketingTotal(mkt: DataFrame, size: String = "1 hour",
      slide: String = "10 seconds"): DataFrame =
    TimeWindows.slidingCount(
      mkt.filter(col("behavior") =!= "UNINSTALL"), "ts", size, slide)
      .select(col("window_start"), col("cnt"))

  /** Q8 AdStatisticByGeo (MA/app/AdStatisticByGeo.scala:21-44): clicks
    * per province per sliding window, blacklisted (user, ad) pairs
    * excluded first — preserving the reference's dataflow order.
    */
  def adStatByProvince(clicks: DataFrame, size: String = "1 hour", slide: String = "10 seconds",
      blacklistThreshold: Long = 50): DataFrame = {
    val bl = blacklist(clicks, blacklistThreshold).select(col("user_id"), col("ad_id"))
    val clean = clicks.join(bl, Seq("user_id", "ad_id"), "left_anti")
    TimeWindows.slidingCount(clean, "ts", size, slide, col("province"))
      .select(col("window_start"), col("province"), col("cnt"))
  }

  /** Q8 side output (MA/app/AdStatisticByGeo.scala:71-112): (user, ad,
    * day) pairs over the click threshold.
    */
  def blacklist(clicks: DataFrame, threshold: Long = 50): DataFrame =
    TimeWindows.tumblingCount(clicks, "ts", "1 day", col("user_id"), col("ad_id"))
      .filter(col("cnt") >= threshold)
      .select(col("window_start").as("day_start"), col("user_id"), col("ad_id"), col("cnt"),
        lit(s"click count >= $threshold").as("warn_msg"))

  /** Q9 LoginFail (LF/app/LoginFailWithCEP.scala:38-60): consecutive
    * fails within `maxGapSec` per user, success clears — the full CEP
    * semantics via the pure state machine.
    */
  def loginFailWarnings(logins: DataFrame, maxGapSec: Long = 2): DataFrame = {
    val spark = logins.sparkSession
    import spark.implicits._
    logins
      .select(col("user_id"), col("ts").cast("long").as("ts_sec"),
        (col("status") === "fail").as("failed"))
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .flatMapGroups { (uid, it) =>
        // tiebreaker: at equal timestamps, successes sort before fails
        // (deterministic across shuffles — ts alone is not a total order)
        val sorted = it.toSeq.sortBy(r => (r._2, r._3))
        StateMachines.loginFold(uid, sorted.map(r => (r._2, r._3)), maxGapSec).iterator
      }
      .toDF()
  }

  /** Q10a OrderTimeout (OT/app/OrderTimeoutWithoutCep.scala:63-111):
    * the full 4-label create/pay state machine per order.
    */
  def orderTimeout(orders: DataFrame, timeoutSec: Long = 15 * 60): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    orders
      .select(col("order_id"), col("ts").cast("long").as("ts_sec"),
        (col("event_type") === "create").as("isCreate"))
      .as[(Long, Long, Boolean)]
      .groupByKey(_._1)
      .mapGroups { (id, it) =>
        val st = it.toSeq.sortBy(_._2).foldLeft(OrderState(None, None)) {
          case (s, (_, ts, c)) => StateMachines.orderStep(s, OrderEvent(id, ts, c))
        }
        StateMachines.orderOutcome(id, st, timeoutSec)
      }
      .toDF()
      .select(col("order_id"), col("status"))
  }

  /** Q10b TxMatch (OT/app/TxMatch.scala:22-51): reconcile pay events
    * against bank receipts on tx_id. Full outer join gives the three
    * reference outputs in one tagged union: matched pairs, unmatched
    * pays, unmatched receipts (the side-outputs at TxMatch.scala:19-20).
    */
  def txMatch(orders: DataFrame, receipts: DataFrame): DataFrame = {
    val pays = orders.filter(col("event_type") === "pay" && col("tx_id") =!= "")
      .select(col("order_id"), col("tx_id"), col("ts").cast("long").as("pay_sec"))
    val rcpt = receipts
      .select(col("tx_id").as("r_tx_id"), col("pay_channel"), col("ts").cast("long").as("receipt_sec"))
    pays.join(rcpt, pays("tx_id") === rcpt("r_tx_id"), "full_outer")
      .select(
        coalesce(col("tx_id"), col("r_tx_id")).as("tx_id"),
        col("order_id"), col("pay_sec"), col("pay_channel"), col("receipt_sec"),
        when(col("tx_id").isNotNull && col("r_tx_id").isNotNull, "matched")
          .when(col("tx_id").isNotNull, "unmatchedPays")
          .otherwise("unmatchedReceipts").as("tag"))
  }
}
