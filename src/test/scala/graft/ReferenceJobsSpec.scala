package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.ReferenceJobs

/** Golden end-to-end tests of the reference job surface on hand-built
  * bean fixtures with known answers (scenario coverage per FIXTURES.md
  * §1-§6).
  */
class ReferenceJobsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def withTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_seconds(col("ts_sec")))

  test("Q1 hotItems: counts and top-N per sliding window") {
    // 3 items in one hour; item 7 clicked 3x, item 8 2x, item 9 1x
    val ub = withTs(Seq(
      (1L, 7L, "pv", 3600L), (2L, 7L, "pv", 3700L), (3L, 7L, "pv", 3800L),
      (4L, 8L, "pv", 3650L), (5L, 8L, "pv", 3750L),
      (6L, 9L, "pv", 3900L),
      (7L, 9L, "buy", 3901L) // non-pv ignored
    ).toDF("user_id", "item_id", "behavior", "ts_sec"))
    val top = ReferenceJobs.hotItems(ub, "1 hour", "30 minutes", 2)
    // window [3600, 7200) contains all rows; rank: item7(3), item8(2)
    val w = top.filter(col("window_start") === 3600).orderBy("rn")
      .select("item_id", "cnt").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(w.toSeq == Seq((7L, 3L), (8L, 2L)))
  }

  test("Q2 hotUrls: static resources never ranked") {
    val logs = withTs(Seq(
      ("1.1.1.1", "/a", 100L), ("1.1.1.1", "/a", 110L),
      ("1.1.1.1", "/style.css", 120L), ("1.1.1.1", "/app.js", 130L),
      ("2.2.2.2", "/b", 140L)
    ).toDF("ip", "url", "ts_sec"))
    val top = ReferenceJobs.hotUrls(logs, "10 minutes", "10 minutes", 5)
    val urls = top.select("url").distinct().collect().map(_.getString(0)).toSet
    assert(urls == Set("/a", "/b"))
    assert(top.filter(col("url") === "/a").head().getAs[Long]("cnt") == 2)
  }

  test("Q9 loginFail: consecutive-fail alert, success clears, out-of-order sorted") {
    val logins = withTs(Seq(
      (1L, "fail", 100L), (1L, "fail", 101L),          // alert (100,101)
      (2L, "fail", 200L), (2L, "success", 201L), (2L, "fail", 202L), // no alert
      (3L, "fail", 301L), (3L, "fail", 300L)           // out of order; alert (300,301)
    ).toDF("user_id", "status", "ts_sec"))
    val warns = ReferenceJobs.loginFailWarnings(logins, maxGapSec = 2)
      .select("user_id", "first_fail", "last_fail")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(warns == Set((1L, 100L, 101L), (3L, 300L, 301L)))
  }

  test("Q10a orderTimeout: all four outcome labels") {
    val orders = withTs(Seq(
      (1L, "create", "", 100L), (1L, "pay", "tx1", 200L),     // payed
      (2L, "create", "", 100L), (2L, "pay", "tx2", 99999L),   // payed but timeout
      (3L, "create", "", 100L),                               // timeout
      (4L, "pay", "tx4", 100L)                                // pay without create
    ).toDF("order_id", "event_type", "tx_id", "ts_sec"))
    val out = ReferenceJobs.orderTimeout(orders, timeoutSec = 900)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out == Map(1L -> "payed", 2L -> "payed but timeout",
      3L -> "timeout", 4L -> "pay without create"))
  }

  test("Q10b txMatch: matched + both unmatched side outputs") {
    val orders = withTs(Seq(
      (1L, "create", "", 100L),
      (1L, "pay", "txA", 200L),       // matched
      (2L, "pay", "txB", 300L)        // unmatched pay
    ).toDF("order_id", "event_type", "tx_id", "ts_sec"))
    val receipts = withTs(Seq(
      ("txA", "wechat", 205L),         // matched
      ("txC", "alipay", 400L)          // unmatched receipt
    ).toDF("tx_id", "pay_channel", "ts_sec"))
    val tags = ReferenceJobs.txMatch(orders, receipts)
      .select("tx_id", "tag").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(tags == Map("txA" -> "matched", "txB" -> "unmatchedPays", "txC" -> "unmatchedReceipts"))
  }

  test("Q8 blacklist threshold and dataflow exclusion") {
    val base = (1 to 60).map(i => (9L, 5L, "bj", 100L + i)) ++ // user 9 x ad 5: 60 clicks
      Seq((1L, 5L, "bj", 100L), (2L, 6L, "sh", 100L))
    val clicks = withTs(base.toDF("user_id", "ad_id", "province", "ts_sec"))
    val bl = ReferenceJobs.blacklist(clicks, threshold = 50)
    assert(bl.count() == 1)
    assert(bl.head().getAs[Long]("user_id") == 9L)
    // blacklisted pair excluded from the province counts entirely
    val stats = ReferenceJobs.adStatByProvince(clicks, "1 hour", "1 hour", 50)
    val byProvince = stats.groupBy("province").agg(sum("cnt").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byProvince == Map("bj" -> 1L, "sh" -> 1L))
  }

  test("Q4/Q5: bloom UV equals exact UV at tiny cardinality") {
    val ub = withTs((1 to 40).map(i => (i.toLong % 10, 1L, "pv", 3600L + i))
      .toDF("user_id", "item_id", "behavior", "ts_sec"))
    val exact = ReferenceJobs.uniqueVisitors(ub).head().getAs[Long]("uv")
    val bloom = ReferenceJobs.uvWithBloom(ub, bits = 1 << 16).head().getAs[Long]("uv")
    assert(exact == 10L && bloom == 10L)
  }

  test("Q6 marketingByChannel: UNINSTALL excluded, keys correct") {
    val mkt = withTs(Seq(
      ("u1", "CLICK", "weibo", 100L), ("u2", "CLICK", "weibo", 110L),
      ("u3", "INSTALL", "wechat", 120L), ("u4", "UNINSTALL", "weibo", 130L)
    ).toDF("user_id", "behavior", "channel", "ts_sec"))
    val counts = ReferenceJobs.marketingByChannel(mkt, "1 hour", "1 hour")
      .select("channel", "behavior", "cnt")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(counts == Map(("weibo", "CLICK") -> 2L, ("wechat", "INSTALL") -> 1L))
  }
}
