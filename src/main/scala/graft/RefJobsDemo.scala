package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.queries.ReferenceJobs
import graft.sources.TextIngest

/** End-to-end drive of the reference-user path: raw CSV files (the
  * reference's own formats) → TextIngest bean parse → ReferenceJobs.
  * This is exactly how a tiankx1003/Data-Warehouse-Flink user switches
  * engines. Usage: runMain graft.RefJobsDemo
  */
object RefJobsDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def write(name: String, lines: Seq[String]): String = {
      val f = Files.createTempFile(s"refdemo-$name", ".csv")
      Files.writeString(f, lines.mkString("\n")); f.toString
    }

    // LoginLog.csv shape: userId,ip,status,ts (FIXTURES.md §5)
    val loginCsv = write("login", Seq(
      "5402,83.149.11.115,fail,1558430841",
      "5402,83.149.11.115,fail,1558430842",
      "5402,83.149.11.115,success,1558430845",
      "7233,10.0.0.9,fail,1558430850",
      "7233,10.0.0.9,success,1558430851",
      "7233,10.0.0.9,fail,1558430852",
      "9999,1.2.3.4,fail,NOT_A_TIMESTAMP", // malformed: must hit rejects, not the job
      "garbage"))
    val (logins, loginRejects) =
      TextIngest.readCsvWithRejects(spark, loginCsv, TextIngest.loginSchema)
    println(s"[ref-demo] login parse: good=${logins.count()} rejects=${loginRejects.count()}")
    val warns = ReferenceJobs.loginFailWarnings(logins, maxGapSec = 2)
    println(s"[ref-demo] login warnings: ${warns.collect().map(r => s"u${r.getLong(0)}@${r.getLong(1)}-${r.getLong(2)}").sorted.mkString(", ")}")

    // OrderLog.csv shape: orderId,eventType,txId,ts (FIXTURES.md §6)
    val orderCsv = write("order", Seq(
      "34729,create,,1558430842",
      "34729,pay,sd76f87d6,1558430844",
      "34730,create,,1558430845",
      "34731,pay,3hu3k2432,1558430849"))
    val orders = TextIngest.readCsv(spark, orderCsv, TextIngest.orderSchema)
    val outcomes = ReferenceJobs.orderTimeout(orders, timeoutSec = 900)
    println(s"[ref-demo] order outcomes: ${outcomes.collect().map(r => s"${r.getLong(0)}=${r.getString(1)}").sorted.mkString(", ")}")

    // ReceiptLog.csv shape: txId,payChannel,ts
    val receiptCsv = write("receipt", Seq(
      "sd76f87d6,wechat,1558430847",
      "unseen001,alipay,1558430900"))
    val receipts = TextIngest.readCsv(spark, receiptCsv, TextIngest.receiptSchema)
    val recon = ReferenceJobs.txMatch(orders, receipts)
    println(s"[ref-demo] tx reconciliation: ${recon.collect().map(r => s"${r.getString(0)}=${r.getString(5)}").sorted.mkString(", ")}")

    // UserBehavior.csv shape → hot items
    val ubCsv = write("ub", (1 to 9).map(i => s"${i % 3},${i % 2 + 10},1,pv,${3600 + i * 60}"))
    val ub = TextIngest.readCsv(spark, ubCsv, TextIngest.userBehaviorSchema)
    val hot = ReferenceJobs.hotItems(ub, "1 hour", "1 hour", 2)
    println(s"[ref-demo] hot items: ${hot.collect().map(r => s"w${r.getLong(0)}:item${r.getLong(1)}x${r.getLong(2)}#${r.getInt(3)}").sorted.mkString(", ")}")
    spark.stop()
  }
}
