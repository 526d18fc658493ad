package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Storage

/** CLI drive of the scale-posture features: bucketed co-located joins
  * (zero shuffle), partitioned-write pruning, SQL extension
  * registration, and watermark late-data semantics.
  * Usage: runMain graft.ScaleDemo [sfDir]
  */
object ScaleDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("scale-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // force non-broadcast joins so the bucketed-vs-plain shuffle
      // comparison is differential (at real scale neither side fits in
      // a broadcast anyway)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .withExtensions(new graft.plans.GraftExtensions())
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- SQL extension
    val dot = spark.sql(
      "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    println(s"[scale-demo] SQL float_vec_dot(1 2, 3 4) = $dot")

    // --- bucketed join: no shuffle
    val ev = graft.sources.Tables.events(spark, sfDir)
    val cust = graft.sources.Tables.customer(spark, sfDir)
    Storage.writeBucketed(ev.select("event_id", "user_id"), "demo_ev_b", 4, "user_id")
    Storage.writeBucketed(cust.select("c_custkey", "c_nationkey"), "demo_cust_b", 4, "c_custkey")
    val bucketedJoin = Storage.table(spark, "demo_ev_b")
      .join(Storage.table(spark, "demo_cust_b"), col("user_id") === col("c_custkey"))
    val plainJoin = ev.join(cust, ev("user_id") === cust("c_custkey"))
    println(s"[scale-demo] bucketed join: shuffle=${Storage.hasShuffle(bucketedJoin)} " +
      s"rows=${bucketedJoin.count()} (plain join: shuffle=${Storage.hasShuffle(plainJoin)} rows=${plainJoin.count()})")

    // --- partition pruning
    val pdir = Files.createTempDirectory("scale-demo-part").toString
    Storage.writePartitioned(ev.select("event_id", "event_type"), pdir, "event_type")
    val pruned = spark.read.parquet(pdir).filter(col("event_type") === "error")
    val nFilesRead = pruned.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.listFiles(f.partitionFilters, Nil).map(_.files.size).sum }
      .sum
    val nFilesTotal = spark.read.parquet(pdir).queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.listFiles(Nil, Nil).map(_.files.size).sum }
      .sum
    println(s"[scale-demo] partition pruning: files_read=$nFilesRead of $nFilesTotal, rows=${pruned.count()}")
    spark.stop()
  }
}
