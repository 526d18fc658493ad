package graft

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamingJobs

/** CLI demo/check for the Structured Streaming tier: runs each
  * streaming query to completion via file-replay (AvailableNow) and
  * diffs it against its batch twin. Usage: runMain graft.StreamDemo
  * [sfDir]. Prints one line per pair; non-empty DIFF means the
  * streaming and batch plans disagree.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def diff(name: String, stream: org.apache.spark.sql.DataFrame,
        batch: org.apache.spark.sql.DataFrame): Unit = {
      val s = stream.count(); val b = batch.count()
      val d = stream.exceptAll(batch).count() + batch.exceptAll(stream).count()
      println(s"[stream-demo] $name: stream=$s batch=$b diff=$d " +
        (if (d == 0 && s == b) "OK" else "MISMATCH"))
    }

    diff("pv_hourly",
      StreamingJobs.runToMemory(StreamingJobs.pvHourly(spark, sfDir), "d_pv", "complete"),
      SparkEntry.queries("q3_pv_hourly")(spark, sfDir))
    diff("hot_item_counts",
      StreamingJobs.runToMemory(StreamingJobs.hotItemCounts(spark, sfDir), "d_hot", "complete"),
      graft.operators.TimeWindows.slidingCount(
        graft.sources.Tables.eventsWithItem(spark, sfDir)
          .filter(org.apache.spark.sql.functions.col("event_type") === "click"),
        "ts", "1 hour", "5 minutes", org.apache.spark.sql.functions.col("item_id"))
        .select("window_start", "item_id", "cnt"))
    diff("login_fail_fsm",
      StreamingJobs.runToMemory(StreamingJobs.loginFailStream(spark, sfDir).toDF(), "d_lf", "append"),
      SparkEntry.queries("q9_login_fail")(spark, sfDir))
    diff("interval_join",
      StreamingJobs.runToMemory(StreamingJobs.intervalJoinStream(spark, sfDir), "d_ij", "append"),
      SparkEntry.queries("q10_interval_join")(spark, sfDir))

    // streaming blacklist: tagged union split into main + side outputs
    val tagged = StreamingJobs.runToMemory(
      StreamingJobs.blacklistStream(spark, sfDir, 2).toDF(), "d_bl", "append")
    var split = Map.empty[String, Long]
    graft.sinks.Sinks.splitByTag(tagged, "tag", Seq("click", "warning")) {
      (tag, df) => split += tag -> df.count()
    }
    println(s"[stream-demo] blacklist split: clicks=${split("click")} warnings=${split("warning")}")

    // event-time timer scenario: unpaid order times out via watermark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val tdir = java.nio.file.Files.createTempDirectory("demo-timer")
    Seq((1L, 100L, true), (2L, 100L, true), (2L, 200L, false), (99L, 100000L, true))
      .toDF("order_id", "ts_sec", "is_create")
      .withColumn("ts", timestamp_seconds(col("ts_sec"))).drop("ts_sec")
      .coalesce(1).write.parquet(tdir.resolve("in").toString)
    val tstream = spark.readStream
      .schema("order_id LONG, is_create BOOLEAN, ts TIMESTAMP")
      .parquet(tdir.resolve("in").toString)
    val outcomes = StreamingJobs.runToMemory(
      graft.streaming.TimedOrderMonitor.monitorStream(tstream, 900).toDF(), "d_timer", "append")
      .collect().map(r => s"${r.getLong(0)}=${r.getString(1)}").sorted.mkString(", ")
    println(s"[stream-demo] event-time timers: $outcomes")
    spark.stop()
  }
}
