package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingJobs, TimedOrderMonitor}

/** Event-time timer semantics (T3): the streaming order monitor's
  * timeouts must fire from watermark progress, and the full streaming
  * top-N chain must equal the batch ranking.
  */
class StreamingTimerSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("EventTimeTimeout fires timeouts when the watermark passes the deadline") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-timer")
    // A: created, never paid -> timer fires once watermark > 100+900
    // B: paid in time -> emitted immediately, no timer
    // C: paid after the deadline -> timer fires, status timeout
    // D (high ts): pushes the watermark far past every deadline
    Seq(
      (1L, 100L, true), (2L, 100L, true), (2L, 200L, false),
      (3L, 100L, true), (3L, 5000L, false),
      (99L, 100000L, true))
      .toDF("order_id", "ts_sec", "is_create")
      .withColumn("ts", timestamp_seconds(col("ts_sec"))).drop("ts_sec")
      .coalesce(1).write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("order_id LONG, is_create BOOLEAN, ts TIMESTAMP")
      .parquet(dir.resolve("in").toString)
    val out = TimedOrderMonitor.monitorStream(stream, timeoutSec = 900)
    val got = StreamingJobs.runToMemory(out.toDF(), "timer_out", "append")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "timeout", "unpaid order must time out via the event-time timer")
    assert(got(2L) == "shipped", "paid-in-time order emits immediately")
    assert(got(3L) == "timeout", "late pay is a timeout")
    assert(!got.contains(99L), "watermark-driver order has no outcome yet")
  }

  test("pay-only states are flushed by timer, not leaked") {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-timer-leak")
    // order 5 has only a pay (create lost/late); order 99 pushes watermark
    Seq((5L, 100L, false), (99L, 100000L, true))
      .toDF("order_id", "ts_sec", "is_create")
      .withColumn("ts", timestamp_seconds(col("ts_sec"))).drop("ts_sec")
      .coalesce(1).write.parquet(dir.resolve("in").toString)
    val stream = spark.readStream
      .schema("order_id LONG, is_create BOOLEAN, ts TIMESTAMP")
      .parquet(dir.resolve("in").toString)
    val got = StreamingJobs.runToMemory(
      TimedOrderMonitor.monitorStream(stream, 900).toDF(), "timer_leak", "append")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(5L) == "timeout", "pay-without-create must be flushed as timeout by its own timer")
  }

  test("streaming foreachBatch top-N equals batch q1 ranking") {
    val out = Files.createTempDirectory("graft-topn").resolve("out").toString
    val stream = StreamingJobs.hotItemsTopN(spark, sf, 3, out)
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn").cast("long").as("rn"))
    val batch = SparkEntry.queries("q1_hot_items")(spark, sf)
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }
}
