package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{GraftLog, GraftLogDataWriter, GraftLogMicroBatchStream, GraftLogInputPartition, GraftLogStreamingWrite}
import graft.streaming.StreamingJobs

/** The `graft-log` DataSourceV2 connector: offset math, batch round
  * trip, exactly-once restart replay from a checkpointed offset, the
  * idempotent streaming sink commit, and the reference's E1 HotItems
  * chain end-to-end through the connector.
  */
class GraftLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-log-$tag").toString

  test("offset slicing maps a [start,end) range onto per-segment skip/take") {
    val dir = tmp("slice")
    val conf = new Configuration()
    val f = GraftLog.fs(dir, conf)
    // three segments of 3, 4, 2 records
    for ((n, i) <- Seq(3, 4, 2).zipWithIndex) {
      val out = f.create(new org.apache.hadoop.fs.Path(dir, GraftLog.segName(i.toLong, n.toLong)), true)
      out.write((0 until n).map(j => s"s$i-r$j\n").mkString.getBytes("UTF-8")); out.close()
    }
    assert(GraftLog.totalCount(dir, conf) == 9)
    val parts = GraftLogMicroBatchStream.slices(dir, 2, 8)
      .map(_.asInstanceOf[GraftLogInputPartition])
    assert(parts.map(p => (p.skip, p.take, p.firstOffset)).toSeq ==
      Seq((2L, 1L, 2L), (0L, 4L, 3L), (0L, 1L, 7L)))
    // empty range plans nothing
    assert(GraftLogMicroBatchStream.slices(dir, 4, 4).isEmpty)
  }

  test("batch write → batch read round-trips values with monotone offsets") {
    import spark.implicits._
    val dir = tmp("batch")
    val in = (0 until 257).map(i => s"rec-$i")
    in.toDF("value").repartition(3)
      .write.format("graft-log").option("path", dir).mode("append").save()
    val back = spark.read.format("graft-log").option("path", dir).load()
    assert(back.select(col("value")).as[String].collect().sorted.toSeq == in.sorted)
    // offsets are exactly 0..n-1 once, in segment order
    assert(back.select(col("offset")).as[Long].collect().sorted.toSeq ==
      (0L until 257L))
    // record counts ride the segment NAMES: latest-offset is metadata-only
    val segs = GraftLog.segments(dir, new Configuration())
    assert(segs.map(_.count).sum == 257 && segs.forall(_.count > 0))
  }

  test("restart replays from the checkpointed offset: appended records only, no duplicates") {
    import spark.implicits._
    val dir = tmp("replay")
    val chk = tmp("replay-chk")
    val outP = tmp("replay-out")
    (0 until 100).map(i => s"a-$i").toDF("value").coalesce(2)
      .write.format("graft-log").option("path", dir).mode("append").save()

    val seen = new java.util.concurrent.atomic.AtomicLong()
    def drain(): Long = {
      seen.set(0L)
      val q = spark.readStream.format("graft-log").option("path", dir).load()
        .writeStream.option("checkpointLocation", chk)
        .foreachBatch { (b: DataFrame, _: Long) =>
          seen.addAndGet(b.count())
          b.write.mode("append").parquet(outP); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); seen.get()
    }
    assert(drain() == 100L)
    // producer appends two more segments while the consumer is down
    (0 until 30).map(i => s"b-$i").toDF("value").coalesce(2)
      .write.format("graft-log").option("path", dir).mode("append").save()
    // the restarted query resumes at offset 100 — ONLY the delta replays
    assert(drain() == 30L)
    val all = spark.read.parquet(outP)
    assert(all.count() == 130L)
    assert(all.select(col("offset")).as[Long].collect().sorted.toSeq == (0L until 130L))
    // and a third run with nothing new processes nothing
    assert(drain() == 0L)
  }

  test("streaming sink writes through the engine; epoch commit is idempotent on replay") {
    import spark.implicits._
    val src = tmp("sink-src") + "/in"
    val dir = tmp("sink-log")
    val chk = tmp("sink-chk")
    (0 until 40).map(i => s"v-$i").toDF("value")
      .coalesce(1).write.parquet(src)
    val q = spark.readStream.schema("value STRING").parquet(src)
      .writeStream.format("graft-log").option("path", dir)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val back = spark.read.format("graft-log").option("path", dir).load()
    assert(back.select(col("value")).as[String].collect().sorted.toSeq ==
      (0 until 40).map(i => s"v-$i").sorted)

    // crash-between-commit-and-offset-log replay: the same epoch commits
    // again — the marker makes the second commit drop its temps
    val conf = new Configuration()
    val epochs = GraftLog.fs(dir, conf)
      .listStatus(new org.apache.hadoop.fs.Path(dir)).map(_.getPath.getName)
      .filter(_.startsWith("_epoch-"))
    assert(epochs.nonEmpty)
    val replayEpoch = epochs.head.stripPrefix("_epoch-").toLong
    val w = new GraftLogDataWriter(dir, 0, 0)
    w.write(InternalRow(UTF8String.fromString("dup-row")))
    val msg = w.commit()
    new GraftLogStreamingWrite(dir, 0).commit(replayEpoch, Array(msg))
    val after = spark.read.format("graft-log").option("path", dir).load()
    assert(after.count() == 40L, "replayed epoch must not append duplicates")
    assert(!GraftLog.segments(dir, conf).exists(_.count == 1L))
  }

  test("write-side restart through the ENGINE: a rolled-back commit log replays the epoch without duplicates") {
    import spark.implicits._
    // The hand-called replay above proves the marker mechanism; this
    // drives the same window through the engine itself: delete the LAST
    // commit-log entry after a run (the exact crash window — sink epoch
    // committed, engine offset/commit log not yet written) and restart.
    // Structured Streaming re-executes that epoch; the `_epoch-<id>`
    // marker must make the replayed sink commit drop its temps.
    val watch = tmp("wrestart-watch")
    val dir = tmp("wrestart-log")
    val chk = tmp("wrestart-chk")
    def stage(tag: String, n: Int): Unit = {
      val f = tmp(s"wrestart-$tag") + "/data"
      (0 until n).map(i => s"$tag-$i").toDF("value").coalesce(1).write.parquet(f)
      Files.list(java.nio.file.Paths.get(f))
        .filter(_.toString.endsWith(".parquet"))
        .forEach(p => Files.copy(p, java.nio.file.Paths.get(watch, s"${tag}_" + p.getFileName)))
    }
    def run(): Unit = {
      val q = spark.readStream.schema("value STRING")
        .option("maxFilesPerTrigger", "1").parquet(watch)
        .writeStream.format("graft-log").option("path", dir)
        .option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    stage("e0", 20); stage("e1", 15)
    run()
    def logValues(): Seq[String] =
      spark.read.format("graft-log").option("path", dir).load()
        .select(col("value")).as[String].collect().sorted.toSeq
    val expect = ((0 until 20).map(i => s"e0-$i") ++ (0 until 15).map(i => s"e1-$i")).sorted
    assert(logValues() == expect)
    // inject the crash: roll back the engine's commit log by one epoch
    val commits = new java.io.File(s"$chk/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.length >= 2, "need at least two committed epochs to roll one back")
    assert(commits.last.delete())
    // the local ChecksumFs keeps a .N.crc sidecar; a stale one blocks
    // the replayed commit's rename
    val crc = new java.io.File(s"$chk/commits", s".${commits.last.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    run() // the engine replays the final epoch into the sink
    assert(logValues() == expect,
      "replayed epoch through the engine must not duplicate records")
  }

  test("E1 HotItems end-to-end through the connector equals batch q1_hot_items") {
    val dir = tmp("hotitems")
    val out = tmp("hotitems-out")
    StreamingJobs.loadEventsLog(spark, sf, dir)
    val stream = StreamingJobs.hotItemsTopNFromLog(spark, dir, 3, out)
      .select(col("window_start"), col("item_id"), col("cnt"),
        col("rn").cast("long").as("rn"))
    val batch = SparkEntry.queries("q1_hot_items")(spark, sf)
    assert(stream.count() > 0)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("admission control: maxRecordsPerTrigger bounds every micro-batch and the rate-limited replay is lossless") {
    import scala.collection.mutable
    val dir = tmp("rate")
    StreamingJobs.loadEventsLog(spark, sf, dir)
    val total = GraftLog.totalCount(dir, new Configuration())
    assert(total > 0)
    val cap = math.max(total / 7, 1L)
    val seen = mutable.Buffer[Long]()
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        seen.synchronized { seen += e.progress.numInputRows }
    }
    spark.streams.addListener(listener)
    try {
      val q = spark.readStream.format("graft-log").option("path", dir)
        .option("maxRecordsPerTrigger", cap.toString).load()
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", tmp("rate-ckpt"))
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // async listener: wait for all progress events to land
      val deadline = System.nanoTime() + 10_000_000_000L
      while (seen.synchronized(seen.sum) < total && System.nanoTime() < deadline)
        Thread.sleep(100)
      val rows = seen.synchronized(seen.toVector)
      assert(rows.sum == total, s"rate-limited replay lost records: $rows")
      assert(rows.filter(_ > 0).forall(_ <= cap),
        s"a micro-batch exceeded maxRecordsPerTrigger=$cap: $rows")
      assert(rows.count(_ > 0) >= 7,
        s"expected >=7 bounded batches at cap=$cap, got $rows")
    } finally spark.streams.removeListener(listener)
  }
}
