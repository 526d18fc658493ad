package graft.tools

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.sources.GraftLog
import graft.streaming.StreamingJobs

/** Streaming throughput / latency / state benchmark (VERDICT r15
  * item 2) — the reference is a streaming warehouse
  * (HotItemsAnalysis/app/HotItems.scala:34-63, OrderTimeout
  * app/TxMatch.scala:22-51); the 19 stream==batch twins prove
  * correctness, this main measures the missing evidence class: rows/s,
  * micro-batch duration distribution, and state-store footprint under
  * the RocksDB provider, replaying a full events corpus through the
  * `graft-log` DSv2 source in admission-controlled micro-batches
  * (maxRecordsPerTrigger — the Kafka maxOffsetsPerTrigger contract),
  * plus one kill/restart drill at real state sizes.
  *
  * Usage: StreamBench <sfDir> <outJson> [targetBatches]
  * Env: SPARK_GRAFT_CPUS (default 8).
  *
  * Twins measured (one fresh checkpoint each, run serially so no twin
  * contends with another):
  *  - hot_items_topn   windowed count + per-batch top-N upsert (E1)
  *  - dedup_exact      dropDuplicatesWithinWatermark on event_id
  *  - blacklist        flatMapGroupsWithState FSM w/ suppression (F1)
  *  - scd2             per-user interval build in GroupState
  *  - interval_join    orders x lineitem event-time range join (J3)
  * The restart drill replays scd2: kill the query mid-log (stop after
  * ~half the batches), start a second query on the SAME RocksDB
  * checkpoint, and record recovery-to-first-commit latency plus the
  * drained remainder — per-key state must round-trip through RocksDB
  * snapshot+restore at full corpus state size (ChaosRestartSpec proves
  * the semantics on small fixtures; this measures it at scale).
  */
object StreamBench {
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  final case class BatchRow(batchId: Long, inputRows: Long, durMs: Long,
      stateRows: Long, stateMemBytes: Long)

  private val batches = mutable.Buffer[BatchRow]()

  private def snapshot(): Vector[BatchRow] =
    batches.synchronized(batches.toVector).sortBy(_.batchId)

  private def clearBatches(): Unit = batches.synchronized(batches.clear())

  private val listener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      val dur = Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L)
      var srows = 0L
      var smem = 0L
      p.stateOperators.foreach { op =>
        srows += op.numRowsTotal
        smem += op.memoryUsedBytes
      }
      batches.synchronized {
        batches += BatchRow(p.batchId, p.numInputRows, dur, srows, smem)
      }
    }
  }

  /** One twin's run summarized to a JSON object string. */
  private def measure(name: String)(run: => Unit): (String, String) = {
    clearBatches()
    System.gc()
    println(s"[streambench] $name starting")
    val t0 = System.nanoTime()
    run
    // listener delivery is async; give the final progress time to land
    Thread.sleep(1500)
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = snapshot()
    val inRows = rows.map(_.inputRows).sum
    val durs = rows.filter(_.inputRows > 0).map(_.durMs).sorted
    def pct(p: Double): Long =
      if (durs.isEmpty) 0L else durs(math.min(durs.size - 1, (p * durs.size).toInt))
    val rps = inRows.toDouble / math.max(wall, 1e-9)
    val curve = rows.map(b =>
      s"[${b.batchId},${b.inputRows},${b.durMs},${b.stateRows},${b.stateMemBytes}]")
      .mkString("[", ",", "]")
    val json =
      s"""{"rows": $inRows, "wall_sec": ${f"$wall%.2f"}, """ +
      s""""rows_per_sec": ${f"$rps%.0f"}, """ +
      s""""n_batches": ${rows.size}, """ +
      s""""batch_ms": {"p50": ${pct(0.5)}, "p95": ${pct(0.95)}, "max": ${durs.lastOption.getOrElse(0L)}}, """ +
      s""""state_rows_final": ${rows.lastOption.map(_.stateRows).getOrElse(0L)}, """ +
      s""""state_mem_bytes_final": ${rows.lastOption.map(_.stateMemBytes).getOrElse(0L)}, """ +
      s""""curve_batch_rows_durms_staterows_statemem": $curve}"""
    println(f"[streambench] $name: $inRows rows / $wall%.1f s = $rps%.0f rows/s, ${rows.size} batches")
    name -> json
  }

  private def drain(df: DataFrame, mode: String, checkpoint: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  /** Kill scd2 mid-replay, restart on the same RocksDB checkpoint. */
  private def restartDrill(spark: SparkSession, logDir: String, work: String,
      perTrigger: Long, halfBatches: Long, total: Long): String = {
    println("[streambench] restart drill starting")
    def events(): DataFrame =
      StreamingJobs.eventsFromLog(spark, logDir, maxRecordsPerTrigger = Some(perTrigger))
    clearBatches()
    val ckpt = s"$work/ckpt-scd2-restart"
    val q1 = StreamingJobs.scd2Of(events()).toDF()
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("0 seconds")).start()
    val tKill0 = System.nanoTime()
    while (snapshot().count(_.inputRows > 0) < halfBatches && q1.isActive &&
        (System.nanoTime() - tKill0) / 1e9 < 600) {
      Thread.sleep(200)
    }
    q1.stop() // kill mid-log; the RocksDB checkpoint holds the open runs
    Thread.sleep(1500)
    val preKill = snapshot()
    val rowsBefore = preKill.map(_.inputRows).sum
    val stateAtKill = preKill.lastOption.map(_.stateRows).getOrElse(0L)
    val memAtKill = preKill.lastOption.map(_.stateMemBytes).getOrElse(0L)

    clearBatches()
    val tRec0 = System.nanoTime()
    val q2 = StreamingJobs.scd2Of(events()).toDF()
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    // recovery latency = start-to-first-committed-batch on restored state
    var firstCommitSec = -1.0
    while (q2.isActive) {
      if (firstCommitSec < 0 && snapshot().nonEmpty)
        firstCommitSec = (System.nanoTime() - tRec0) / 1e9
      Thread.sleep(100)
    }
    q2.awaitTermination()
    Thread.sleep(1500)
    if (firstCommitSec < 0 && snapshot().nonEmpty)
      firstCommitSec = (System.nanoTime() - tRec0) / 1e9
    val wallRec = (System.nanoTime() - tRec0) / 1e9
    val rowsAfter = snapshot().map(_.inputRows).sum
    val totalSeen = rowsBefore + rowsAfter
    println(s"[streambench] restart: $rowsBefore before kill + $rowsAfter after = $totalSeen of $total")
    val rec = math.max(firstCommitSec, 0.0)
    s"""{"twin": "scd2", "rows_before_kill": $rowsBefore, """ +
    s""""state_rows_at_kill": $stateAtKill, "state_mem_bytes_at_kill": $memAtKill, """ +
    s""""recovery_first_commit_sec": ${f"$rec%.2f"}, """ +
    s""""drain_after_restart_sec": ${f"$wallRec%.2f"}, """ +
    s""""rows_after_restart": $rowsAfter, "rows_total": $totalSeen, """ +
    s""""log_records": $total, """ +
    s""""replay_complete": ${totalSeen >= total}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outJson = args(1)
    val targetBatches = if (args.length > 2) args(2).toLong else 20L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-streambench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass", RocksDb)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft-streambench").toString
    val logDir = s"$work/events-log"
    println(s"[streambench] encoding $sfDir/events into $logDir")
    val tLoad0 = System.nanoTime()
    StreamingJobs.loadEventsLog(spark, sfDir, logDir)
    val loadSec = (System.nanoTime() - tLoad0) / 1e9
    val total = GraftLog.totalCount(logDir, new Configuration())
    require(total > 0,
      s"encoded 0 records from $sfDir/events — a broken staged path reads "
        + "0 rows silently; refuse to benchmark nothing")
    val perTrigger = math.max(total / targetBatches, 1L)
    println(f"[streambench] $total%d records, $perTrigger%d per trigger ($loadSec%.1f s encode)")

    spark.streams.addListener(listener)
    def events(): DataFrame =
      StreamingJobs.eventsFromLog(spark, logDir, maxRecordsPerTrigger = Some(perTrigger))

    val results = mutable.LinkedHashMap[String, String]()
    results += measure("hot_items_topn") {
      StreamingJobs.hotItemsTopNFrom(events(), 3, s"$work/hot-items-out")
    }
    results += measure("dedup_exact") {
      drain(events()
        .dropDuplicatesWithinWatermark("event_id")
        .select(col("event_id"), col("user_id"), col("event_type")),
        "append", s"$work/ckpt-dedup")
    }
    results += measure("blacklist") {
      drain(StreamingJobs.blacklistOf(events(), threshold = 100L).toDF(),
        "append", s"$work/ckpt-blacklist")
    }
    results += measure("scd2") {
      drain(StreamingJobs.scd2Of(events()).toDF(), "append", s"$work/ckpt-scd2")
    }
    results += measure("interval_join") {
      drain(StreamingJobs.intervalJoinStream(spark, sfDir),
        "append", s"$work/ckpt-interval-join")
    }

    val restartJson =
      restartDrill(spark, logDir, work, perTrigger, targetBatches / 2, total)
    spark.streams.removeListener(listener)

    val doc =
      s"""{
         |"check": "streaming throughput/latency/state benchmark: full events corpus replayed through the graft-log DSv2 source in admission-controlled micro-batches under the RocksDB state-store provider; per-twin rows/s, batch-duration p50/p95/max, and state rows/memory curve from StreamingQueryListener progress; one kill/restart drill on the scd2 checkpoint at full state size",
         |"sf_dir": "$sfDir", "cpus": $cpus, "state_store": "rocksdb",
         |"log_records": $total, "records_per_trigger": $perTrigger,
         |"encode_sec": ${f"$loadSec%.2f"},
         |"twins": {
         |${results.map { case (k, v) => s""""$k": $v""" }.mkString(",\n")}
         |},
         |"restart": $restartJson
         |}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outJson), doc + "\n")
    println(s"[streambench] wrote $outJson")
    spark.stop()
  }
}
