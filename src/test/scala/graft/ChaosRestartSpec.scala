package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.{StreamingJobs, TimedOrderMonitor}

/** Chaos-restart sweep over every stateful streaming FSM twin (VERDICT
  * r10 item 6): each twin runs under the RocksDB state-store provider
  * from a multi-file staged source (maxFilesPerTrigger=1 → one
  * micro-batch per file), is KILLED as soon as its first micro-batch
  * commits — mid-run, with per-key state live in RocksDB and unread
  * files pending — then restarted on the same checkpoint and run to
  * completion. The restarted query's durable-sink output must equal the
  * batch twin on the full input:
  *
  *  - the sink's batch-id transaction log must discard any half-written
  *    files from the killed run (no duplicates),
  *  - per-key FSM state must round-trip RocksDB snapshot+restore (no
  *    resets: a user mid-funnel, an order awaiting pay, a half-matched
  *    (user, day) cell all continue, not restart),
  *  - watermark/timer state must resume (event-time timeouts planted
  *    before the kill still fire after it).
  *
  * Each restarted query also asserts the RocksDB provider actually
  * engaged via its progress custom metrics — a conf typo cannot
  * silently fall back to the default store. SCD2's arrives-later
  * restart drill lives in RocksDbStateSpec; this spec covers the
  * remaining five FSM twins with one parameterized loop.
  */
class ChaosRestartSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val ProviderConf = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(ProviderConf)
    spark.conf.set(ProviderConf, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderConf, v)
      case None => spark.conf.unset(ProviderConf)
    }
  }

  /** Write `df` into `nFiles` event-time-ordered parquet files
    * (00.parquet < 01.parquet < ... by the `tsLong` expression) so the
    * file-replay stream presents per-key events in event-time order
    * across micro-batches — the FSM twins' ordering contract. Rows with
    * equal cut-point timestamps stay in one file (the split predicate
    * is on ts alone).
    */
  private def stageChunks(df: DataFrame, tsLong: String, nFiles: Int,
      prefix: String): String = {
    val staged = Files.createTempDirectory(prefix)
    val cuts = (1 until nFiles)
      .map(i => df.selectExpr(s"percentile($tsLong, ${i.toDouble / nFiles})")
        .first().getDouble(0))
    val bounds = (Double.MinValue +: cuts) :+ Double.MaxValue
    for (i <- 0 until nFiles) {
      val part = df.filter(expr(s"$tsLong > ${bounds(i)}") &&
        expr(s"$tsLong <= ${bounds(i + 1)}"))
      val tmp = Files.createTempDirectory(s"$prefix-chunk").toString
      part.coalesce(1).write.mode("overwrite").parquet(tmp)
      val file = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(file.toPath, Paths.get(staged.toString, f"$i%02d.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    staged.toString
  }

  /** One chaos drill: run `build` over the staged files one per
    * micro-batch, kill the query as soon as a batch commits, restart it
    * on the same checkpoint to completion, and return the sink contents
    * (read through the sink's transaction log, so half-written files
    * from the killed run are invisible).
    */
  private def killResumeRun(staged: String, schema: org.apache.spark.sql.types.StructType,
      build: DataFrame => DataFrame, prefix: String): DataFrame = {
    val cp = Files.createTempDirectory(s"$prefix-cp").toString
    val sink = Files.createTempDirectory(s"$prefix-sink").toString
    def start(): StreamingQuery = {
      // the watermark is each build's own (monitorStream sets its own;
      // redefining one downstream is disallowed by Spark)
      val src = spark.readStream
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
      build(src).writeStream
        .format("parquet")
        .option("path", sink)
        .outputMode("append")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .start()
    }
    // run 1: kill at the first committed micro-batch — state for the
    // processed prefix is in RocksDB, the remaining files are unread
    val q1 = start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.isActive && q1.recentProgress.isEmpty &&
      System.nanoTime() < deadline) Thread.sleep(10)
    q1.stop()
    q1.awaitTermination()
    val p1 = q1.recentProgress.toSeq
    // run 2: resume the checkpoint, drain everything left
    val q2 = start()
    q2.awaitTermination()
    // provider check spans both runs: if the kill landed before run 1
    // committed anything, run 2 carries all the progress — and vice
    // versa when run 1 drained everything before the stop took hold
    val ops = (p1 ++ q2.recentProgress.toSeq).flatMap(_.stateOperators.toSeq)
    assert(ops.nonEmpty, "expected a stateful operator in the progress")
    val keys = ops.flatMap(op =>
      scala.jdk.CollectionConverters.MapHasAsScala(op.customMetrics).asScala.keys)
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"RocksDB provider did not engage; state metrics: $keys")
    spark.read.parquet(sink)
  }

  // ---------------------------------------------------------- the twins
  private lazy val events = graft.sources.Tables.events(spark, sf)
  private lazy val stagedEvents =
    stageChunks(events, "CAST(ts AS LONG)", 4, "graft-chaos-ev")

  /** (name, build from watermarked staged events, reduce sink rows to
    * the batch-comparable frame, batch ground truth).
    */
  private def eventTwins: Seq[(String, DataFrame => DataFrame,
      DataFrame => DataFrame, () => DataFrame)] = Seq(
    ("loginFailStream",
      (src: DataFrame) => StreamingJobs.loginFailOf(
        src.withWatermark("ts", "1 second")).toDF(),
      (out: DataFrame) => out,
      () => SparkEntry.queries("q9_login_fail")(spark, sf)),
    ("funnelStream",
      (src: DataFrame) => StreamingJobs.funnelOf(
        src.withWatermark("ts", "1 second")).toDF(),
      // progression stream: the FURTHEST snapshot per user is the verdict
      (out: DataFrame) => out
        .withColumn("score",
          when(col("t_purchase").isNotNull, 3).when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(max(struct(col("score"), col("t_view"), col("t_click"),
          col("t_purchase"), col("stage"))).as("s"))
        .select(col("user_id"), col("s.t_view").as("t_view"),
          col("s.t_click").as("t_click"), col("s.t_purchase").as("t_purchase"),
          col("s.stage").as("stage")),
      () => SparkEntry.queries("funnel_analysis")(spark, sf)
        .select("user_id", "t_view", "t_click", "t_purchase", "stage")),
    ("txMatchStream",
      (src: DataFrame) => StreamingJobs.txMatchOf(
        src.withWatermark("ts", "1 second")).toDF(),
      // at most two snapshots per (user, day) cell; "matched" wins
      (out: DataFrame) => out
        .withColumn("score", when(col("tag") === "matched", 2).otherwise(1))
        .groupBy(col("user_id"), col("day_start"))
        .agg(max(struct(col("score"), col("tag"))).as("s"))
        .select(col("user_id"), col("day_start"), col("s.tag").as("tag")),
      () => SparkEntry.queries("tx_match_fsm")(spark, sf)))

  for ((name, build, reduce, batch) <- eventTwins)
    test(s"RocksDB chaos-restart: $name killed at first commit resumes to exact batch equality") {
      withRocksDb {
        val out = killResumeRun(stagedEvents, events.schema,
          build, s"graft-chaos-$name")
        assert(sortedRows(reduce(out)) == sortedRows(batch()),
          s"$name: restarted stream must equal the batch twin")
      }
    }

  test("RocksDB chaos-restart: blacklistStream killed at first commit — exactly-once tags, no duplicate warnings") {
    withRocksDb {
      val threshold = 2L
      val out = killResumeRun(stagedEvents, events.schema,
        src => StreamingJobs.blacklistOf(
          src.withWatermark("ts", "1 second"), threshold).toDF(),
        "graft-chaos-blacklist").cache()
      // batch ground truth per (user, item): total clicks n → exactly
      // one warning at the threshold, min(n, threshold-1) pass-throughs.
      // A replayed batch after the kill would DOUBLE tags; a state reset
      // would re-emit cnt=1 pass-throughs and a second warning.
      val totals = graft.sources.Tables.eventsWithItem(spark, sf)
        .filter(col("event_type") === "click")
        .groupBy("user_id", "item_id").count()
      val expectedWarnings = totals.filter(col("count") >= threshold).count()
      val expectedClicks = totals
        .agg(sum(least(col("count"), lit(threshold - 1)))).first().getLong(0)
      assert(out.filter(col("tag") === "warning").count() == expectedWarnings)
      assert(out.filter(col("tag") === "click").count() == expectedClicks)
      assert(out.filter(col("tag") === "warning")
        .groupBy("user_id", "item_id").count().filter(col("count") > 1).isEmpty,
        "exactly one warning per blacklisted key across the restart")
      out.unpersist()
    }
  }

  test("RocksDB chaos-restart: TimedOrderMonitor killed at first commit — timers planted before the kill fire after it") {
    withRocksDb {
      // order-event stream from the TPC-H tables, exactly the batch
      // twin's shape: create at o_orderdate, pay at each l_shipdate
      val creates = graft.sources.Tables.orders(spark, sf)
        .select(col("o_orderkey").as("order_id"),
          col("o_orderdate").cast("timestamp").as("ts"),
          lit(true).as("is_create"))
      val pays = graft.sources.Tables.lineitem(spark, sf)
        .select(col("l_orderkey").as("order_id"),
          col("l_shipdate").cast("timestamp").as("ts"),
          lit(false).as("is_create"))
      val orderEvents = creates.unionAll(pays)
      // sentinel far past every create+15d deadline: drives the final
      // watermark so unpaid orders FLUSH as timeouts before AvailableNow
      // drains (it never resolves itself, so it emits no outcome)
      val maxSec = orderEvents.selectExpr("max(CAST(ts AS LONG))").first().getLong(0)
      val sentinel = spark.range(1)
        .select(lit(-1L).as("order_id"),
          timestamp_seconds(lit(maxSec + 16L * 86400)).as("ts"),
          lit(true).as("is_create"))
      val staged = stageChunks(orderEvents.unionAll(sentinel),
        "CAST(ts AS LONG)", 4, "graft-chaos-order")
      def monitor(src: DataFrame): DataFrame =
        TimedOrderMonitor.monitorStream(src, timeoutSec = 15L * 86400).toDF()
      val out = killResumeRun(staged, orderEvents.schema, monitor,
        "graft-chaos-order")
      // restart-exactness oracle: an unkilled run of the same staged
      // files (same batch boundaries, same watermark march, same timer
      // firings — all deterministic). The kill+resume must change
      // NOTHING, including the timer-eviction flushes.
      val cpRef = Files.createTempDirectory("graft-chaos-order-ref-cp").toString
      val sinkRef = Files.createTempDirectory("graft-chaos-order-ref-sink").toString
      val ref = monitor(spark.readStream.schema(orderEvents.schema)
        .option("maxFilesPerTrigger", 1).parquet(staged))
        .writeStream.format("parquet").option("path", sinkRef)
        .outputMode("append").option("checkpointLocation", cpRef)
        .trigger(Trigger.AvailableNow()).start()
      ref.awaitTermination()
      assert(sortedRows(out) == sortedRows(spark.read.parquet(sinkRef)),
        "killed+resumed run must emit exactly what an unkilled run emits")
      // batch-FSM equality on the orders that honor the reference's
      // create-before-pay invariant (this synthetic lineitem violates
      // TPC-H's shipdate > orderdate for a handful of keys; an orphan
      // pay that precedes its create gets timer-flushed and FORGOTTEN
      // by the stream — the documented anti-leak behavior — while the
      // batch fold keeps the first pay forever, a semantic divergence
      // that exists without any kill and is out of this drill's scope).
      // Extra pays arriving AFTER a key resolved (shipped or timed out)
      // re-open pay-only state that the timer then flushes as one more
      // "timeout" row — the reference's pay-without-create side-output,
      // not the order's outcome. The per-key verdict is therefore
      // min(status): "shipped" (an in-deadline pay seen with the create
      // live) is authoritative when present, the flush rows collapse
      // into "timeout" otherwise.
      val conforming = graft.sources.Tables.orders(spark, sf)
        .join(graft.sources.Tables.lineitem(spark, sf)
          .groupBy(col("l_orderkey").as("order_id"))
          .agg(min(col("l_shipdate").cast("timestamp")).as("first_pay")),
          col("o_orderkey") === col("order_id"), "left")
        .filter(col("first_pay").isNull ||
          col("first_pay") >= col("o_orderdate").cast("timestamp"))
        .select(col("o_orderkey"))
      val batch = SparkEntry.queries("q10_order_timeout_fsm")(spark, sf)
        .join(conforming, Seq("o_orderkey"), "left_semi")
      val streamConf = out.groupBy(col("order_id"))
        .agg(min(col("status")).as("status"))
        .join(conforming.withColumnRenamed("o_orderkey", "order_id"),
          Seq("order_id"), "left_semi")
      assert(sortedRows(streamConf) ==
        sortedRows(batch.select(col("o_orderkey"), col("status"))),
        "restarted order monitor must equal the batch FSM on create-first orders")
      // ...and the invariant-violating orphan keys still FLUSH (their
      // timers fired rather than leaking state silently)
      val orphans = SparkEntry.queries("q10_order_timeout_fsm")(spark, sf)
        .join(conforming, Seq("o_orderkey"), "left_anti")
      if (orphans.count() > 0)
        assert(out.join(orphans.withColumnRenamed("o_orderkey", "order_id"),
          Seq("order_id"), "left_semi").count() > 0,
          "orphan-pay keys must be timer-flushed, not leaked")
    }
  }
}
