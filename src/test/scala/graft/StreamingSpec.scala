package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{StateMachines, StreamingJobs}
import graft.streaming.StateMachines._

/** Streaming tier tests: pure state-machine scenarios (FIXTURES.md
  * §5-6 cases) and stream==batch equivalence for the Structured
  * Streaming twins at sf0.001.
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  // ------------------------------------------------- pure state machines
  test("login FSM: consecutive fails within gap alert; success clears") {
    val warns = StateMachines.loginFold(7L,
      Seq((100L, true), (101L, true), (200L, false), (300L, true), (301L, true), (5000L, true)),
      maxGapSec = 2)
    assert(warns == Seq(
      LoginWarning(7, 100, 101, "repeated failures"),
      LoginWarning(7, 300, 301, "repeated failures")))
  }

  test("login FSM: fail-success-fail does not alert") {
    val warns = StateMachines.loginFold(1L,
      Seq((100L, true), (101L, false), (102L, true)), maxGapSec = 10)
    assert(warns.isEmpty)
  }

  test("order FSM: all four C5 outcome labels") {
    def run(events: Seq[(Long, Boolean)]): String = {
      val st = events.foldLeft(OrderState(None, None)) {
        case (s, (ts, c)) => StateMachines.orderStep(s, OrderEvent(1, ts, c))
      }
      StateMachines.orderOutcome(1, st, timeoutSec = 900).status
    }
    assert(run(Seq((0L, true), (100L, false))) == "payed")
    assert(run(Seq((0L, true), (1000L, false))) == "payed but timeout")
    assert(run(Seq((0L, true))) == "timeout")
    assert(run(Seq((100L, false))) == "pay without create")
  }

  test("tx FSM: matched / left_only / right_only") {
    assert(StateMachines.txOutcome(TxState(true, true)).tag == "matched")
    assert(StateMachines.txOutcome(TxState(true, false)).tag == "left_only")
    assert(StateMachines.txOutcome(TxState(false, true)).tag == "right_only")
  }

  test("blacklist FSM: one warning at threshold, suppression after") {
    val outs = (1 to 5).foldLeft((ClickState(0, warned = false), Vector.empty[ClickOut])) {
      case ((st, acc), _) =>
        val (st2, o) = StateMachines.clickStep(st, threshold = 3)
        (st2, acc ++ o)
    }._2
    assert(outs.count(_.isInstanceOf[BlacklistWarning]) == 1)
    assert(outs.collect { case PassedClick(n) => n } == Vector(1, 2))
  }

  // --------------------------------------------- stream == batch twins
  test("streaming PV hourly equals batch q3") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.pvHourly(spark, sf), "pv_stream", "complete")
    val batch = SparkEntry.queries("q3_pv_hourly")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming hot-item counts equal batch sliding counts") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.hotItemCounts(spark, sf), "hot_stream", "complete")
    val batch = graft.operators.TimeWindows.slidingCount(
      graft.sources.Tables.eventsWithItem(spark, sf).filter(col("event_type") === "click"),
      "ts", "1 hour", "5 minutes", col("item_id"))
      .select(col("window_start"), col("item_id"), col("cnt"))
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming login-fail FSM equals batch q9") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.loginFailStream(spark, sf).toDF(), "login_stream", "append")
    val batch = SparkEntry.queries("q9_login_fail")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming blacklist: pass-through until threshold, one warning, suppression after") {
    val threshold = 2L
    val tagged = StreamingJobs.runToMemory(
      StreamingJobs.blacklistStream(spark, sf, threshold).toDF(), "bl_stream", "append")
      .cache()
    // side-output split over the tagged union
    var split = Map.empty[String, Long]
    graft.sinks.Sinks.splitByTag(tagged, "tag", Seq("click", "warning")) {
      (tag, df) => split += tag -> df.count()
    }
    // batch ground truth per (user, item): total clicks n
    val totals = graft.sources.Tables.eventsWithItem(spark, sf)
      .filter(col("event_type") === "click")
      .groupBy("user_id", "item_id").count()
    val expectedWarnings = totals.filter(col("count") >= threshold).count()
    val expectedClicks = totals
      .agg(sum(least(col("count"), lit(threshold - 1)))).first().getLong(0)
    assert(split("warning") == expectedWarnings)
    assert(split("click") == expectedClicks)
    // exactly one warning per blacklisted key
    assert(tagged.filter(col("tag") === "warning")
      .groupBy("user_id", "item_id").count().filter(col("count") > 1).isEmpty)
  }

  test("streaming interval join equals batch q10_interval_join") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.intervalJoinStream(spark, sf), "ij_stream", "append")
    val batch = SparkEntry.queries("q10_interval_join")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("interval join: watermark EVICTS buffered state — removal observed in metrics, not assumed") {
    val q = StreamingJobs.intervalJoinStream(spark, sf)
      .writeStream.format("memory").queryName("ij_state").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val joinOps = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(op => (p.batchId, op)))
      .filter(_._2.operatorName.contains("Join"))
    assert(joinOps.nonEmpty, "expected symmetric-hash-join state operators")
    val peak = joinOps.map(_._2.numRowsTotal).max
    val last = joinOps.maxBy(_._1)._2.numRowsTotal
    val removed = joinOps.map(_._2.numRowsRemoved).sum
    assert(removed > 0,
      s"watermark passing must REMOVE buffered join state (peak=$peak last=$last removed=$removed)")
    assert(last < peak,
      s"state must shrink after the watermark passes, not accumulate (peak=$peak last=$last)")
    // the surviving rows are only those inside the 1s watermark horizon
    // of the newest event — a tiny tail, never the whole stream
    assert(last < peak / 2,
      s"post-watermark state should be a horizon-sized tail of the $peak buffered rows, got $last")
  }

  test("SCD2: state is O(active users) — growth stops once all users are seen, despite new events") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val cutSec = ev.selectExpr("percentile(CAST(ts AS LONG), 0.5)").first().getDouble(0)
    val staged = Files.createTempDirectory("graft-scd2-state")
    def stageHalf(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-scd2-state-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) <= $cutSec")), "00.parquet")
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) > $cutSec")), "01.parquet")
    val src = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
      .parquet(staged.toString).withWatermark("ts", "1 second")
    val q = StreamingJobs.scd2Of(src).toDF()
      .writeStream.format("memory").queryName("scd2_state").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ops = q.recentProgress.toSeq
      .flatMap(p => p.stateOperators.toSeq.map(op => (p.batchId, op)))
      .filter(_._2.operatorName.contains("flatMapGroupsWithState"))
      .sortBy(_._1)
    assert(ops.size >= 2, "need >= 2 micro-batches to observe the growth plateau")
    val users = ev.select("user_id").distinct().count()
    val events = ev.count()
    // every batch's state is exactly one row per user ever seen — never
    // proportional to events — and batch 2 still UPDATES without growing
    assert(ops.last._2.numRowsTotal == users,
      s"state must be one row per user ($users), got ${ops.last._2.numRowsTotal} (of $events events)")
    assert(ops.head._2.numRowsTotal == ops.last._2.numRowsTotal,
      "state growth must stop once the user population is seen")
    assert(ops.last._2.numRowsUpdated > 0,
      "later batches keep updating per-user state in place, not appending")
  }

  test("streaming watermarked dedup equals batch distinct") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.dedupStream(spark, sf), "dedup_stream", "append")
    val batch = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type")).distinct()
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("stream-static broadcast enrichment equals batch join") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.enrichedStream(spark, sf), "enrich_stream", "append")
    val ev = graft.sources.Tables.events(spark, sf).filter(col("event_type") === "click")
    val cust = graft.sources.Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = graft.sources.Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
    val batch = ev.join(cust, col("user_id") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name"))
    assert(sortedRows(stream) == sortedRows(batch))
  }

  // ------------------------------------------------------- funnel FSM
  test("funnel FSM: stage advances only in order, first timestamps win") {
    val steps = Seq(
      ("click", 10L), // ignored: no view yet
      ("view", 20L), ("view", 25L), // second view ignored
      ("purchase", 30L), // ignored: no click yet
      ("click", 40L), ("purchase", 50L), ("purchase", 60L))
    val st = steps.foldLeft(FunnelState(None, None, None)) {
      case (s, (t, ts)) => StateMachines.funnelStep(s, t, ts)
    }
    assert(StateMachines.funnelResult(1L, st) ==
      FunnelResult(1L, Some(20L), Some(40L), Some(50L), "purchase"))
    assert(StateMachines.funnelResult(2L, FunnelState(None, None, None)).stage == "none")
  }

  /** Reduce a funnel-snapshot stream to each user's furthest-progressed
    * snapshot (lexicographic struct max keyed by a stage score).
    */
  private def furthestSnapshots(stream: DataFrame): DataFrame =
    stream
      .withColumn("score",
        when(col("t_purchase").isNotNull, 3).when(col("t_click").isNotNull, 2)
          .when(col("t_view").isNotNull, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(max(struct(col("score"), col("t_view"), col("t_click"),
        col("t_purchase"), col("stage"))).as("s"))
      .select(col("user_id"), col("s.t_view").as("t_view"), col("s.t_click").as("t_click"),
        col("s.t_purchase").as("t_purchase"), col("s.stage").as("stage"))

  test("streaming funnel carries state across micro-batches (2-file replay)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val cutSec = ev.selectExpr("percentile(CAST(ts AS LONG), 0.5)").first().getDouble(0)
    val staged = Files.createTempDirectory("graft-funnel-2b")
    def stageHalf(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-funnel-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    // event-time-ordered halves: batch 1 = first half, batch 2 = rest
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) <= $cutSec")), "00.parquet")
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) > $cutSec")), "01.parquet")
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1) // forces >= 2 micro-batches
      .parquet(staged.toString)
      .withWatermark("ts", "1 second")
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.funnelOf(src).toDF(), "funnel_2b", "append")
    val batch = SparkEntry.queries("funnel_analysis")(spark, sf)
    assert(sortedRows(furthestSnapshots(stream)) ==
      sortedRows(batch.select("user_id", "t_view", "t_click", "t_purchase", "stage")))
  }

  test("streaming MV maintenance: per-batch partial merge converges to the batch view (2-file replay)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val cutSec = ev.selectExpr("percentile(CAST(ts AS LONG), 0.5)").first().getDouble(0)
    val staged = Files.createTempDirectory("graft-mv-2b")
    def stageHalf(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-mv-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) <= $cutSec")), "00.parquet")
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) > $cutSec")), "01.parquet")
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1) // forces >= 2 micro-batches (real merge path)
      .parquet(staged.toString)
      .withWatermark("ts", "1 second")
    val statePath = Files.createTempDirectory("graft-mv-state").toString
    val cp = Files.createTempDirectory("graft-mv-cp").toString
    val q = StreamingJobs.aggMergeOf(src, statePath, cp)
    q.awaitTermination()
    val state = spark.read.parquet(statePath)
      .select(col("user_id"), col("n_events"),
        col("sum_v").cast("double").as("sum_value"), col("last_ts_us"))
    val batch = SparkEntry.queries("incremental_agg_merge")(spark, sf)
      .select("user_id", "n_events", "sum_value", "last_ts_us")
    assert(sortedRows(state) == sortedRows(batch),
      "streamed partial-merge state must equal the batch materialized view")
    // replay safety: foreachBatch is at-least-once — re-applying the
    // LAST batch with its original batchId (what a crash between upsert
    // and offset commit produces) must leave the state byte-identical,
    // because every touched key is already stamped with that batchId
    val before = sortedRows(spark.read.parquet(statePath)
      .select("user_id", "n_events", "sum_v", "last_ts_us", "last_batch"))
    val lastBatch = spark.read.parquet(
      Paths.get(staged.toString, "01.parquet").toString)
    StreamingJobs.aggMergeBatch(lastBatch, statePath, batchId = 1L)
    val after = sortedRows(spark.read.parquet(statePath)
      .select("user_id", "n_events", "sum_v", "last_ts_us", "last_batch"))
    assert(after == before, "replayed micro-batch must not double-count")
    // ...while the same data under a NEW batchId genuinely merges
    // (proves the guard discriminates on batchId, not a no-op)
    StreamingJobs.aggMergeBatch(lastBatch, statePath, batchId = 2L)
    assert(sortedRows(spark.read.parquet(statePath)
      .select("user_id", "n_events", "sum_v", "last_ts_us", "last_batch")) != before,
      "a new batchId with fresh data must still merge")
  }

  test("streaming ad-geo counts equal batch q8_ad_geo") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.adGeoStream(spark, sf), "geo_stream", "complete")
    val batch = SparkEntry.queries("q8_ad_geo")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming marketing-by-channel equals batch q6") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.marketingByChannel(spark, sf), "mkt_stream", "complete")
    val batch = SparkEntry.queries("q6_marketing_by_channel")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming marketing totals equal batch q7") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.marketingTotal(spark, sf), "mkt_total_stream", "complete")
    val batch = SparkEntry.queries("q7_marketing_total")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming session windows equal batch sessionize") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.sessionizeStream(spark, sf), "sess_stream", "complete")
    val batch = SparkEntry.queries("sessionize")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("continuous UV (W8): running snapshots across micro-batches converge to batch q5_uv_bloom") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val staged = Files.createTempDirectory("graft-uv-2b")
    def stageHalf(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-uv-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    // id-parity halves (NOT a time split): every hour window spans both
    // micro-batches, so running-count re-emission is visible everywhere.
    // No watermark: NoTimeout FMGWS needs none, and one would discard
    // batch 2 wholesale as late data under this interleaving.
    stageHalf(ev.filter(col("event_id") % 2 === 0), "00.parquet")
    stageHalf(ev.filter(col("event_id") % 2 === 1), "01.parquet")
    val src = spark.readStream
      .schema(ev.schema)
      .option("maxFilesPerTrigger", 1) // forces >= 2 micro-batches
      .parquet(staged.toString)
    val snaps = StreamingJobs.runToMemory(
      StreamingJobs.continuousUvBloom(src).toDF(), "uv_cont", "append").cache()
    // the reference's per-element fire means running counts: hour
    // windows spanning both halves re-emit as their count advances
    assert(snaps.groupBy("window_start").count().filter(col("count") >= 2).count() > 0,
      "expected at least one window to emit an updated running count in batch 2")
    // snapshots are emitted only on change and the count only grows —
    // the per-window max IS the final state, and it equals the batch
    // Bloom UV exactly
    val finals = snaps.groupBy("window_start").agg(max("uv_bloom").as("uv_bloom"))
    val batch = SparkEntry.queries("q5_uv_bloom")(spark, sf)
    assert(sortedRows(finals) == sortedRows(batch))
  }

  test("keyed upsert (K2): per-key replacement, untouched keys survive, duplicate replay idempotent") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    val path = Files.createTempDirectory("graft-kv").toString
    def state(): Set[(Long, Long)] =
      spark.read.parquet(path).select(col("window_start").cast("long"), col("uv_bloom"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = Seq((5L, 100L), (7L, 200L)).toDF("uv_bloom", "window_start")
    graft.sinks.Sinks.upsertKeyed(b1, path, "window_start")
    assert(state() == Set((100L, 5L), (200L, 7L)))
    // upsert one key: it is replaced, the other key is untouched
    val b2 = Seq((9L, 200L)).toDF("uv_bloom", "window_start")
    graft.sinks.Sinks.upsertKeyed(b2, path, "window_start")
    assert(state() == Set((100L, 5L), (200L, 9L)))
    // at-least-once duplicate replay: same final state
    graft.sinks.Sinks.upsertKeyed(b2, path, "window_start")
    assert(state() == Set((100L, 5L), (200L, 9L)))

    // end-to-end streaming externalization: continuous UV upserted per
    // micro-batch; the store's final state equals batch q5_uv_bloom
    val uvPath = Files.createTempDirectory("graft-kv-uv").toString
    val q = graft.sinks.Sinks.upsertStream(
      StreamingJobs.continuousUvBloom(StreamingJobs.eventsStream(spark, sf)).toDF(),
      uvPath, "window_start",
      Files.createTempDirectory("graft-kv-uv-cp").toString)
    q.awaitTermination()
    val stored = spark.read.parquet(uvPath)
      .select(col("window_start").cast("long").as("window_start"), col("uv_bloom"))
    val batch = SparkEntry.queries("q5_uv_bloom")(spark, sf)
    assert(sortedRows(stored) == sortedRows(batch))
  }

  test("streaming hotItemsTopN end-to-end equals batch q1_hot_items") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-topn").toString
    val stream = StreamingJobs.hotItemsTopN(spark, sf, 3, out)
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn").cast("long").as("rn"))
    val batch = SparkEntry.queries("q1_hot_items")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming near-dup alerts equal the batch banded lookup") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.neardupAlertStream(spark, sf, 0.2), "nd_alert", "append")
    val batch = StreamingJobs.neardupAlertBatch(spark, sf, 0.2)
    assert(batch.count() > 0, "threshold must produce alerts at this scale")
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming MinHash dedup probe equals its batch twin and the registered query") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.dedupProbeStream(spark, sf), "dedup_probe", "append")
    val batch = StreamingJobs.dedupProbeBatch(spark, sf)
    assert(batch.count() > 0, "expected live dup matches at this scale")
    assert(sortedRows(stream) == sortedRows(batch))
    // rank-1 of the live matches IS the registered dedup_incremental verdict
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("in_id")).orderBy(col("jaccard").desc, col("dup_of"))
    val best = batch.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("in_id").as("batch_id"), col("dup_of"), col("jaccard"))
    val registered = SparkEntry.queries("dedup_incremental")(spark, sf)
    assert(sortedRows(best) == sortedRows(registered))
  }

  test("streaming bloom-prefilter join equals its batch twin and rolls up to the registered query (19th twin)") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.bloomPrefilterStream(spark, sf), "bloom_prefilter", "append")
    val batch = StreamingJobs.bloomPrefilterBatch(spark, sf)
    assert(batch.count() > 0, "expected purchases by heavy-error users at this scale")
    assert(sortedRows(stream) == sortedRows(batch))
    // the live rows aggregate to exactly the registered batch query
    val rolled = stream.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
    val registered = SparkEntry.queries("bloom_prefilter_join")(spark, sf)
    assert(sortedRows(rolled) == sortedRows(registered))
  }

  test("streaming dedup verdicts equal the batch manifest (18th twin)") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-verdicts").toString + "/out"
    val stream = StreamingJobs.dedupVerdictsStream(spark, sf, out)
    val batch = SparkEntry.queries("dedup_verdicts")(spark, sf)
    assert(batch.count() > 0)
    assert(sortedRows(stream) == sortedRows(batch))
    // every reason class the batch manifest carries must be exercised live
    val reasons = stream.select("reason").distinct().collect().map(_.getString(0)).toSet
    assert(reasons.contains("ok") || reasons.contains("near_dup"))
  }

  test("streaming snapshot diff equals its batch twin and corpus_diff minus removals") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.snapshotDiffStream(spark, sf), "snap_diff", "append")
    val batch = StreamingJobs.snapshotDiffBatch(spark, sf)
    assert(batch.count() > 0)
    assert(sortedRows(stream) == sortedRows(batch))
    // per-row ingest classification covers everything except the
    // end-of-snapshot reconciliation class
    val registered = SparkEntry.queries("corpus_diff")(spark, sf)
      .filter(col("status") =!= "removed")
    assert(sortedRows(batch) == sortedRows(registered))
    // all three live statuses are actually exercised
    assert(stream.select(col("status")).distinct().count() == 3)
  }

  test("streaming state and file sink survive a query restart from checkpoint (exactly-once)") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val cutSec = ev.selectExpr("percentile(CAST(ts AS LONG), 0.5)").first().getDouble(0)
    val srcDir = Files.createTempDirectory("graft-restart-src")
    val cp = Files.createTempDirectory("graft-restart-cp").toString
    val out = Files.createTempDirectory("graft-restart-out").toString
    def stageHalf(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft-restart-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(srcDir.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    def runOnce(): Unit = {
      val counts = spark.readStream
        .schema(ev.schema)
        .parquet(srcDir.toString)
        .withWatermark("ts", "1 second")
        .filter(col("event_type") === "view")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("pv"))
        .select(col("window.start").cast("long").as("window_start"), col("pv"))
      val q = counts.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // phase 1: first half only, then the query STOPS (AvailableNow)
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) <= $cutSec")), "00.parquet")
    runOnce()
    // phase 2: second half lands; a NEW query resumes from the same
    // checkpoint — window state and sink offsets must carry over
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) > $cutSec")), "01.parquet")
    runOnce()
    val result = spark.read.parquet(out)
    // exactly-once: append emits each finalized window once; a replayed
    // or double-written window would surface as a duplicate key
    assert(result.groupBy("window_start").count().filter(col("count") > 1).isEmpty,
      "restart must not duplicate windows")
    // correctness: equals batch q3 over the finalized windows (the
    // view-filter pushdown makes the watermark track view times)
    val maxView = ev.filter(col("event_type") === "view")
      .selectExpr("max(CAST(ts AS LONG))").first().getLong(0)
    val batch = SparkEntry.queries("q3_pv_hourly")(spark, sf)
      .filter(col("window_start") + 3600 <= maxView - 1)
    assert(batch.count() > 0)
    assert(sortedRows(result) == sortedRows(batch))
  }

  test("append-mode hotItemsTopN ranks exactly the finalized windows") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-topn-append").toString
    val stream = StreamingJobs.hotItemsTopNAppend(spark, sf, 3, out)
      .select(col("window_start").cast("long").as("window_start"), col("item_id"),
        col("cnt"), col("rn").cast("long").as("rn"))
    // append mode emits a window once its END passes the final
    // watermark. The watermark tracks the CLICK-filtered stream, not
    // the raw events: Catalyst pushes the event-type filter below the
    // EventTimeWatermark operator, so only click rows feed the stats —
    // final watermark = max click ts - 1s.
    val maxClick = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .selectExpr("max(CAST(ts AS LONG))").first().getLong(0)
    val batch = SparkEntry.queries("q1_hot_items")(spark, sf)
      .filter(col("window_start") + 3600 <= maxClick - 1)
    assert(batch.count() > 0)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("streaming hotPagesTopN end-to-end equals batch q2_hot_pages") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft-pages").toString
    val stream = StreamingJobs.hotPagesTopN(spark, sf, 5, out)
      .select(col("window_start"), col("item_id"), col("cnt"), col("rn").cast("long").as("rn"))
    val batch = SparkEntry.queries("q2_hot_pages")(spark, sf)
    assert(sortedRows(stream) == sortedRows(batch))
  }

  test("continuousUvBloom with eviction: same final counts, state store drained") {
    // evict=true arms an event-time timer at each window's end; the
    // AvailableNow replay runs a final timeout batch after the data,
    // so every window's bitmap is removed — yet the emitted snapshots'
    // per-window max still equals the batch Bloom UV exactly
    val q = StreamingJobs.continuousUvBloom(
        StreamingJobs.eventsStream(spark, sf), evict = true).toDF()
      .writeStream.format("memory").queryName("uv_evict").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val finals = spark.table("uv_evict")
      .groupBy("window_start").agg(max("uv_bloom").as("uv_bloom"))
    val batch = SparkEntry.queries("q5_uv_bloom")(spark, sf)
    assert(sortedRows(finals) == sortedRows(batch))
    val lastState = q.recentProgress.reverse
      .find(p => p.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
    // the final watermark is max(view ts) - 1s, which is strictly
    // inside the last window — that window can never time out, so
    // exactly the windows still open at shutdown survive eviction
    val maxView = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "view")
      .selectExpr("max(CAST(ts AS LONG))").first().getLong(0)
    val openWindows = spark.table("uv_evict").select("window_start").distinct()
      .filter(col("window_start") + 3600 > maxView - 1).count()
    assert(openWindows < spark.table("uv_evict").select("window_start").distinct().count(),
      "test needs at least one finalized window to prove eviction")
    assert(lastState.contains(openWindows),
      s"expected only the $openWindows un-finalized window(s) to survive, got $lastState")
  }

  test("topN read-back returns an empty typed frame when no batch wrote output") {
    import java.nio.file.Files
    // a source directory with no files: AvailableNow completes without
    // any micro-batch, foreachBatch never runs, outPath stays empty
    val empty = Files.createTempDirectory("graft-empty-src")
    val out = Files.createTempDirectory("graft-topn-none").toString
    val result = StreamingJobs.hotItemsTopNFrom(
      spark.readStream.schema(StreamingJobs.eventsRawSchema)
        .parquet(empty.toString)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        .withWatermark("ts", "1 second"),
      3, out)
    assert(result.isEmpty)
    assert(result.columns.toSeq == Seq("window_start", "item_id", "cnt", "rn"))
  }

  test("streaming SCD2 closed intervals equal batch scd2_user_state closed rows") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.scd2Stream(spark, sf).toDF(), "scd2_stream", "append")
    val batch = SparkEntry.queries("scd2_user_state")(spark, sf)
      .filter(col("valid_to_us").isNotNull)
      .select("user_id", "run_id", "event_type", "valid_from_us",
        "valid_to_us", "n_events", "is_current")
    assert(sortedRows(stream.select("user_id", "run_id", "event_type",
      "valid_from_us", "valid_to_us", "n_events", "is_current")) ==
      sortedRows(batch))
  }

  test("streaming funnel snapshots converge to batch funnel_analysis") {
    val stream = StreamingJobs.runToMemory(
      StreamingJobs.funnelStream(spark, sf).toDF(), "funnel_stream", "append")
    val batch = SparkEntry.queries("funnel_analysis")(spark, sf)
    assert(sortedRows(furthestSnapshots(stream)) ==
      sortedRows(batch.select("user_id", "t_view", "t_click", "t_purchase", "stage")))
  }

  test("late-data quarantine: count(main) + count(late) == count(input); late set matches Spark's own drops") {
    import java.nio.file.{Files, Paths}
    val s = spark
    import s.implicits._
    // the SAME two-batch scenario the ScalePostureSpec watermark test
    // proves Spark drops silently: batch 1 advances the watermark to
    // 11:50, batch 2 carries one 4h-late row (+ one on-time row)
    val src = Files.createTempDirectory("graft-q-src")
    Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 12:00:00"))
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(src.resolve("f1").toString)
    Seq((3L, "2024-01-01 08:00:00"), (4L, "2024-01-01 12:30:00"))
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(src.resolve("f2").toString)
    val stage = Files.createTempDirectory("graft-q-in")
    val outP = Files.createTempDirectory("graft-q-out").toString + "/main"
    val quarP = Files.createTempDirectory("graft-q-quar").toString + "/late"
    def arrive(sub: String, pre: String): Unit =
      Files.list(src.resolve(sub)).filter(_.toString.endsWith(".parquet"))
        .forEach(p => Files.copy(p, stage.resolve(pre + p.getFileName)))
    arrive("f1", "a_")
    val q = graft.streaming.LateData.hourlyQuarantinedQuery(
      spark.readStream.schema("id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(stage.toString),
      "ts", delaySec = 600L, outP, quarP)
    try {
      q.processAllAvailable()
      arrive("f2", "b_")
      q.processAllAvailable()
    } finally q.stop()
    val main = spark.read.parquet(outP)
    val late = spark.read.parquet(quarP)
    // conservation: every input row lands in exactly one channel
    assert(main.count() + late.count() == 4L)
    // the quarantined set is exactly what Spark's native watermark
    // drops in the twin scenario (id 3: window end 09:00 <= wm 11:50)
    assert(late.select("id").as[Long].collect().toSeq == Seq(3L))
    assert(late.select("rejected_by_wm_sec").as[Long].head() ==
      java.time.Instant.parse("2024-01-01T11:50:00Z").getEpochSecond)
    assert(main.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
  }

  test("late-data quarantine evaluates each micro-batch row ONCE (persisted split, not 3 scans)") {
    import java.nio.file.Files
    val s = spark
    import s.implicits._
    // same two-batch scenario, with a row-counting UDF planted in the
    // stream: the split runs three actions per batch (main write, late
    // write, max-ts agg) — un-persisted, every row was evaluated 3x
    // (VERDICT r9 finding 3); the persisted split must touch each once
    val src = Files.createTempDirectory("graft-q1-src")
    Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 12:00:00"))
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(src.resolve("f1").toString)
    Seq((3L, "2024-01-01 08:00:00"), (4L, "2024-01-01 12:30:00"))
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(src.resolve("f2").toString)
    val stage = Files.createTempDirectory("graft-q1-in")
    val outP = Files.createTempDirectory("graft-q1-out").toString + "/main"
    val quarP = Files.createTempDirectory("graft-q1-quar").toString + "/late"
    def arrive(sub: String, pre: String): Unit =
      Files.list(src.resolve(sub)).filter(_.toString.endsWith(".parquet"))
        .forEach(p => Files.copy(p, stage.resolve(pre + p.getFileName)))
    val acc = spark.sparkContext.longAccumulator("quarantine-row-evals")
    val tick = udf { (id: Long) => acc.add(1L); id }
    arrive("f1", "a_")
    val q = graft.streaming.LateData.hourlyQuarantinedQuery(
      spark.readStream.schema("id LONG, ts TIMESTAMP")
        .option("maxFilesPerTrigger", "1").parquet(stage.toString)
        .withColumn("id", tick(col("id"))),
      "ts", delaySec = 600L, outP, quarP)
    try {
      q.processAllAvailable()
      arrive("f2", "b_")
      q.processAllAvailable()
    } finally q.stop()
    // outputs unchanged...
    assert(spark.read.parquet(outP).count() + spark.read.parquet(quarP).count() == 4L)
    // ...and 4 input rows -> exactly 4 evaluations across all batches
    assert(acc.value == 4L,
      s"split re-scanned the micro-batch: ${acc.value} row evaluations for 4 rows")
  }
}
