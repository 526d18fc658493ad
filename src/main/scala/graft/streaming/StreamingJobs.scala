package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

import graft.streaming.StateMachines._

/** Structured Streaming forms of the engine's queries: file-replay
  * sources, watermarked window aggregations, stream-stream interval
  * joins, and `flatMapGroupsWithState` state machines. Each streaming
  * query has a batch twin in graft.queries; StreamingSpec asserts
  * stream == batch on the same data (the reference's implicit
  * correctness contract, SURVEY.md §5.3).
  *
  * At scale these run identically: the parquet file source becomes a
  * Kafka source (`format("kafka")` + the same downstream plan), and
  * watermark-driven state eviction bounds every operator's state.
  */
object StreamingJobs {

  /** Epoch microseconds of a Timestamp — the batch queries order by
    * `unix_micros`, so every FSM sorts its micro-batch rows by the SAME
    * microsecond key (getTime is only millisecond-resolution; two events
    * in the same ms but different us must order by time, not event_id).
    */
  private def tsUs(t: java.sql.Timestamp): Long =
    (t.getTime / 1000L) * 1000000L + t.getNanos / 1000L

  /** Spark's file stream source requires a directory; the testdata
    * tables are single files. Stage a per-table directory holding a
    * symlink to the parquet file (in production this is simply the
    * ingest directory that files land in, or a Kafka topic).
    */
  def stagedPath(dir: String, table: String): String = {
    import java.nio.file.{Files, Paths}
    // absolutize: the symlink target resolves relative to the STAGE
    // dir, so a caller-relative corpus dir ("testdata_sf1") produced a
    // broken link — and a parquet stream over it reads 0 rows silently
    // (caught by the r16 StreamBench sf1 shakeout)
    val src = Paths.get(dir, s"$table.parquet").toAbsolutePath.normalize()
    // staging exists because a streaming FILE source needs a directory
    // and the driver corpora ship single-file tables. A multi-part
    // corpus (generated sfN dirs) is already a directory — return it
    // directly: a symlink-to-directory inside the stage would put the
    // part files at depth 2, where Spark's non-recursive leaf listing
    // silently reads 0 rows (the r16 StreamBench sf1 shakeout bug)
    if (Files.isDirectory(src)) return src.toString
    val stage = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-stream", dir.replaceAll("[^A-Za-z0-9.]", "_"), table)
    Files.createDirectories(stage)
    val link = stage.resolve(s"$table.parquet")
    // NOFOLLOW: a stale BROKEN link reports !exists under the default
    // follow semantics and then createSymbolicLink throws
    // FileAlreadyExists; replace any link that doesn't resolve to src
    if (Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        (!Files.isSymbolicLink(link) || Files.readSymbolicLink(link) != src))
      Files.delete(link)
    if (!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      Files.createSymbolicLink(link, src)
    stage.toString
  }

  /** Raw events schema of the LEGACY data generation (ts =
    * TIMESTAMP(NANOS), read as long). Current generations store
    * TIMESTAMP(MICROS), which binds as TIMESTAMP_NTZ — use
    * [[eventsRawSchemaFor]] to pick the right one for a directory. */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  def eventsRawSchemaFor(tsLong: Boolean): StructType =
    if (tsLong) eventsRawSchema
    else StructType(eventsRawSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** Raw file-replay events stream with `ts` normalized to a
    * session-zoned (UTC) TimestampType, whichever physical encoding
    * this data generation uses — the single place the streaming side
    * branches on it. */
  private def rawEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsLong = graft.sources.Tables.eventsTsIsLong(spark, dir)
    val raw = spark.readStream
      .schema(eventsRawSchemaFor(tsLong))
      .parquet(stagedPath(dir, "events"))
    if (tsLong) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** File-replay stream of the events table with proper event-time
    * timestamps and a bounded-out-of-orderness watermark.
    */
  def eventsStream(spark: SparkSession, dir: String, watermark: String = "1 second"): DataFrame =
    rawEventsStream(spark, dir).withWatermark("ts", watermark)

  /** Streaming twin of q3_pv_hourly: tumbling 1h count of views. */
  def pvHourly(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .filter(col("event_type") === "view")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("pv"))
      .select(col("window.start").cast("long").as("window_start"), col("pv"))

  /** Streaming twin of q6_marketing_by_channel: 1h/15m sliding counts
    * per (channel, behavior) — the reference's AppMarketingByChannel
    * as a watermarked window aggregation.
    */
  def marketingByChannel(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .filter(col("event_type") =!= "error")
      .withColumn("channel_id", col("user_id") % 5)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("channel_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("window_start"),
        col("channel_id"), col("event_type"), col("cnt"))

  /** Streaming twin of q7_marketing_total: the channel-free 1h/15m
    * sliding totals (reference's AppMarketing).
    */
  def marketingTotal(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .filter(col("event_type") =!= "error")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("window_start"), col("cnt"))

  /** Streaming twin of q8_ad_geo: stream-static broadcast dimension
    * enrichment (customer→nation) feeding a 1h/20m sliding count per
    * province — the reference's AdStatisticsByGeo main output with zero
    * stream-side join state.
    */
  def adGeoStream(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = graft.sources.Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(window(col("ts"), "1 hour", "20 minutes"), col("n_name"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("window_start"),
        col("n_name").as("province"), col("cnt"))
  }

  /** Streaming twin of q1's windowed count stage (rank runs on the
    * sink side / foreachBatch, per SURVEY.md §3 E1).
    */
  def hotItemCounts(spark: SparkSession, dir: String): DataFrame =
    hotItemCountsFrom(eventsStream(spark, dir))

  /** [[hotItemCounts]] over a caller-supplied (already watermarked)
    * events stream — lets tests drive the chain from arbitrary
    * sources, including empty ones.
    */
  def hotItemCountsFrom(events: DataFrame): DataFrame =
    events
      .filter(col("event_type") === "click")
      .withColumn("item_id", graft.sources.Tables.itemIdFromProps(col("props")))
      .groupBy(window(col("ts"), "1 hour", "5 minutes"), col("item_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("window_start"), col("item_id"), col("cnt"))

  // ---------------------------------------------------------- login FSM
  /** `ts` stays in the row: the watermarked event-time column must
    * survive into the typed Dataset for EventTimeTimeout analysis.
    */
  final case class FailRow(user_id: Long, ts: java.sql.Timestamp, event_id: Long)

  /** Streaming login-fail detector: the same pure fold as the batch
    * q9_login_fail_fsm, with per-key state carried across micro-batches
    * in GroupState. Events are sorted within each micro-batch group;
    * cross-batch order comes from file-replay order (per-key event-time
    * order, the reference's assumption). State is evicted by an
    * event-time timer once the watermark passes lastFail + maxGap — a
    * fail that old can never pair with a future one, so per-user state
    * stays bounded at scale.
    */
  def loginFailStream(spark: SparkSession, dir: String, maxGapSec: Long = 3600): Dataset[LoginWarning] =
    loginFailOf(eventsStream(spark, dir), maxGapSec)

  /** [[loginFailStream]] over any watermarked event frame — split out so
    * the chaos-restart drill can drive it from a multi-file staged
    * source and kill/resume it mid-run (ChaosRestartSpec).
    */
  def loginFailOf(events: DataFrame, maxGapSec: Long = 3600): Dataset[LoginWarning] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("event_id"))
      .as[FailRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LoginState, LoginWarning](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[FailRow], state: GroupState[LoginState]) =>
          if (state.hasTimedOut) {
            state.remove() // stale lastFail: can't pair with anything future
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(LoginState(None))
            val sorted = it.toSeq.sortBy(r => (tsUs(r.ts), r.event_id))
            val (st, outs) = sorted.foldLeft((st0, Vector.empty[LoginWarning])) {
              case ((s, acc), r) =>
                val (s2, o) = StateMachines.loginStep(
                  s, LoginEvent(uid, r.ts.getTime / 1000L, failed = true), maxGapSec)
                (s2, acc ++ o)
            }
            state.update(st)
            st.lastFailTs.foreach { last =>
              state.setTimeoutTimestamp(
                math.max((last + maxGapSec) * 1000L, state.getCurrentWatermarkMs() + 1))
            }
            outs.iterator
          }
      }
  }

  // ------------------------------------------------- generic CEP stream
  final case class CepEvRow(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  final case class CepFfsMatch(user_id: Long, fail1_sec: Long,
      fail2_sec: Long, ok_sec: Long, ok_event_id: Long)

  /** Streaming runner for the [[CepPatterns.failFailSuccess]] pattern:
    * the SAME `CepPattern.step` the batch query folds, carried per key
    * in GroupState — the compile target the combinator builder exists
    * for. State is the live partial-match set, pruned each batch to
    * partials the watermark can still complete (`prunedBelow`), so a
    * `within`-bounded pattern holds O(matches-in-flight) state per key
    * no matter how long the stream runs. Rows sort by the same
    * (second, event_id) key the batch form and its oracle use.
    */
  def cepFailFailSuccessStream(spark: SparkSession, dir: String): Dataset[CepFfsMatch] = {
    import spark.implicits._
    import graft.streaming.CepPatterns._
    val pattern = failFailSuccess(86400)
    implicit val stateEnc: org.apache.spark.sql.Encoder[Vector[CepPattern.Partial[CepEv]]] =
      org.apache.spark.sql.Encoders.javaSerialization
    eventsStream(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[CepEvRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Vector[CepPattern.Partial[CepEv]], CepFfsMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[CepEvRow], state: GroupState[Vector[CepPattern.Partial[CepEv]]]) =>
          val sorted = it.toSeq
            .map(r => (r.ts.getTime / 1000L, r.event_id, r.event_type))
            .sortBy(r => (r._1, r._2))
            .map(r => (r._1, CepEv(r._1, r._2, r._3)))
          val (partials, matches) =
            pattern.step(state.getOption.getOrElse(Vector.empty), sorted)
          state.update(pattern.prunedBelow(partials, state.getCurrentWatermarkMs() / 1000L))
          matches.iterator.map(m =>
            CepFfsMatch(uid, m.tsOf("f1"), m.tsOf("f2"), m.tsOf("ok"), m("ok").id))
      }
  }

  // ------------------------------------------------ blacklist (F1) FSM
  final case class ClickRow(user_id: Long, item_id: Long, ts: java.sql.Timestamp)
  final case class TaggedClick(user_id: Long, item_id: Long, tag: String, cnt: Long)

  /** Streaming click-fraud blacklist (MA/app/AdStatisticByGeo.scala:
    * 71-112): per (user, item) running count in GroupState; clicks pass
    * through until the threshold, one warning at the threshold,
    * suppression after — emitted as ONE tagged union stream that
    * `Sinks.splitStreamByTag` fans out to the main/side sinks (the
    * reference's OutputTag pair).
    */
  def blacklistStream(spark: SparkSession, dir: String, threshold: Long): Dataset[TaggedClick] =
    blacklistOf(eventsStream(spark, dir), threshold)

  /** [[blacklistStream]] over any watermarked event frame (chaos-restart
    * drill entry point).
    */
  def blacklistOf(events: DataFrame, threshold: Long): Dataset[TaggedClick] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        graft.sources.Tables.itemIdFromProps(col("props")).as("item_id"), col("ts"))
      .as[ClickRow]
      .groupByKey(r => (r.user_id, r.item_id))
      .flatMapGroupsWithState[StateMachines.ClickState, TaggedClick](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), it: Iterator[ClickRow], state: GroupState[StateMachines.ClickState]) =>
          val st0 = state.getOption.getOrElse(StateMachines.ClickState(0, warned = false))
          val (st, outs) = it.foldLeft((st0, Vector.empty[TaggedClick])) {
            case ((s, acc), _) =>
              val (s2, o) = StateMachines.clickStep(s, threshold)
              (s2, acc ++ o.map {
                case StateMachines.PassedClick(n) => TaggedClick(key._1, key._2, "click", n)
                case StateMachines.BlacklistWarning(n, _) => TaggedClick(key._1, key._2, "warning", n)
              })
          }
          state.update(st)
          outs.iterator
      }
  }

  // --------------------------------------------- two-stream match FSM
  final case class TxRow(user_id: Long, day_start: Long, is_left: Boolean,
      ts: java.sql.Timestamp)
  final case class TxSnapshot(user_id: Long, day_start: Long, tag: String)

  /** Streaming twin of the batch `tx_match_fsm` (J1, the reference's
    * CoProcess reconciliation): clicks and purchases of the same
    * (user, day) cell fold through the SAME [[StateMachines.txStep]] the
    * batch query uses, carried in GroupState across micro-batches. A
    * snapshot row is emitted whenever a batch CHANGES the cell's tag
    * (first sighting creates it, the opposite side upgrades it to
    * "matched"), so the output is a progression stream whose
    * final-per-key snapshot — "matched" wins over either one-sided
    * tag — equals the batch full-outer-join verdict. `txStep` is
    * idempotent in each side's flag, so the batch form's per-side
    * `.distinct()` is unnecessary here, and at most two snapshots exist
    * per key no matter how many events hit it. State never times out:
    * the batch twin reconciles over all time; a production deployment
    * bounds it with an event-time horizon exactly like the funnel.
    */
  def txMatchOf(events: DataFrame): Dataset[TxSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"),
        (col("ts").cast("long") - pmod(col("ts").cast("long"), lit(86400L)))
          .as("day_start"),
        (col("event_type") === "click").as("is_left"),
        col("ts"))
      .as[TxRow]
      .groupByKey(r => (r.user_id, r.day_start))
      .flatMapGroupsWithState[StateMachines.TxState, TxSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, Long), it: Iterator[TxRow], state: GroupState[StateMachines.TxState]) =>
          val st0 = state.getOption.getOrElse(
            StateMachines.TxState(leftSeen = false, rightSeen = false))
          val st = it.foldLeft(st0) { (s, r) => StateMachines.txStep(s, r.is_left) }
          state.update(st)
          if (st == st0) Iterator.empty
          else Iterator.single(
            TxSnapshot(key._1, key._2, StateMachines.txOutcome(st).tag))
      }
  }

  /** [[txMatchOf]] over the file-replayed events table. */
  def txMatchStream(spark: SparkSession, dir: String): Dataset[TxSnapshot] =
    txMatchOf(eventsStream(spark, dir))

  // ------------------------------------------------------- funnel FSM
  final case class FunnelRow(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)

  /** Streaming funnel progression: per-user view→click→purchase state
    * folded across micro-batches; a snapshot row is emitted whenever a
    * batch advances (or first creates) a user's funnel state, so the
    * output is a progression stream whose FURTHEST snapshot per user
    * equals the batch `funnel_analysis` row (StreamingSpec asserts it).
    * State is deliberately never timed out mid-stream: a funnel over
    * all time cannot evict a user's progress without corrupting later
    * stages (an earlier version flushed+removed on watermark advance
    * and silently restarted any user active in a later micro-batch).
    * A production deployment bounds state with an explicit horizon —
    * fold `funnelStep` under an event-time timeout at
    * lastActivity + horizon and accept stage resets past it.
    */
  def funnelStream(spark: SparkSession, dir: String): Dataset[FunnelResult] =
    funnelOf(eventsStream(spark, dir))

  /** Core funnel operator over any watermarked event frame with
    * (user_id, ts, event_id, event_type) — split out so tests can
    * drive it from a multi-file source with `maxFilesPerTrigger=1`
    * (real cross-micro-batch state carry, not single-batch replay).
    */
  def funnelOf(events: DataFrame): Dataset[FunnelResult] = {
    val spark = events.sparkSession
    import spark.implicits._
    // no event-type filter: users with no funnel events still get a
    // stage='none' row, matching the batch funnel_analysis contract
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[FunnelRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[FunnelRow], state: GroupState[FunnelState]) =>
          val first = !state.exists
          val st0 = state.getOption.getOrElse(FunnelState(None, None, None))
          val st = it.toSeq.sortBy(r => (tsUs(r.ts), r.event_id))
            .foldLeft(st0)((s, r) =>
              StateMachines.funnelStep(s, r.event_type, r.ts.getTime / 1000L))
          state.update(st)
          if (first || st != st0) Iterator.single(StateMachines.funnelResult(uid, st))
          else Iterator.empty
      }
  }

  // ------------------------------------------------- stream-stream join
  /** Streaming twin of q10_interval_join: orders and lineitem as two
    * watermarked streams, equi-join on the key plus the 30-day range —
    * Spark's canonical stream-stream interval join (state on both sides
    * evicted by watermark + range bound).
    */
  def intervalJoinStream(spark: SparkSession, dir: String): DataFrame = {
    val orders = spark.readStream
      .schema(StructType(Seq(
        StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
        StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
        StructField("o_orderdate", TimestampNTZType), StructField("o_orderpriority", StringType))))
      .parquet(stagedPath(dir, "orders"))
      .select(col("o_orderkey"), col("o_orderdate").cast("timestamp").as("odate"))
      .withWatermark("odate", "1 second")
    val lines = spark.readStream
      .schema(StructType(Seq(
        StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
        StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
        StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
        StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
        StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
        StructField("l_shipdate", TimestampNTZType))))
      .parquet(stagedPath(dir, "lineitem"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate").cast("timestamp").as("sdate"))
      .withWatermark("sdate", "1 second")
    orders.join(lines,
        col("o_orderkey") === col("l_orderkey") &&
          col("sdate") >= col("odate") &&
          col("sdate") <= col("odate") + expr("INTERVAL 30 DAYS"))
      .select(col("o_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        unix_seconds(col("sdate")).as("ship_sec"))
  }

  /** Streaming exact dedup: watermark-bounded `dropDuplicates` on the
    * event id — the streaming form of `dedup_exact`. State holds one
    * entry per id seen within the watermark horizon and is evicted as
    * event time advances, so memory is bounded by the duplicate
    * arrival window, not the stream length — the property that makes
    * exact dedup feasible on an unbounded 100 TB/day stream.
    */
  def dedupStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"))

  /** Stream-static enrichment: the event stream joined to a static
    * dimension snapshot (customer→nation). The static side broadcasts
    * into every micro-batch — no stream-side state at all, the
    * standard shape for dimension enrichment at scale.
    */
  def enrichedStream(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = graft.sources.Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    eventsStream(spark, dir)
      .filter(col("event_type") === "click")
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name"))
  }

  /** Stream-static runtime-filter join (the 19th twin): the purchase
    * stream pre-filtered by the broadcast ≤4096-row bucket table
    * before the exact key join re-checks false positives — the same
    * bloom-prefilter shape `bloom_prefilter_join` proves in batch,
    * running stateless per micro-batch. At scale this is how a
    * high-volume stream joins a selective build side without shuffling
    * non-matching rows into the join at all.
    */
  def bloomPrefilterStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.WorkloadProfiling
    val build = WorkloadProfiling.errorUserBuild(
      graft.sources.Tables.events(spark, dir))
    WorkloadProfiling.bloomPrefilteredProbe(eventsStream(spark, dir), build)
      .select(col("event_id"), col("user_id"), col("value"))
  }

  /** Batch twin of [[bloomPrefilterStream]] — identical frames, static
    * probe. */
  def bloomPrefilterBatch(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.WorkloadProfiling
    val ev = graft.sources.Tables.events(spark, dir)
    WorkloadProfiling.bloomPrefilteredProbe(ev, WorkloadProfiling.errorUserBuild(ev))
      .select(col("event_id"), col("user_id"), col("value"))
  }

  /** Streaming twin of batch `sessionize`: per-user 30-minute-gap
    * session windows via `session_window` — merging window state keyed
    * by user, evicted once the watermark passes a session's close.
    * The batch query's gaps-and-islands oracle is the ground truth
    * (StreamingSpec asserts stream == batch).
    */
  def sessionizeStream(spark: SparkSession, dir: String): DataFrame = {
    // raw source, not eventsStream: the session clock is the floored
    // second column, and a stream allows exactly ONE watermark column
    rawEventsStream(spark, dir)
      .withColumn("tsec", date_trunc("second", col("ts")))
      .withWatermark("tsec", "1 second")
      .groupBy(session_window(col("tsec"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").cast("long").as("session_start"),
        col("session_window.end").cast("long").as("session_end"),
        col("n_events"))
  }

  // --------------------------------------------- continuous UV (W8/K2)
  final case class UvEventRow(wstart: Long, user_id: Long, ts: java.sql.Timestamp)
  final case class UvState(buckets: Array[Byte], uv: Long)
  final case class UvSnapshot(window_start: Long, uv_bloom: Long)

  /** Continuous per-window UV with the reference's Bloom semantics
    * (NF/app/UvWithBloom.scala:41-69): the reference fires per ELEMENT
    * — every event triggers a window evaluation that updates a Redis
    * Bloom bitmap and re-emits the running count. The Spark-native
    * equivalent is per MICRO-BATCH: per-window state holds the same
    * seed-61 Bloom bitmap (`BloomUv.bucket`), each batch folds its
    * events in, and a new running-count snapshot is emitted whenever
    * the count advances. Observable behavior converges to the batch
    * `q5_uv_bloom` per window (asserted in StreamingSpec); emission
    * granularity (element vs micro-batch) is the documented W8 delta.
    * State per window is the bitmap (`bits/8` bytes), not the visitor
    * set — bounded regardless of traffic.
    *
    * With `evict = true` (requires a watermark on `ts`) a finalized
    * window's bitmap is dropped once the watermark passes its end:
    * per-window state is bounded AND the window count is bounded by
    * the watermark horizon, so total state no longer grows with every
    * new hour on a long-running stream. `evict = false` keeps every
    * window's bitmap alive (fine for replays and un-watermarked
    * sources — the checkpoint-restart spec feeds one); that unbounded
    * window-count caveat is documented with the W8 delta in SURVEY §8.
    */
  def continuousUvBloom(events: DataFrame, bits: Int = 1 << 16,
      evict: Boolean = false): Dataset[UvSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeout =
      if (evict) GroupStateTimeout.EventTimeTimeout else GroupStateTimeout.NoTimeout
    events
      .filter(col("event_type") === "view")
      .select(window(col("ts"), "1 hour").getField("start").cast("long").as("wstart"),
        col("user_id"), col("ts"))
      .as[UvEventRow]
      .groupByKey(_.wstart)
      .flatMapGroupsWithState[UvState, UvSnapshot](OutputMode.Append, timeout) {
        (w: Long, it: Iterator[UvEventRow], state: GroupState[UvState]) =>
          if (evict && state.hasTimedOut) {
            // watermark passed the window end: the count is final and
            // already emitted; free the bitmap
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(UvState(new Array[Byte](bits / 8), 0L))
            val buf = st0.buckets
            var uv = st0.uv
            it.foreach { r =>
              val bit = graft.functions.BloomUv.bucket(r.user_id, bits)
              if ((buf(bit >>> 3) & (1 << (bit & 7))) == 0) {
                buf(bit >>> 3) = (buf(bit >>> 3) | (1 << (bit & 7))).toByte
                uv += 1
              }
            }
            state.update(UvState(buf, uv))
            if (evict)
              // fire at window end, clamped above the current watermark
              // (a timer at-or-below the watermark throws)
              state.setTimeoutTimestamp(
                math.max((w + 3600L) * 1000L, state.getCurrentWatermarkMs() + 1L))
            if (uv != st0.uv) Iterator.single(UvSnapshot(w, uv)) else Iterator.empty
          }
      }
  }

  /** Full streaming top-N chain (the reference's E1 pipeline,
    * SURVEY.md §3): windowed count aggregation in the stream, then
    * per-micro-batch rank-limit inside foreachBatch writing the
    * current top-K per window to `outPath` — the Spark-native form of
    * the reference's second keyed stage (TopNHotItems ListState+timer,
    * HI/app/HotItems.scala:82-134). Each batch overwrites with the
    * latest complete ranking; returns the final result read back.
    */
  /** Read back a foreachBatch-produced parquet directory; when no
    * micro-batch wrote output (empty source, no finalized window) the
    * directory has no parquet files and a plain read throws "Unable to
    * infer schema" — return an empty frame of the ranked shape
    * (`countsSchema` + the topK `rn` column) instead.
    */
  private def readRankedOrEmpty(spark: SparkSession, outPath: String,
      countsSchema: StructType): DataFrame =
    try spark.read.parquet(outPath)
    catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.toLowerCase.contains("schema") =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          countsSchema.add("rn", IntegerType, nullable = false))
    }

  def hotItemsTopN(spark: SparkSession, dir: String, k: Int, outPath: String): DataFrame =
    hotItemsTopNFrom(eventsStream(spark, dir), k, outPath)

  // ------------------------------------- graft-log connector (S1/S4/K3)
  /** Producer twin (KafkaProducer.scala:19-32): CSV-encode the events
    * table into a `graft-log` directory log through the connector's
    * BATCH_WRITE path. Tab-separated because `props` is JSON (contains
    * commas); `props` rides last so an embedded tab can't shift fields
    * (the reader splits with a field limit).
    */
  def loadEventsLog(spark: SparkSession, dir: String, logDir: String): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsLong = graft.sources.Tables.eventsTsIsLong(spark, dir)
    val raw = spark.read.schema(eventsRawSchemaFor(tsLong))
      .parquet(stagedPath(dir, "events"))
    // the log's wire format carries epoch-nanos, whatever the parquet
    // generation stored — consumers (eventsFromLog) depend only on it
    val nanos =
      if (tsLong) raw
      else raw.withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    nanos
      .select(concat(
        col("event_id"), lit("\t"), col("ts"), lit("\t"), col("user_id"),
        lit("\t"), col("event_type"), lit("\t"), col("value"), lit("\t"),
        col("props")).as("value"))
      .write.format("graft-log").option("path", logDir).mode("append").save()
  }

  /** Consumer twin (HotItems.scala:37-48): the events stream read back
    * THROUGH the offset-addressed connector — `readStream.format(
    * "graft-log")` — and decoded to the exact `eventsStream` shape, so
    * every downstream job runs unchanged against the log.
    */
  def eventsFromLog(spark: SparkSession, logDir: String,
      watermark: String = "1 second",
      maxRecordsPerTrigger: Option[Long] = None): DataFrame = {
    val reader = spark.readStream.format("graft-log").option("path", logDir)
    maxRecordsPerTrigger.foreach(n =>
      reader.option("maxRecordsPerTrigger", n.toString))
    reader.load()
      .select(split(col("value"), "\t", 6).as("f"))
      .select(
        col("f").getItem(0).cast("long").as("event_id"),
        timestamp_micros(floor(col("f").getItem(1).cast("long") / 1000L).cast("long")).as("ts"),
        col("f").getItem(2).cast("long").as("user_id"),
        col("f").getItem(3).as("event_type"),
        col("f").getItem(4).cast("double").as("value"),
        col("f").getItem(5).as("props"))
      .withWatermark("ts", watermark)
  }

  /** The reference's E1 chain end-to-end through the custom connector:
    * log-encoded events → graft-log micro-batch source → sliding-window
    * count → per-window top-N. Equals batch `q1_hot_items` when the log
    * holds the full table (GraftLogSpec).
    */
  def hotItemsTopNFromLog(spark: SparkSession, logDir: String, k: Int,
      outPath: String): DataFrame =
    hotItemsTopNFrom(eventsFromLog(spark, logDir), k, outPath)

  /** [[hotItemsTopN]] over a caller-supplied events stream. */
  def hotItemsTopNFrom(events: DataFrame, k: Int, outPath: String): DataFrame = {
    val spark = events.sparkSession
    val counts = hotItemCountsFrom(events)
    val q = counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.TopK.topK(batch, k,
            Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
          .write.mode("overwrite").parquet(outPath)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    readRankedOrEmpty(spark, outPath, counts.schema)
  }

  // ------------------------------------------- streaming ANN lookup
  /** Online near-dup alerts: incoming embeddings matched against a
    * static banded-LSH index of the corpus — a stream-static equi-join
    * on (band, signature), fused-dot cosine on the collisions, alert
    * above the threshold. Completely STATELESS on the stream side
    * (band signatures are per-row column work, the index broadcasts or
    * shuffles once), so throughput scales with executors and nothing
    * accumulates; this is the shape online dedup/similarity takes in
    * an ingestion pipeline at scale.
    */
  def neardupAlertStream(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    import graft.queries.SimilarityQueries._
    // capped static index: one hot (band, sig) bucket would otherwise
    // amplify every matching stream row by the bucket's full size; the
    // live mask keeps the multi-band dedup exact under the cap
    val index = bandKeyedCappedIndex(
      graft.sources.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")),
      "idx_id", "ei", "ni", "band_i", "sig_i", "sigs_i", "live_i")
    val incoming = spark.readStream
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)),
        StructField("label", IntegerType))))
      .parquet(stagedPath(dir, "embeddings"))
      .select(col("vec_id"), col("embedding"))
    bandKeyed(incoming, "in_id", "ev", "nv", "band_v", "sig_v", "sigs_v")
      .join(index,
        col("band_v") === col("band_i") && col("sig_v") === col("sig_i") &&
          col("in_id") =!= col("idx_id"))
      // a pair can collide in several bands; keeping only the first
      // band where they agree AND the index row is live is an exact
      // dedup as a stateless column filter. (A .distinct() here would
      // compile to StreamingDeduplicate — unbounded key state on an
      // unbounded stream.)
      .filter(firstLiveCollidingBand("sigs_v", "sigs_i", "live_i", "band_v"))
      .withColumn("simr", cosineCol("ev", "nv", "ei", "ni"))
      .filter(col("simr") >= threshold)
      .select(col("in_id"), col("idx_id"), col("simr"))
  }

  /** Batch twin of [[neardupAlertStream]] on the same frames. */
  def neardupAlertBatch(spark: SparkSession, dir: String, threshold: Double): DataFrame = {
    import graft.queries.SimilarityQueries._
    val v = graft.sources.Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val index = bandKeyedCappedIndex(v, "idx_id", "ei", "ni", "band_i", "sig_i", "sigs_i", "live_i")
    bandKeyed(v, "in_id", "ev", "nv", "band_v", "sig_v", "sigs_v")
      .join(index,
        col("band_v") === col("band_i") && col("sig_v") === col("sig_i") &&
          col("in_id") =!= col("idx_id"))
      .filter(firstLiveCollidingBand("sigs_v", "sigs_i", "live_i", "band_v"))
      .withColumn("simr", cosineCol("ev", "nv", "ei", "ni"))
      .filter(col("simr") >= threshold)
      .select(col("in_id"), col("idx_id"), col("simr"))
  }

  // -------------------------------- streaming MinHash dedup probe
  /** Online incremental dedup: incoming documents probed LIVE against
    * the standing corpus's MinHash index — the streaming form of the
    * batch `dedup_incremental` query. The per-doc signature is pure
    * COLUMN work ([[graft.queries.DedupQueries.minhashBandKeyed]]: an
    * array fold over the shingle set, min per universal-hash
    * permutation), so the stream side carries NO state; candidates
    * come from a stream-static equi-join on the packed band key
    * against the CAPPED index (oversized buckets skipped, the batch
    * tier's policy); multi-band collisions collapse via the same
    * stateless first-live-colliding-band filter as the ANN lookup (a
    * .distinct() would compile to StreamingDeduplicate — unbounded key
    * state);
    * and the exact-Jaccard verify is per-pair array intersection on
    * collided rows only. Emits every corpus match ≥ 0.5 — the rank-1
    * "best match" decoration is a per-batch window downstream
    * (foreachBatch), exactly as the batch query applies it.
    */
  def dedupProbeStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.DedupQueries.{minhashBandKeyed, minhashBandKeyedCappedIndex}
    val docsBatch = graft.sources.Tables.documents(spark, dir)
    val index = minhashBandKeyedCappedIndex(docsBatch.filter(col("doc_id") % 10 =!= 0),
      "idx_id", "shs_i", "c_i", "band_i", "bh_i", "bands_i", "live_i")
    val incoming = spark.readStream.schema(docsBatch.schema)
      .parquet(stagedPath(dir, "documents"))
      .filter(col("doc_id") % 10 === 0)
    dedupProbeJoin(
      minhashBandKeyed(incoming, "in_id", "shs_v", "c_v", "band_v", "bh_v", "bands_v"),
      index)
  }

  /** Batch twin of [[dedupProbeStream]] on the same frames. */
  def dedupProbeBatch(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.DedupQueries.{minhashBandKeyed, minhashBandKeyedCappedIndex}
    val docsBatch = graft.sources.Tables.documents(spark, dir)
    val index = minhashBandKeyedCappedIndex(docsBatch.filter(col("doc_id") % 10 =!= 0),
      "idx_id", "shs_i", "c_i", "band_i", "bh_i", "bands_i", "live_i")
    dedupProbeJoin(
      minhashBandKeyed(docsBatch.filter(col("doc_id") % 10 === 0),
        "in_id", "shs_v", "c_v", "band_v", "bh_v", "bands_v"),
      index)
  }

  private def dedupProbeJoin(probe: DataFrame, index: DataFrame): DataFrame =
    probe.join(index,
        col("band_v") === col("band_i") && col("bh_v") === col("bh_i"))
      // first band where the keys agree AND the index doc's bucket
      // survived the cap — exact multi-band dedup, stateless
      .filter(graft.queries.SimilarityQueries.firstLiveCollidingBand(
        "bands_v", "bands_i", "live_i", "band_v"))
      .withColumn("inter",
        size(array_intersect(col("shs_v"), col("shs_i"))).cast("long"))
      // QRound, not native round: jaccard is a rational-valued surface
      // (ROUND_AUDIT class U3) and the batch dedup registry rounds the
      // same ratio through QRound — one rule for the whole class
      .withColumn("jaccard", graft.queries.QRound.col(
        col("inter").cast("double") / (col("c_v") + col("c_i") - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("in_id"), col("idx_id").as("dup_of"), col("jaccard"))

  // --------------------------------- streaming dedup-verdicts (capstone)
  /** Streaming twin of the batch `dedup_verdicts` manifest: every
    * arriving document gets its keep/drop verdict the moment it lands,
    * under the same reason precedence (exact_dup > near_dup > quality).
    *
    *  - exact-dup: stream-static equi-join on the content hash against
    *    the standing corpus' canonical-per-hash table (one tiny join
    *    key per doc);
    *  - near-dup: the SAME banded MinHash probe `dedupProbeStream`
    *    runs — candidates ∝ batch size × collision rate, never corpus²;
    *  - quality: per-document column work (`qualityFilterOf`), batch-
    *    local by construction.
    *
    * The per-batch collapse to one row per doc (distinct + left join)
    * runs INSIDE foreachBatch — bounded by the micro-batch, no
    * streaming state anywhere. Over a full file replay the appended
    * verdicts equal the batch manifest row-for-row on the arrived
    * prefix (StreamingSpec, 18th twin).
    */
  def dedupVerdictsStream(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    import graft.queries.DedupQueries.{minhashBandKeyed, minhashBandKeyedCappedIndex}
    val docsBatch = graft.sources.Tables.documents(spark, dir)
    val canon = docsBatch.select(md5(col("text")).as("h"), col("doc_id"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("canon")).localCheckpoint()
    // capped index, same skip policy as the batch minhash tier — one
    // hot stop-signature bucket must not amplify every micro-batch
    val index = minhashBandKeyedCappedIndex(docsBatch,
      "idx_id", "shs_i", "c_i", "band_i", "bh_i", "bands_i", "live_i").localCheckpoint()
    val incoming = spark.readStream.schema(docsBatch.schema)
      .parquet(stagedPath(dir, "documents"))
    val q = incoming.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.localCheckpoint() // read by probe, quality, and verdict join
        val near = minhashBandKeyed(b, "in_id", "shs_v", "c_v", "band_v", "bh_v", "bands_v")
          .join(index,
            col("band_v") === col("band_i") && col("bh_v") === col("bh_i") &&
              col("idx_id") < col("in_id"))
          .filter(graft.queries.SimilarityQueries.firstLiveCollidingBand(
            "bands_v", "bands_i", "live_i", "band_v"))
          .withColumn("inter",
            size(array_intersect(col("shs_v"), col("shs_i"))).cast("long"))
          // unrounded, exactly minhashLsh's confirm filter
          .withColumn("jaccard",
            col("inter").cast("double") / (col("c_v") + col("c_i") - col("inter")))
          .filter(col("jaccard") >= 0.5)
          .select(col("in_id").as("doc_id")).distinct()
          .withColumn("is_near", lit(true))
        val qual = graft.queries.TextAnalytics.qualityFilterOf(b)
          .select(col("doc_id"), col("fail_reason"))
        b.select(col("doc_id"), md5(col("text")).as("h"))
          .join(canon, "h")
          .join(near, Seq("doc_id"), "left")
          .join(qual, Seq("doc_id"))
          .withColumn("reason",
            when(col("doc_id") =!= col("canon"), "exact_dup")
              .when(col("is_near"), "near_dup")
              .otherwise(col("fail_reason")))
          .select(col("doc_id"),
            when(col("reason") === "ok", "keep").otherwise("drop").as("verdict"),
            col("reason"))
          .write.mode("append").parquet(outPath)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(outPath)
  }

  // ------------------------------- streaming snapshot diff (ingest)
  /** Incremental corpus diff: the NEW snapshot arrives as a stream and
    * each document is classified against the standing release the
    * moment it lands — a stream-static LEFT join on doc_id with a
    * content-hash compare, completely stateless on the stream side
    * (the hash is per-row column work, the standing snapshot shuffles
    * once). Emits `added` / `changed` / `unchanged`; the `removed`
    * class is inherently an END-of-snapshot reconciliation (absence
    * can only be decided once the new snapshot is complete), so it
    * stays with the batch `corpus_diff` — the honest split between
    * what ingest can know per-row and what release close-out computes.
    * Snapshot-B rows derive in-stream from the same rules as the batch
    * query (clone fan-out via explode, never a second source read).
    */
  def snapshotDiffStream(spark: SparkSession, dir: String): DataFrame = {
    val docsBatch = graft.sources.Tables.documents(spark, dir)
    val incoming = spark.readStream.schema(docsBatch.schema)
      .parquet(stagedPath(dir, "documents"))
    snapshotDiffJoin(spark, dir, snapshotBOf(incoming))
  }

  /** Batch twin of [[snapshotDiffStream]] on the same frames. */
  def snapshotDiffBatch(spark: SparkSession, dir: String): DataFrame = {
    val docsBatch = graft.sources.Tables.documents(spark, dir)
    snapshotDiffJoin(spark, dir, snapshotBOf(docsBatch))
  }

  /** The derived snapshot-B frame (same rules as `corpus_diff`):
    * %11==3 removed, %11==5 revised, %11==7 cloned under a shifted id.
    * Works on static AND streaming frames — the clone fans out through
    * an explode over the row itself, so one source pass suffices.
    */
  private def snapshotBOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(array(
        struct(col("doc_id"), col("text"), lit(false).as("is_clone")),
        struct((col("doc_id") + 1000000L).as("doc_id"), col("text"),
          lit(true).as("is_clone")))).as("r"),
        pmod(col("doc_id"), lit(11)).as("m"))
      .filter((!col("r.is_clone") && col("m") =!= 3) ||
        (col("r.is_clone") && col("m") === 7))
      .select(col("r.doc_id").as("doc_id"),
        when(!col("r.is_clone") && col("m") === 5,
          concat(col("r.text"), lit(" rev2"))).otherwise(col("r.text")).as("text"))

  private def snapshotDiffJoin(spark: SparkSession, dir: String, snapB: DataFrame): DataFrame = {
    val standing = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("ha"))
    snapB.select(col("doc_id"), md5(col("text")).as("hb"))
      .join(standing, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("ha").isNull, "added")
          .when(col("ha") =!= col("hb"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Streaming hot-pages chain (the reference's E2 pipeline,
    * NetworkFlow top-5 URLs): negated-regex filter, 30m/5m sliding
    * counts in the stream, rank-limit per micro-batch in foreachBatch
    * — same shape as [[hotItemsTopN]] over the URL-style dimension.
    */
  def hotPagesTopN(spark: SparkSession, dir: String, k: Int, outPath: String): DataFrame = {
    val counts = eventsStream(spark, dir)
      .filter(!col("event_type").rlike("(error|signup)$"))
      .withColumn("item_id", graft.sources.Tables.itemIdFromProps(col("props")))
      .groupBy(window(col("ts"), "30 minutes", "5 minutes"), col("item_id"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("long").as("window_start"), col("item_id"), col("cnt"))
    val q = counts.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.TopK.topK(batch, k,
            Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
          .write.mode("overwrite").parquet(outPath)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    readRankedOrEmpty(spark, outPath, counts.schema)
  }

  /** Append-mode top-N over FINALIZED windows — the bounded-state form
    * of [[hotItemsTopN]] for unbounded streams: the windowed count
    * aggregation emits a window only once its end passes the
    * watermark, the rank-limit runs per finalized window inside
    * foreachBatch, and results land through the idempotent keyed
    * upsert. Aggregation state is bounded by the watermark horizon
    * (complete-mode output keeps every window alive forever — fine for
    * a replay, wrong for a 100 TB/day stream); the upsert makes
    * at-least-once redelivery safe. This is the deployment shape; the
    * complete-mode variant exists for latest-partial-ranking use.
    *
    * Watermark subtlety: the event-type filter is pushed BELOW the
    * EventTimeWatermark operator by the optimizer, so the watermark
    * tracks the max CLICK time — windows containing the stream's last
    * click stay open at shutdown (asserted in StreamingSpec).
    */
  def hotItemsTopNAppend(spark: SparkSession, dir: String, k: Int, outPath: String): DataFrame = {
    val counts = hotItemCounts(spark, dir)
    val q = counts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val ranked = graft.operators.TopK.topK(batch, k,
          Seq(col("window_start")), Seq(col("cnt").desc, col("item_id")))
        if (!ranked.isEmpty) graft.sinks.Sinks.upsertKeyed(ranked, outPath, "window_start")
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // empty-fallback column order differs from a partitioned read-back
    // (partition column last); callers select by name
    readRankedOrEmpty(spark, outPath, counts.schema)
  }

  // --------------------------------------------------- SCD2 intervals
  final case class Scd2Row(user_id: Long, ts: java.sql.Timestamp,
      event_id: Long, event_type: String)
  final case class Scd2State(run_id: Long, event_type: String,
      valid_from_us: Long, n_events: Long)
  final case class Scd2Interval(user_id: Long, run_id: Long, event_type: String,
      valid_from_us: Long, valid_to_us: Long, n_events: Long, is_current: Long)

  /** Streaming twin of batch `scd2_user_state`: per-user current-state
    * intervals maintained in GroupState and emitted the moment a type
    * change CLOSES them — the streaming history build where each closed
    * interval appends exactly once (the still-open run lives only in
    * state, the same contract as a warehouse's open SCD2 row).
    * State per user is one small case class, independent of history
    * length, so the operator's footprint is O(active users) at scale.
    * StreamingSpec asserts the closed-interval stream equals the batch
    * query's closed rows on the same data.
    */
  def scd2Stream(spark: SparkSession, dir: String): Dataset[Scd2Interval] =
    scd2Of(eventsStream(spark, dir))

  /** Core SCD2 operator over any watermarked (user_id, ts, event_id,
    * event_type) frame — split out so tests can drive it from a
    * multi-file source with real micro-batch boundaries.
    */
  def scd2Of(events: DataFrame): Dataset[Scd2Interval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[Scd2Row]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Interval](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Scd2Row], state: GroupState[Scd2State]) =>
          // epoch micros exactly as the batch query's unix_micros
          def us(t: java.sql.Timestamp): Long = tsUs(t)
          var st = state.getOption.orNull
          val out = Vector.newBuilder[Scd2Interval]
          // order by the full microsecond key (getTime is only ms — two
          // events in the same ms but different us must still order by
          // time, not event_id, to match the batch twin's unix_micros sort)
          for (r <- it.toSeq.sortBy(r => (us(r.ts), r.event_id))) {
            val tUs = us(r.ts)
            if (st == null)
              st = Scd2State(1L, r.event_type, tUs, 1L)
            else if (r.event_type == st.event_type)
              st = st.copy(n_events = st.n_events + 1L)
            else {
              out += Scd2Interval(uid, st.run_id, st.event_type,
                st.valid_from_us, tUs, st.n_events, 0L)
              st = Scd2State(st.run_id + 1L, r.event_type, tUs, 1L)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // -------------------------------------- streaming MV maintenance
  /** Streaming materialized-view maintenance: each micro-batch's
    * per-user partial aggregates (count / decimal sum / max) merge
    * into a keyed parquet state table through the idempotent dynamic-
    * partition upsert (`Sinks.upsertKeyed`) — the streaming form of
    * batch `incremental_agg_merge`, and the pattern that keeps a
    * 100 TB view fresh by touching ONLY the keys each batch delivers:
    * existing state is semi-joined to the batch's keys before the
    * merge, so untouched partitions are neither read in full nor
    * rewritten. The merged slice is checkpointed eagerly before the
    * write (reading and dynamically overwriting the same partitions
    * in one lazy job would self-clobber).
    *
    * Replay safety: foreachBatch is at-least-once, so a crash between
    * the upsert and the offset-log commit replays the batch. The
    * read-modify-write would then double-count — unless each merged key
    * carries the `last_batch` id that produced it. Dynamic-partition
    * overwrite commits per key-partition (old data survives an aborted
    * job), so on replay a key either (a) committed last time —
    * `last_batch == batchId`, its state already includes this batch's
    * partial, skip it — or (b) still holds pre-batch state — merge
    * normally. That makes the merge idempotent at key granularity, the
    * strongest guarantee a non-transactional file sink can give.
    *
    * State-path reads only treat *path-missing* as "no prior state"; a
    * genuine read failure (corrupt footer, transient FS error) must
    * fail the batch rather than silently reset the touched keys.
    */
  def aggMergeOf(events: DataFrame, statePath: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        aggMergeBatch(batch, statePath, batchId)
      }
      .trigger(Trigger.AvailableNow()).start()
  }

  /** One micro-batch of the MV merge — split out so the replay path is
    * directly testable: calling it twice with the same (batch, batchId)
    * must leave the state table unchanged on the second call.
    */
  def aggMergeBatch(batch: DataFrame, statePath: String, batchId: Long): Unit = {
    val s = batch.sparkSession
    val partialAll = batch
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("v")).cast("decimal(28,2)").as("sum_v"),
        max(col("ts_us")).as("last_ts_us"))
    val statePth = new org.apache.hadoop.fs.Path(statePath)
    val fs = statePth.getFileSystem(s.sparkContext.hadoopConfiguration)
    val existing =
      if (!fs.exists(statePth) || fs.listStatus(statePth).isEmpty) null
      else {
        val raw = s.read.parquet(statePath)
        // a state table written before the replay-guard existed has no
        // last_batch column — treat it as -1 (never matches a real
        // batchId) instead of failing every subsequent micro-batch.
        // NOTE: state and checkpoint must be deleted TOGETHER — resetting
        // only the checkpoint restarts batchId at 0, which would match
        // stale last_batch stamps and silently drop batch 0's partials.
        val lastBatch =
          if (raw.columns.contains("last_batch")) col("last_batch")
          else lit(-1L).as("last_batch")
        raw.select(col("user_id"), col("n_events"),
          col("sum_v").cast("decimal(28,2)").as("sum_v"), col("last_ts_us"),
          lastBatch)
      }
    val touched =
      if (existing == null) partialAll.withColumn("last_batch", lit(batchId))
      else {
        // keys whose partition already committed under THIS batchId
        // were merged by a previous (crashed) attempt — re-adding
        // their partials would double-count, so drop them entirely
        // (their on-disk state is already final for this batch)
        val applied = existing
          .filter(col("last_batch") === batchId).select(col("user_id"))
        val partial = partialAll.join(applied, Seq("user_id"), "left_anti")
        existing.drop("last_batch")
          .join(partial.select(col("user_id")), Seq("user_id"), "left_semi")
          .unionByName(partial)
          .groupBy(col("user_id"))
          .agg(sum(col("n_events")).as("n_events"),
            sum(col("sum_v")).cast("decimal(28,2)").as("sum_v"),
            max(col("last_ts_us")).as("last_ts_us"))
          .withColumn("last_batch", lit(batchId))
      }
    graft.sinks.Sinks.upsertKeyed(touched.localCheckpoint(), statePath, "user_id")
    ()
  }

  /** Run a streaming DataFrame to completion into an in-memory table
    * (AvailableNow file replay) and return the materialized result.
    */
  def runToMemory(df: DataFrame, name: String, mode: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }
}
