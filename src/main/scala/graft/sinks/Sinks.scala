package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sink tier (SURVEY.md §2.10) plus side-output splitting.
  *
  * The reference fans results out with Flink `OutputTag` side outputs
  * (e.g. blacklist warnings at MA/app/AdStatisticByGeo.scala:41-42,
  * order timeouts at OT/app/OrderTimeoutWithoutCep.scala:33-34). Spark
  * has no per-operator side channel; the engine's pattern is a tagged
  * union — operators emit rows with a `tag` column, and the splitter
  * fans them out inside one `foreachBatch` so the upstream plan runs
  * once per micro-batch, not once per sink.
  */
object Sinks {

  def console(df: DataFrame, mode: String): StreamingQuery =
    df.writeStream.format("console").outputMode(mode)
      .trigger(Trigger.AvailableNow()).start()

  def parquetStream(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

  /** Kafka sink plan (requires the kafka connector on the runtime
    * classpath; structure per the reference's commented sink at
    * UBA/HotItemsAnalysis/.../HotItems.scala:70).
    */
  def kafkaStream(df: DataFrame, servers: String, topic: String, checkpoint: String): StreamingQuery =
    df.selectExpr("CAST(null AS STRING) AS key", "to_json(struct(*)) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

  /** Idempotent keyed upsert into a parquet directory partitioned by
    * `keyCol` — the engine's stand-in for the reference's
    * Redis-bitmap externalization (NF/app/UvWithBloom.scala:75-93:
    * foreachBatch + keyed upsert to a KV store). Dynamic partition
    * overwrite replaces exactly the keys present in `batch` and leaves
    * every other key untouched, so replaying a delivered batch (the
    * at-least-once case) reproduces the same final state — the
    * property that makes the sink exactly-once in effect.
    */
  def upsertKeyed(batch: DataFrame, path: String, keyCol: String): Unit =
    // per-write option, NOT the session conf: mutating
    // spark.sql.sources.partitionOverwriteMode around the write races
    // with concurrent writers in the same session (a clobbered restore
    // silently turns an upsert into a full-table overwrite)
    batch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(keyCol).parquet(path)

  /** Streaming form of [[upsertKeyed]]: one upsert per micro-batch.
    * Checkpointed like every other durable sink in this file — a
    * restart resumes from the last committed offset instead of
    * replaying the whole source (the replay would be *correct* because
    * the upsert is idempotent, but at 100 TB it is not acceptable).
    */
  def upsertStream(df: DataFrame, path: String, keyCol: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertKeyed(batch, path, keyCol)
      }
      .trigger(Trigger.AvailableNow()).start()

  /** Batch side-output split: one pass over a cached tagged union, one
    * writer call per tag. Returns rows-not-matching-any-tag so callers
    * can assert the union is total.
    */
  def splitByTag(df: DataFrame, tagCol: String, tags: Seq[String])(
      write: (String, DataFrame) => Unit): Long = {
    val cached = df.cache()
    try {
      tags.foreach(t => write(t, cached.filter(col(tagCol) === t).drop(tagCol)))
      // NULL tags must count as unmatched (isin on NULL yields NULL,
      // which a bare negation would silently drop)
      cached.filter(!coalesce(col(tagCol).isin(tags: _*), lit(false))).count()
    } finally { cached.unpersist() }
  }

  /** Streaming side-output split: tagged union → per-tag sinks inside
    * one foreachBatch (single upstream execution per micro-batch).
    */
  def splitStreamByTag(df: DataFrame, tagCol: String, tags: Seq[String])(
      write: (String, DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val cached = batch.cache()
        try tags.foreach(t => write(t, cached.filter(col(tagCol) === t).drop(tagCol), batchId))
        finally cached.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
}
