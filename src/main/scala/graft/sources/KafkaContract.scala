package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The Kafka source/sink contract, pinned independently of the
  * connector jar (absent from this image — `spark-sql-kafka` is not in
  * /opt/spark/jars and the build resolves offline).
  *
  * The reference's canonical ingest is a Kafka consumer feeding the
  * behavior jobs (DW-Flink HotItemsAnalysis app/HotItems.scala:37-48:
  * subscribe → value-as-string → parse). This object carries the two
  * halves a connector drop-in needs proven:
  *
  *  - [[wireSchema]] / [[fromKafka]]: the fixed 7-column frame every
  *    Kafka read produces, and the value-cast projection the jobs
  *    apply. `fromKafka` is unit-tested against a static frame with
  *    the wire schema, so the downstream plan is known-good before a
  *    broker ever exists.
  *  - [[source]]: the actual `readStream.format("kafka")` wiring
  *    (server/subscribe/offset options). Without the connector the
  *    DataSource lookup throws — the spec asserts THAT failure mode,
  *    which proves the plan reaches connector resolution with the
  *    right format name and nothing else missing.
  */
object KafkaContract {

  /** The fixed schema `format("kafka")` sources produce (Structured
    * Streaming Kafka integration contract).
    */
  val wireSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The projection every consuming job applies to the wire frame:
    * UTF-8 value, event timestamp, and the (topic, partition, offset)
    * coordinates that make reprocessing idempotent.
    */
  def fromKafka(wire: DataFrame): DataFrame =
    wire.selectExpr(
      "CAST(value AS STRING) AS line",
      "timestamp AS kafka_ts",
      "topic", "partition", "offset")

  /** Streaming Kafka source plan: earliest-offset subscription plus
    * [[fromKafka]]. Requires the connector jar on the classpath.
    */
  def source(spark: SparkSession, servers: String, topic: String): DataFrame =
    fromKafka(spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load())

  /** Batch producer/loader (the reference's KafkaProducer data loader,
    * DW-Flink HotItemsAnalysis app/KafkaProducer.scala:19-32: read a
    * file, write each line to the topic): any frame, JSON-encoded into
    * the value column, written with the batch kafka sink. Requires the
    * connector jar.
    */
  def load(df: DataFrame, servers: String, topic: String): Unit =
    df.selectExpr("CAST(null AS STRING) AS key", "to_json(struct(*)) AS value")
      .write.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("topic", topic)
      .save()
}
