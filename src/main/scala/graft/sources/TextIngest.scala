package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest for the reference's raw text formats (FIXTURES.md §1-§6):
  * fixed-schema CSV beans and the Apache access-log line format. The
  * reference parses with `line.split(",")` + positional casts and
  * throws on malformed rows (SURVEY.md §1.2); here parsing is the
  * engine's job — explicit StructType (no inference nondeterminism),
  * PERMISSIVE mode with a corrupt-record column, and malformed rows
  * split off as a side channel instead of killing the job.
  */
object TextIngest {

  /** UserBehavior: userId,itemId,categoryId,behavior,ts(sec) —
    * reference bean HI/bean/UserBehavior.scala:15-19.
    */
  val userBehaviorSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("item_id", LongType),
    StructField("category_id", IntegerType),
    StructField("behavior", StringType),
    StructField("ts_sec", LongType),
    StructField("_corrupt", StringType)))

  /** AdClickLog: userId,adId,province,city,ts — MA/bean/AdClickLog.scala:15-19. */
  val adClickSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ad_id", LongType),
    StructField("province", StringType),
    StructField("city", StringType),
    StructField("ts_sec", LongType),
    StructField("_corrupt", StringType)))

  /** LoginEvent: userId,ip,status,ts — LF/bean/LoginEvent.scala:13-16. */
  val loginSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("ip", StringType),
    StructField("status", StringType),
    StructField("ts_sec", LongType),
    StructField("_corrupt", StringType)))

  /** OrderEvent: orderId,eventType,txId,ts — OT/bean/OrderEventWithTxId.scala:9-12. */
  val orderSchema: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("event_type", StringType),
    StructField("tx_id", StringType),
    StructField("ts_sec", LongType),
    StructField("_corrupt", StringType)))

  /** ReceiptEvent: txId,payChannel,ts — OT/bean/ReceiptEvent.scala:10-12. */
  val receiptSchema: StructType = StructType(Seq(
    StructField("tx_id", StringType),
    StructField("pay_channel", StringType),
    StructField("ts_sec", LongType),
    StructField("_corrupt", StringType)))

  /** Read a headerless CSV with one of the schemas above; returns only
    * well-formed rows, with an event-time TimestampType column derived
    * from the epoch-seconds field. Malformed rows are dropped here —
    * use [[readCsvWithRejects]] when the reject channel matters.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readCsvWithRejects(spark, path, schema)._1

  /** Same, but also returns the reject side-channel (raw corrupt
    * lines) — the production-grade answer to the reference's
    * parse-or-crash (a bad row at TB scale must not kill the job).
    */
  def readCsvWithRejects(spark: SparkSession, path: String, schema: StructType): (DataFrame, DataFrame) = {
    // parse via from_csv over raw text lines rather than the csv
    // datasource: the datasource's _corrupt column interacts with
    // column pruning (filtering on it without caching silently
    // mis-classifies rows), while from_csv evaluates the whole struct
    // including _corrupt in one expression — reliable with no
    // session-lifetime cache pinned per ingest call
    val opts = Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> "_corrupt")
    val raw = spark.read.text(path)
      .select(from_csv(col("value"), schema, opts).as("r"))
      .select(col("r.*"))
    val good = raw.filter(col("_corrupt").isNull)
      .drop("_corrupt")
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      // a row whose epoch failed to parse is also malformed
      .filter(col("ts").isNotNull)
    val bad = raw.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw_line"))
    (good, bad)
  }

  /** Apache access-log line: `ip - userId dd/MM/yyyy:HH:mm:ss +0000
    * METHOD url` (reference parse at NF/app/NetworkFlow.scala:38-43,
    * space-split positions 0,2,3,5,6). One regexp_extract pass —
    * codegen'd, no UDF, malformed lines yield nulls and are filtered.
    */
  def readApacheLog(spark: SparkSession, path: String): DataFrame = {
    val pat = "^(\\S+) \\S+ (\\S+) (\\d{2}/\\d{2}/\\d{4}:\\d{2}:\\d{2}:\\d{2}) (?:\\S+ )?(\\S+) (\\S+)$"
    spark.read.text(path)
      .select(
        regexp_extract(col("value"), pat, 1).as("ip"),
        regexp_extract(col("value"), pat, 2).as("user_id"),
        try_to_timestamp(regexp_extract(col("value"), pat, 3),
          lit("dd/MM/yyyy:HH:mm:ss")).as("ts"),
        regexp_extract(col("value"), pat, 4).as("method"),
        regexp_extract(col("value"), pat, 5).as("url"))
      .filter(col("ts").isNotNull && col("url") =!= "")
  }

  /** The reference's static-resource filter (NF/app/NetworkFlow.scala:
    * 49-52): negation pushed into a plain rlike predicate.
    */
  def dropStaticResources(df: DataFrame): DataFrame =
    df.filter(!col("url").rlike("\\.(css|js)$"))

  /** JSON-lines ingest with the same contract as the CSV readers:
    * explicit schema (never inference — at TB scale an inference pass
    * is a second full read and a nondeterminism source), PERMISSIVE
    * `from_json` over raw text so corrupt lines land in a reject
    * side-channel instead of killing the job. Rounds out the raw
    * source matrix (CSV / access-log / JSON lines / parquet / Kafka /
    * rate). `from_json` leaves every field null on corrupt input (no
    * _corrupt interaction with pruning), so "all schema fields null
    * but line non-empty" is the reject predicate.
    */
  def readJsonLinesWithRejects(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val raw = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"), from_json(col("value"), schema).as("r"))
    val allNull = schema.fieldNames.map(f => col(s"r.$f").isNull).reduce(_ && _)
    val good = raw.filter(!allNull).select(col("r.*"))
    val bad = raw.filter(allNull).select(col("value").as("raw_line"))
    (good, bad)
  }
}
