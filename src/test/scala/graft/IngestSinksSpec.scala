package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Joins
import graft.sinks.Sinks
import graft.sources.{Generators, Tables, TextIngest}

/** Ingest (CSV/log parsing, generator source), sinks (side-output
  * splitting), and skew-join helpers.
  */
class IngestSinksSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def tmpFile(lines: Seq[String], suffix: String): String = {
    val f = Files.createTempFile("graft-ingest", suffix)
    Files.writeString(f, lines.mkString("\n"))
    f.toString
  }

  test("UserBehavior CSV parses; malformed rows go to the reject channel") {
    val path = tmpFile(Seq(
      "543462,1715,1464116,pv,1511658000",
      "662867,2244074,1575622,buy,1511658060",
      "this,is,not,a,row,at,all,extra",
      "843624,NOTANUMBER,2520377,cart,1511658120"), ".csv")
    val (good, bad) = TextIngest.readCsvWithRejects(spark, path, TextIngest.userBehaviorSchema)
    assert(good.count() == 2)
    assert(bad.count() == 2)
    val first = good.orderBy("ts_sec").first()
    assert(first.getAs[Long]("user_id") == 543462L)
    assert(first.getAs[String]("behavior") == "pv")
    assert(good.schema("ts").dataType.typeName == "timestamp")
  }

  test("JSON-lines ingest parses with explicit schema; corrupt lines rejected") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts_sec", LongType)))
    val path = tmpFile(Seq(
      """{"user_id": 7, "event_type": "view", "ts_sec": 1511658000}""",
      """{"user_id": 8, "event_type": "click", "ts_sec": 1511658060}""",
      """not json at all""",
      """{"broken": true}"""), ".jsonl")
    val (good, bad) = TextIngest.readJsonLinesWithRejects(spark, path, schema)
    assert(good.count() == 2)
    assert(bad.count() == 2)
    val first = good.orderBy("ts_sec").first()
    assert(first.getAs[Long]("user_id") == 7L)
    assert(first.getAs[String]("event_type") == "view")
  }

  test("Apache log lines parse; static resources filter out") {
    val path = tmpFile(Seq(
      "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /presentations/kibana-search.png",
      "83.149.9.216 - - 17/05/2015:10:05:04 +0000 GET /styles/main.css",
      "83.149.9.216 - - 17/05/2015:10:05:05 +0000 GET /scripts/app.js",
      "24.236.252.67 - - 17/05/2015:10:05:40 +0000 GET /favicon.ico",
      "garbage line without structure"), ".log")
    val parsed = TextIngest.readApacheLog(spark, path)
    assert(parsed.count() == 4, "malformed line dropped")
    val kept = TextIngest.dropStaticResources(parsed)
    assert(kept.count() == 2, ".css/.js filtered")
    assert(kept.filter(col("url").rlike("\\.(css|js)$")).isEmpty)
    assert(parsed.schema("ts").dataType.typeName == "timestamp")
  }

  test("marketing generator: deterministic domains incl. DOWNLOWD fidelity typo") {
    val df = Generators.marketingBatch(spark, 100, 1600000000L, 10).cache()
    assert(df.count() == 100)
    val behaviors = df.select("behavior").distinct().collect().map(_.getString(0)).toSet
    assert(behaviors == Generators.Behaviors.toSet)
    assert(behaviors.contains("DOWNLOWD"))
    val channels = df.select("channel").distinct().collect().map(_.getString(0)).toSet
    assert(channels == Generators.Channels.toSet)
    // deterministic: same call twice gives identical rows
    val again = Generators.marketingBatch(spark, 100, 1600000000L, 10)
    assert(df.exceptAll(again).isEmpty)
  }

  test("splitByTag fans a tagged union into disjoint sinks, total") {
    val tagged = Tables.events(spark, sf)
      .select(col("event_id"),
        when(col("event_type") === "error", "warn").otherwise("ok").as("tag"))
    var sizes = Map.empty[String, Long]
    val unmatched = Sinks.splitByTag(tagged, "tag", Seq("ok", "warn")) {
      (tag, df) => sizes += tag -> df.count()
    }
    assert(unmatched == 0)
    assert(sizes("ok") + sizes("warn") == Tables.events(spark, sf).count())
    assert(sizes("warn") > 0)
  }

  test("kafka contract: wire projection is correct; plan wiring reaches connector resolution") {
    import graft.sources.KafkaContract
    import org.apache.spark.sql.Row
    import java.sql.Timestamp
    // 1. the value-cast projection against a static frame with the
    // exact wire schema — the downstream plan a connector drop-in runs
    val wire = spark.createDataFrame(
      java.util.List.of(
        Row("k1".getBytes("UTF-8"), """{"id":7}""".getBytes("UTF-8"),
          "behavior", Int.box(0), Long.box(42L), Timestamp.valueOf("2024-01-01 10:00:00"), Int.box(0)),
        Row(null, "plain".getBytes("UTF-8"),
          "behavior", Int.box(1), Long.box(43L), Timestamp.valueOf("2024-01-01 10:00:01"), Int.box(0))),
      KafkaContract.wireSchema)
    val out = KafkaContract.fromKafka(wire)
    assert(out.columns.toSeq == Seq("line", "kafka_ts", "topic", "partition", "offset"))
    val rows = out.orderBy("offset").collect()
    assert(rows(0).getString(0) == """{"id":7}""" && rows(1).getString(0) == "plain")
    assert(rows(0).getLong(4) == 42L && rows(0).getString(2) == "behavior")

    // 2. the source plan reaches DataSource resolution with the right
    // format name: without the connector jar (absent from this image)
    // that resolution is exactly what fails — anything else failing
    // first (option validation, schema) would surface differently
    val readErr = intercept[Exception] {
      KafkaContract.source(spark, "localhost:9092", "behavior").schema
    }
    assert(readErr.getMessage.toLowerCase.contains("kafka"), readErr.getMessage)

    // 3. same for the writer plan in Sinks.kafkaStream
    val writeErr = intercept[Exception] {
      Sinks.kafkaStream(
        spark.readStream.format("rate").option("rowsPerSecond", "1").load(),
        "localhost:9092", "out_topic",
        Files.createTempDirectory("graft-kafka-ckpt").toString)
    }
    assert(writeErr.getMessage.toLowerCase.contains("kafka"), writeErr.getMessage)

    // 4. and the batch producer/loader path (S4)
    val loadErr = intercept[Exception] {
      KafkaContract.load(Tables.events(spark, sf).limit(1), "localhost:9092", "behavior")
    }
    assert(loadErr.getMessage.toLowerCase.contains("kafka"), loadErr.getMessage)
  }

  test("ORC source/sink roundtrip: schema and rows survive, predicates push down") {
    import org.apache.spark.sql.functions._
    val src = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val path = java.nio.file.Files.createTempDirectory("graft-orc").toString
    src.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
    // the filter must reach the ORC scan as a pushed predicate
    val filtered = back.filter(col("event_type") === "purchase")
    val scan = filtered.queryExecution.executedPlan.toString()
    assert(scan.contains("PushedFilters") && scan.contains("event_type"),
      s"ORC scan must carry pushed filters:\n$scan")
  }

  test("salted join equals plain join") {
    val ev = Tables.events(spark, sf)
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      .select(col("event_id"), col("c_nationkey"))
    val salted = Joins.saltedJoin(ev, cust, col("user_id"), col("c_custkey"), 8)
      .select(col("event_id"), col("c_nationkey"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("bloom UV tracks exact UV at low cardinality") {
    val bloom = SparkEntry.queries("q5_uv_bloom")(spark, sf)
    val exact = SparkEntry.queries("q4_uv_hourly")(spark, sf)
    val joined = exact.join(bloom, "window_start")
    // single-hash bitmap can only undercount, and barely at |U| << bits
    val bad = joined.filter(col("uv_bloom") > col("uv") ||
      col("uv_bloom") < col("uv") * 0.9)
    assert(bad.isEmpty)
  }
}
