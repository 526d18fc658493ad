package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sinks.Sinks
import graft.sources.{Generators, TextIngest}

/** CLI drive of the ingest + sink tier: CSV parse with reject channel,
  * Apache-log parse, live rate-source generator, and streaming
  * side-output splitting. Usage: runMain graft.IngestDemo
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- CSV with malformed rows
    val csv = Files.createTempFile("demo", ".csv")
    Files.writeString(csv,
      "543462,1715,1464116,pv,1511658000\n662867,2244074,1575622,buy,1511658060\nbroken,row\n")
    val (good, bad) = TextIngest.readCsvWithRejects(spark, csv.toString, TextIngest.userBehaviorSchema)
    println(s"[ingest-demo] csv: good=${good.count()} rejects=${bad.count()}")

    // --- empty file edge
    val empty = Files.createTempFile("demo-empty", ".csv")
    val (g2, b2) = TextIngest.readCsvWithRejects(spark, empty.toString, TextIngest.userBehaviorSchema)
    println(s"[ingest-demo] empty csv: good=${g2.count()} rejects=${b2.count()}")

    // --- Apache log
    val log = Files.createTempFile("demo", ".log")
    Files.writeString(log,
      "83.149.9.216 - - 17/05/2015:10:05:03 +0000 GET /a.png\n" +
      "10.0.0.1 - - 17/05/2015:10:05:04 +0000 GET /styles/main.css\nnot a log line\n")
    val parsed = TextIngest.readApacheLog(spark, log.toString)
    println(s"[ingest-demo] log: parsed=${parsed.count()} " +
      s"after_static_filter=${TextIngest.dropStaticResources(parsed).count()}")

    // --- live rate-source generator (real streaming, short run)
    val gen = Generators.marketingStream(spark, rowsPerSecond = 500)
    val q = gen.writeStream.format("memory").queryName("gen_demo").outputMode("append").start()
    Thread.sleep(2500); q.processAllAvailable(); q.stop()
    val got = spark.table("gen_demo")
    println(s"[ingest-demo] rate generator: rows=${got.count()} " +
      s"behaviors=${got.select("behavior").distinct().count()} " +
      s"channels=${got.select("channel").distinct().count()}")

    // --- streaming side-output split over the generated stream's tagged union
    val tagged = graft.streaming.StreamingJobs.eventsStream(spark, "/root/testdata/sf0.001")
      .select(col("event_id"),
        when(col("event_type") === "error", "warn").otherwise("ok").as("tag"))
    var counts = scala.collection.mutable.Map("ok" -> 0L, "warn" -> 0L)
    val sq = Sinks.splitStreamByTag(tagged, "tag", Seq("ok", "warn")) {
      (tag, df, _) => counts(tag) += df.count()
    }
    sq.awaitTermination()
    println(s"[ingest-demo] stream split: ok=${counts("ok")} warn=${counts("warn")} " +
      s"total=${counts.values.sum}")
    spark.stop()
  }
}
