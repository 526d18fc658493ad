package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.StreamingJobs

/** 100 TB state posture: the streaming twins re-run under the RocksDB
  * state-store provider — where production state actually lives once it
  * outgrows the default in-memory HDFS-backed store — with the same
  * stream==batch assertions as StreamingSpec, plus an explicit
  * checkpoint-RESTART: a second query resuming the first one's RocksDB
  * checkpoint must close the SCD2 runs the first query left open, which
  * only works if per-key state round-trips through RocksDB snapshot +
  * restore. Every test also asserts the provider really engaged (the
  * progress metrics grow rocksdb-prefixed custom metrics) so a conf
  * typo can't silently fall back to the default store.
  */
class RocksDbStateSpec extends AnyFunSuite {
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

  private def assertRocksDbEngaged(q: StreamingQuery): Unit = {
    val ops = Option(q.lastProgress).map(_.stateOperators.toSeq).getOrElse(Seq.empty)
    assert(ops.nonEmpty, "expected a stateful operator in the progress")
    val keys = ops.flatMap(op =>
      scala.jdk.CollectionConverters.MapHasAsScala(op.customMetrics).asScala.keys)
    assert(keys.exists(_.toLowerCase.contains("rocksdb")),
      s"RocksDB provider did not engage; state metrics: $keys")
  }

  private def stageHalves(prefix: String): (java.nio.file.Path, DataFrame, Double) = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val ev = graft.sources.Tables.events(spark, sf)
    val cutSec = ev.selectExpr("percentile(CAST(ts AS LONG), 0.5)").first().getDouble(0)
    val staged = Files.createTempDirectory(prefix)
    def stageHalf(df: DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory(s"$prefix-half").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, name), StandardCopyOption.REPLACE_EXISTING)
    }
    stageHalf(ev.filter(expr(s"CAST(ts AS LONG) <= $cutSec")), "00.parquet")
    // the second half is staged by the caller AFTER the first query
    // finishes (the restart scenario) or immediately (plain 2-batch)
    (staged, ev, cutSec)
  }

  test("RocksDB: SCD2 checkpoint-restart — run 2 closes runs run 1 left open in RocksDB state") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    withRocksDb {
      val (staged, ev, cutSec) = stageHalves("graft-rdb-scd2")
      val cp = Files.createTempDirectory("graft-rdb-scd2-cp").toString
      // memory sink cannot recover a checkpoint; the restart semantics
      // need a durable sink, so the intervals append to parquet
      val sink = Files.createTempDirectory("graft-rdb-scd2-sink").toString
      def runOnce(): Unit = {
        val src = spark.readStream
          .schema(ev.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(staged.toString)
          .withWatermark("ts", "1 second")
        val q = StreamingJobs.scd2Of(src).toDF().writeStream
          .format("parquet")
          .option("path", sink)
          .outputMode("append")
          .option("checkpointLocation", cp)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        assertRocksDbEngaged(q)
      }
      runOnce()
      val n1 = spark.read.parquet(sink).count()
      // restart: the new file arrives AFTER the first query terminated;
      // the second query must resume from the RocksDB checkpoint (open
      // runs restored) and only then read the new file
      val tmp = Files.createTempDirectory("graft-rdb-scd2-l8").toString
      ev.filter(expr(s"CAST(ts AS LONG) > $cutSec")).coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.copy(part.toPath, Paths.get(staged.toString, "01.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      runOnce()
      val union = spark.read.parquet(sink)
      val batch = SparkEntry.queries("scd2_user_state")(spark, sf)
        .filter(col("valid_to_us").isNotNull)
        .select("user_id", "run_id", "event_type", "valid_from_us",
          "valid_to_us", "n_events", "is_current")
      assert(sortedRows(union.select("user_id", "run_id", "event_type",
        "valid_from_us", "valid_to_us", "n_events", "is_current")) ==
        sortedRows(batch),
        "restarted query must continue exactly where RocksDB state left off")
      // cross-restart correctness is only meaningful if some run spans
      // the restart: intervals must close (append) in run 2 as well
      assert(union.count() > n1, "second run must emit the intervals closed after restart")
    }
  }

  test("RocksDB: funnel flatMapGroupsWithState twin converges to batch funnel_analysis") {
    withRocksDb {
      val q = StreamingJobs.funnelStream(spark, sf).toDF().writeStream
        .format("memory").queryName("funnel_rdb")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assertRocksDbEngaged(q)
      val stream = spark.table("funnel_rdb")
      val furthest = stream
        .withColumn("score",
          when(col("t_purchase").isNotNull, 3).when(col("t_click").isNotNull, 2)
            .when(col("t_view").isNotNull, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(max(struct(col("score"), col("t_view"), col("t_click"),
          col("t_purchase"), col("stage"))).as("s"))
        .select(col("user_id"), col("s.t_view").as("t_view"), col("s.t_click").as("t_click"),
          col("s.t_purchase").as("t_purchase"), col("s.stage").as("stage"))
      val batch = SparkEntry.queries("funnel_analysis")(spark, sf)
      assert(sortedRows(furthest) ==
        sortedRows(batch.select("user_id", "t_view", "t_click", "t_purchase", "stage")))
    }
  }

  test("RocksDB: sliding-window agg twin equals batch q6_marketing_by_channel") {
    withRocksDb {
      val q = StreamingJobs.marketingByChannel(spark, sf).writeStream
        .format("memory").queryName("mkt_rdb")
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assertRocksDbEngaged(q)
      val batch = SparkEntry.queries("q6_marketing_by_channel")(spark, sf)
      assert(sortedRows(spark.table("mkt_rdb")) == sortedRows(batch))
    }
  }
}
