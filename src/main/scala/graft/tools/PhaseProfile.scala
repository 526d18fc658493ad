package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round attribution profiler (guide §1/§7.3): for each
  * named registry query, splits wall time into
  *   build  — DataFrame construction (query code + analysis on access),
  *   plan   — optimize + physical planning + first codegen
  *            (forcing `executedPlan`),
  *   exec   — the noop-sink write (job scheduling + task execution),
  * and counts Spark jobs + stages the execution ran. High build/plan
  * with low exec = driver-bound (Catalyst/codegen); many jobs = eager
  * materializations (localCheckpoint / AQE rounds); exec >> cpu/cores =
  * stage-latency-bound (too many sequential stage barriers for the
  * data volume).
  *
  * Local tooling only — committed artifacts come from Bench.
  * Usage: runMain graft.tools.PhaseProfile <sfDir> <query> [query ...]
  */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = if (args.tail.nonEmpty) args.tail.toSeq
                else graft.SparkEntry.all.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap
    val meter = new CpuMeter(spark)
    // passes mirror the bench: Memo reset at PASS boundaries only, so
    // shared builds land on their registered first consumer exactly as
    // they do in the committed numbers; report the LAST pass (JIT-warm).
    val passes = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    println(f"${"query"}%-28s pass ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"cpu"}%7s jobs stages")
    (1 to passes).foreach { p =>
      graft.queries.Memo.reset()
      names.foreach { n =>
        val t0 = System.nanoTime()
        val df = byName(n).run(spark, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        jobs.set(0); stages.set(0)
        val cpu0 = meter.snapshot()
        df.write.mode("overwrite").format("noop").save()
        val t3 = System.nanoTime()
        val cpu = meter.snapshot() - cpu0
        // listener events are async; give the bus a beat to drain
        Thread.sleep(50)
        println(f"$n%-28s  $p   ${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f ${(t3 - t2) / 1e9}%7.3f $cpu%7.2f ${jobs.get}%4d ${stages.get}%5d")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
