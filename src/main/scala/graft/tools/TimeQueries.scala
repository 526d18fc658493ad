package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer for optimization iterations: runs the
  * named registry queries against a corpus dir (generating the sf1
  * probe corpus there first if absent) and prints per-query wall time
  * over `SPARK_GRAFT_REPS` runs (default 1). Local tooling only — the
  * committed artifacts come from ScaleProbe/Bench.
  *
  * Usage: runMain graft.tools.TimeQueries <dir> <query> [query ...]
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-time-queries")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$dir/documents.parquet").exists()) {
      ScaleProbe.generate(spark, dir, nDocs = 50000L, nVecs = 20000L,
        nEvents = 1000000L)
      ScaleProbe.linkRelational(dir)
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val i = sc.stageInfo
          val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s)
            .getOrElse(-1L)
          stages.add((i.stageId, i.name.takeWhile(_ != '\n'), ms, i.numTasks))
        }
      })
    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap
    val meter = new CpuMeter(spark)
    names.foreach { n =>
      val q = byName(n)
      (1 to reps).foreach { r =>
        stages.clear()
        val cpu0 = meter.snapshot()
        val t0 = System.nanoTime()
        val rows = q.run(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val cpu = meter.snapshot() - cpu0
        println(f"[time] $n%-32s rep$r rows=$rows%10d  $sec%7.2f s  cpu=$cpu%8.1f s")
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._3).take(8).foreach { case (id, nm, ms, nt) =>
          println(f"[stage]   #$id%-4d ${ms / 1000.0}%7.2f s  tasks=$nt%-4d $nm")
        }
      }
    }
    spark.stop()
  }
}
