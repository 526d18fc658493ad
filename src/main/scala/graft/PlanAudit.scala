package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of every registered query —
  * the scale-readiness review loop: check PushedFilters reach the
  * parquet scans, dimension joins broadcast, rank-limits plan as
  * WindowGroupLimit, and codegen spans stay wide.
  * Usage: runMain graft.PlanAudit [sfDir] [queryName...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- SparkEntry.all if only.isEmpty || only(q.name)) {
      println(s"\n===== ${q.name} =====")
      try println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
