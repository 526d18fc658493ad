package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporary profiling CLI for the dedup_components iteration: times
  * each phase (edge build, per-round join/checkpoint/count) to locate
  * where the wall-clock goes. Not part of the query surface.
  */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // mirror of DedupQueries.dedupComponents with timing
    val pairs = graft.SparkEntry.queries("dedup_simhash_pairs")(spark, sfDir)
    val edges = t("edges checkpoint")(pairs
      .select(explode(array(
        struct(col("doc_a"), col("doc_b")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("e"))
      .select(col("e.doc_a").as("doc_a"), col("e.doc_b").as("doc_b"))
      .localCheckpoint())

    var labels = t("labels init checkpoint")(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("doc_id").as("component"))
        .localCheckpoint())
    def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = t("init sum")(labelSum(labels))
    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val nbr = edges.join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(col("doc_a")).agg(min(col("component")).as("ncomp"))
      val stepped = labels.join(nbr, labels("doc_id") === nbr("doc_a"), "left")
        .select(labels("doc_id"),
          least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
      val par = stepped.select(col("doc_id").as("p_id"), col("component").as("p_comp"))
      val next = t(s"round $iter step+jump ckpt")(
        stepped.join(par, stepped("component") === par("p_id"), "left")
          .select(stepped("doc_id"),
            coalesce(col("p_comp"), stepped("component")).as("component"))
          .localCheckpoint())
      val newSum = t(s"round $iter sum")(labelSum(next))
      converged = newSum.compareTo(prevSum) == 0
      prevSum = newSum
      labels = next
      iter += 1
    }
    println(s"[cc] converged after $iter rounds")
    spark.stop()
  }
}
