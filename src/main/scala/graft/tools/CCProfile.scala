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
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a"), col("doc_b")),
        struct(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))).as("e"))
      .select(col("e.doc_a").as("doc_a"), col("e.doc_b").as("doc_b"))
      .cache()
    t("edges materialize")(edges.count())

    var labels = t("labels init checkpoint")(
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("doc_id").as("component"))
        .localCheckpoint())
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 50) {
      val nbr = edges.join(labels, edges("doc_b") === labels("doc_id"))
        .groupBy(col("doc_a")).agg(min(col("component")).as("ncomp"))
      val stepped = t(s"round $iter stepped ckpt")(
        labels.join(nbr, labels("doc_id") === nbr("doc_a"), "left")
          .select(labels("doc_id"),
            least(col("component"), coalesce(col("ncomp"), col("component"))).as("component"))
          .localCheckpoint())
      val par = stepped.select(col("doc_id").as("p_id"), col("component").as("p_comp"))
      val next = t(s"round $iter jump ckpt")(
        stepped.join(par, stepped("component") === par("p_id"), "left")
          .select(stepped("doc_id"),
            coalesce(col("p_comp"), stepped("component")).as("component"))
          .localCheckpoint())
      changed = t(s"round $iter changed count")(
        next.as("n")
          .join(labels.as("o"), col("n.doc_id") === col("o.doc_id"))
          .filter(col("n.component") =!= col("o.component")).count())
      println(s"[cc] round $iter changed=$changed")
      labels = next
      iter += 1
    }
    println(s"[cc] converged after $iter rounds")
    spark.stop()
  }
}
