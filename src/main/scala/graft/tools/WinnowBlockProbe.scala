package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off sizing probe for the winnowing CANDIDATE BLOCK design: the
  * r12 century sweep killed `winnowing_pairs` (bigram-blocked) at sf100
  * with a disk-full sort spill — on the 31-word bounded-vocabulary
  * corpus the distinct word-3-gram space (31^3 = 29,791) saturates, so
  * bigram-block document frequency grows ~ n and the block self-join's
  * candidate volume Σ df(df−1)/2 goes quadratic. This main measures, at
  * each scale, the block-df histogram and the exact candidate volume for
  * k-gram blocks (k = 2, 3, 4 consecutive selected fingerprints), which
  * is the one number that picks the fix: the smallest k whose candidate
  * mass stays ~linear per decade.
  *
  * Usage: runMain graft.tools.WinnowBlockProbe <dir> [<dir> ...]
  */
object WinnowBlockProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-winnow-block-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      // mirror winnowFpSets + the blocked form's consecutive-dedup
      // (DedupQueries.scala) without touching its memo registry
      val sel = graft.sources.Tables.documents(spark, dir)
        .withColumn("toks", graft.functions.TextFunctions.tokens(col("text")))
        .withColumn("grams", graft.functions.TextFunctions.wordShingles("toks", 3))
        .withColumn("keys", expr(
          "transform(grams, (g, i) -> CAST(conv(substr(md5(g), 1, 8), 16, 10) AS LONG) * 16777216 + i + 1)"))
        .withColumn("sel", expr(
          """CASE WHEN size(keys) = 0 THEN array()
            |ELSE transform(sequence(1, greatest(size(keys) - 3, 1)),
            |               p -> array_min(slice(keys, p, 4)) div 16777216)
            |END""".stripMargin))
        .withColumn("seqd",
          expr("filter(sel, (x, i) -> i = 0 OR x != element_at(sel, i))"))
        .select(col("doc_id"), col("seqd"), size(col("toks")).as("n_toks"))
        .localCheckpoint()
      for (k <- Seq(2, 3, 4)) {
        val kg = sel
          .withColumn("kgs", expr(
            s"""CASE WHEN size(seqd) < $k THEN array()
               |ELSE transform(sequence(1, size(seqd) - ${k - 1}),
               |       j -> array_join(slice(seqd, j, $k), ':'))
               |END""".stripMargin))
          .select(col("doc_id"), explode(col("kgs")).as("blk"))
          .distinct()
        val stats = kg.groupBy(col("blk")).agg(count(lit(1)).as("df"))
          .agg(
            count(lit(1)).as("blocks"),
            sum(col("df")).as("postings"),
            max(col("df")).as("max_df"),
            sum(expr("df * (df - 1) div 2")).as("cand_pairs"),
            sum(when(col("df") > 400, expr("df * (df - 1) div 2"))
              .otherwise(0L)).as("cand_in_hot400"),
            sum(when(col("df") > 64, expr("df * (df - 1) div 2"))
              .otherwise(0L)).as("cand_in_hot64"),
            expr("percentile_approx(df, 0.99)").as("df_p99"))
          .collect()(0)
        println(s"[winblock] dir=$dir k=$k $stats")
      }
      // short-doc population (candidate fallback sizing): docs whose
      // token count cannot contain a 14-token run (3w+k-1 trigram
      // guarantee threshold)
      val short = sel.agg(
        sum(when(col("n_toks") < 14, 1L).otherwise(0L)).as("short_docs"),
        count(lit(1)).as("docs")).collect()(0)
      println(s"[winblock] dir=$dir $short")
    }
    spark.stop()
  }
}
