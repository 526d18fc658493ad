package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stratified winnowing recall at scale (VERDICT r12 item 6): the r12
  * width-4 block re-cut narrowed the blocked candidate guarantee to
  * shared runs of ≥ 18 tokens for long docs, with a width-2 fallback
  * key space for docs ≤ 18 tokens — so the ≥ 0.9 MinHash-confirmed
  * recall floor must be shown to hold in the SHORT-DOC stratum
  * specifically, not just in the corpus aggregate where short docs are
  * ~10% of the mass. This main measures recall per stratum (short =
  * both members ≤ 18 tokens) at each given scale dir and writes one
  * JSON artifact; it exits nonzero if any stratum at any scale breaks
  * the floor, so it gates like a spec.
  *
  * Usage: runMain graft.tools.WinnowRecallProbe <artifact.json> <dir> [<dir> ...]
  */
object WinnowRecallProbe {
  private val Floor = 0.9
  private val ShortToks = 18 // DedupQueries.WinShortToks

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: WinnowRecallProbe <artifact.json> <dir>...")
    val artifact = args.head
    val dirs = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-winnow-recall-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var ok = true
    val rows = dirs.map { dir =>
      graft.queries.Memo.reset(); spark.catalog.clearCache()
      val ntk = graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), size(split(trim(col("text")), " ")).cast("long").as("nt"))
      val conf = graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
        .select(col("doc_a"), col("doc_b"))
        .join(ntk.select(col("doc_id").as("doc_a"), col("nt").as("na")), "doc_a")
        .join(ntk.select(col("doc_id").as("doc_b"), col("nt").as("nb")), "doc_b")
        .withColumn("stratum",
          when(col("na") <= ShortToks && col("nb") <= ShortToks, "short")
            .otherwise("long"))
      val win = graft.SparkEntry.queries("winnowing_pairs")(spark, dir)
        .select(col("doc_a"), col("doc_b"))
      val agg = conf
        .join(win.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("got"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val parts = Seq("short", "long").map { s =>
        val (n, got) = agg.getOrElse(s, (0L, 0L))
        val recall = if (n == 0) 1.0 else got.toDouble / n
        if (n > 0 && recall < Floor) ok = false
        println(f"[winrecall] $dir%-18s $s%-6s recall=$recall%.4f ($got/$n)")
        s""""$s":{"confirmed":$n,"recovered":$got,"recall":${f"$recall%.4f"}}"""
      }
      s""""$dir":{${parts.mkString(",")}}"""
    }
    val json =
      s"""{"check":"winnowing_pairs (blocked, width-4 + width-2 short-doc fallback) recall of MinHash-confirmed near-dups (jaccard >= 0.5), stratified by doc length: short = both docs <= $ShortToks tokens — the stratum the r12 width change narrowed; floor $Floor per stratum per scale","floor":$Floor,
         |"scales":{${rows.mkString(",")}},"pass":$ok}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[winrecall] pass=$ok -> $artifact")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
