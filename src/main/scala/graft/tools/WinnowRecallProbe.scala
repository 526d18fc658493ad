package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stratified winnowing recall at scale (VERDICT r12 item 6): the r12
  * width-4 block re-cut narrowed the blocked candidate guarantee to
  * shared runs of ≥ 18 tokens for long docs, with a width-2 fallback
  * key space for docs ≤ 18 tokens — so blocking integrity must be
  * shown in the SHORT-DOC stratum specifically, not just in the corpus
  * aggregate where short docs are ~10% of the mass.
  *
  * Metrics per stratum (short = both members ≤ 18 tokens), gated
  * differently because they test different claims:
  *
  *  - BLOCKING-ATTRIBUTABLE MISSES — MinHash-confirmed near-dups that
  *    the exact form reports but the blocked form loses. GATED at ZERO
  *    per stratum per scale: this is the claim blocking makes and the
  *    thing the r12 width change could actually have broken.
  *  - MinHash-confirmed recall (jaccard ≥ 0.5 per dedup_minhash_lsh)
  *    — the cross-tier yardstick. GATED at ≥ [[Floor]] for the long
  *    stratum and the corpus aggregate; DISCLOSED (not gated) for the
  *    short stratum, where the r13 diagnosis showed the misses are the
  *    REPORT contract's n_shared ≥ 3 noise floor, not blocking: at sf1
  *    every one of the 38 missed short confirmed pairs is also absent
  *    from winnowing_pairs_exact (34 share exactly 2 fingerprints at
  *    containment ≥ 0.667 — tiny fingerprint sets where MOSS's floor
  *    of 3 cannot be met; see the sub_floor_misses field).
  *  - BLOCKED COVERAGE of the exact form's full report — DISCLOSED:
  *    the width-4 contract deliberately gives up exact-report pairs
  *    whose only overlap is a 10–17-token shared run (ADVICE r12;
  *    measured 0.83 of exact's long-stratum pairs at sf1, none of them
  *    MinHash-confirmed near-dups). Gating this would re-litigate the
  *    r12 width decision, not protect it; block_miss == 0 is what
  *    separates contract narrowing from a real blocking loss.
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
      def strat(pairs: DataFrame): DataFrame = pairs
        .join(ntk.select(col("doc_id").as("doc_a"), col("nt").as("na")), "doc_a")
        .join(ntk.select(col("doc_id").as("doc_b"), col("nt").as("nb")), "doc_b")
        .withColumn("stratum",
          when(col("na") <= ShortToks && col("nb") <= ShortToks, "short")
            .otherwise("long"))
        .select(col("doc_a"), col("doc_b"), col("stratum"))
      val conf = strat(graft.SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
        .select(col("doc_a"), col("doc_b")))
      val win = graft.SparkEntry.queries("winnowing_pairs")(spark, dir)
        .select(col("doc_a"), col("doc_b")).withColumn("w", lit(1))
      val exact = strat(graft.SparkEntry.queries("winnowing_pairs_exact")(spark, dir)
        .select(col("doc_a"), col("doc_b")))

      // blocking integrity: blocked coverage of the exact form's pairs
      val cov = exact
        .join(win, Seq("doc_a", "doc_b"), "left")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n"), sum(coalesce(col("w"), lit(0))).as("got"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      // cross-tier recall vs MinHash-confirmed near-dups, with the
      // misses attributed: in exact but not blocked -> blocking loss;
      // absent from exact too -> the report contract's noise floor
      val rec = conf
        .join(win, Seq("doc_a", "doc_b"), "left")
        .join(exact.select(col("doc_a"), col("doc_b")).withColumn("x", lit(1)),
          Seq("doc_a", "doc_b"), "left")
        .groupBy(col("stratum"))
        .agg(count(lit(1)).as("n"),
          sum(coalesce(col("w"), lit(0))).as("got"),
          sum(when(col("w").isNull && col("x").isNotNull, 1L).otherwise(0L))
            .as("block_miss"),
          sum(when(col("w").isNull && col("x").isNull, 1L).otherwise(0L))
            .as("sub_floor"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

      val parts = Seq("short", "long").map { s =>
        val (cn, cg) = cov.getOrElse(s, (0L, 0L))
        val coverage = if (cn == 0) 1.0 else cg.toDouble / cn
        val (n, got, bm, sf) = rec.getOrElse(s, (0L, 0L, 0L, 0L))
        if (bm > 0) ok = false // a blocking loss of a confirmed near-dup
        val recall = if (n == 0) 1.0 else got.toDouble / n
        // BOTH strata gated since r14: the sized rescue rule
        // (DedupQueries.winReportKeep) lifts the short stratum over the
        // floor, so the disclosure carve-out is retired
        if (n > 0 && recall < Floor) ok = false
        println(f"[winrecall] $dir%-18s $s%-6s coverage=$coverage%.4f ($cg/$cn) " +
          f"minhash_recall=$recall%.4f ($got/$n) block_miss=$bm sub_floor=$sf")
        s""""$s":{"exact_pairs":$cn,"blocked_covered":$cg,"coverage":${f"$coverage%.4f"},
           |"confirmed":$n,"recovered":$got,"recall":${f"$recall%.4f"},
           |"blocking_attributable_misses":$bm,"sub_floor_misses":$sf}"""
          .stripMargin.replace("\n", "")
      }
      if (sys.env.contains("GRAFT_WINRECALL_DIAGNOSE")) {
        // histogram the confirmed-but-missed pairs by the exact report's
        // own variables — what floor would have kept them?
        val fps = graft.queries.DedupQueries.winnowFingerprintSets(spark, dir)
        val missed = conf.filter(col("stratum") === "short")
          .join(win.select(col("doc_a"), col("doc_b")),
            Seq("doc_a", "doc_b"), "left_anti")
          .join(fps.select(col("doc_id").as("doc_a"), col("fhvs").as("fa"),
            col("c").as("ca")), "doc_a")
          .join(fps.select(col("doc_id").as("doc_b"), col("fhvs").as("fb"),
            col("c").as("cb")), "doc_b")
          .withColumn("sh", size(array_intersect(col("fa"), col("fb"))).cast("long"))
          .withColumn("minc", least(col("ca"), col("cb")))
          .withColumn("cont", round(col("sh").cast("double") / col("minc"), 3))
          .groupBy(col("sh"), col("minc"), col("cont")).count()
          .orderBy(desc("count")).collect()
        missed.foreach(r => println(
          s"[windiag] $dir short-miss n_shared=${r.getLong(0)} min_c=${r.getLong(1)} " +
            s"containment=${r.getDouble(2)} pairs=${r.getLong(3)}"))
      }
      val (an, ag) = rec.values.foldLeft((0L, 0L)) { case ((n, g), (cn, cg, _, _)) => (n + cn, g + cg) }
      val agg = if (an == 0) 1.0 else ag.toDouble / an
      if (an > 0 && agg < Floor) ok = false
      println(f"[winrecall] $dir%-18s AGG    minhash_recall=$agg%.4f ($ag/$an)")
      s""""$dir":{${parts.mkString(",")},"aggregate_recall":${f"$agg%.4f"}}"""
    }
    val json =
      s"""{"check":"winnowing_pairs (blocked, width-4 + width-2 short-doc fallback) stratified by doc length (short = both docs <= $ShortToks tokens, the stratum the r12 width change narrowed). GATED: blocking_attributable_misses == 0 per stratum (no MinHash-confirmed near-dup reported by winnowing_pairs_exact may be lost by blocking — the claim blocking makes) and MinHash-confirmed recall >= $Floor for BOTH strata + the corpus aggregate (the r14 sized rescue rule — keep n_shared=2 pairs when the smaller fingerprint set is <= 3 and containment >= 0.65, mirrored in both Spark forms and both DuckDB oracles — lifts the short stratum over the floor; its residual misses are single-shared-fingerprint pairs no 2-anchor report can keep). DISCLOSED: blocked coverage of exact's FULL report — the width-4 contract deliberately drops (a) exact pairs whose only overlap is a 10-17-token run (ADVICE r12) and (b) since r14, mixed-length rescue pairs (a <=3-fingerprint doc contained in a LONG doc), whose candidates would require the long side to emit the quadratic width-2 key space the r12 century probe measured disk-dead; none of either class is a confirmed near-dup (block_miss stays 0)","floor":$Floor,
         |"scales":{${rows.mkString(",")}},"pass":$ok}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[winrecall] pass=$ok -> $artifact")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
