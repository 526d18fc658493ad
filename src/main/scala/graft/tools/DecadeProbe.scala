package graft.tools

import org.apache.spark.sql.SparkSession

/** sf0.1 → sf1 → sf10 growth probe — the first measurement that can
  * catch superlinearity the single-scale sf1 probe structurally cannot
  * (VERDICT r10 item 3). A query that is quadratic in a capped quantity
  * looks flat at one scale and only bends across a decade; this main
  * measures every selected query at THREE scales a decade apart and
  * fits the growth exponent per decade.
  *
  * Corpus: sf10 = 500k docs / 200k embeddings / 10M events, generated
  * with the exact [[ScaleProbe.generate]] profile (deterministic MD5
  * draws, ~5% planted near-dups, Gaussian label clusters, exponential
  * event values) so all three scales are the same distribution and only
  * n moves. The TPC-H star tables are symlinked from sf0.1 at every
  * scale — their tier is driver-owned and carries no absolute
  * thresholds — so relational-only queries are excluded here.
  *
  * Metric: executor CPU seconds ([[CpuMeter]]), wall recorded alongside.
  * The host's ambient co-tenancy inflates wall 1.5-10× in windows;
  * a growth EXPONENT fitted on wall across three runs taken minutes
  * apart would be weather, not shape. Timing is toRdd (full output
  * materialization), matching the sf1 probe's methodology.
  *
  * Budget: expected sf10 cpu = cpu_sf1 × the measured sf0.1→sf1
  * growth ratio, FLOORED AT LINEAR (10×/decade). The probe hunts
  * superlinearity, so every query earns at least a linear allowance —
  * otherwise one loud sf0.1 window (inflating c01, deflating the
  * measured ratio) collapses the budget and flags perfectly linear
  * growth. Verdict "SUPER" when cpu_sf10 > 1.5 × expected + 10 s —
  * tightened from r11's 3× (VERDICT r11 item 2) once the 18-28×/decade
  * cluster was isolated to shared-heap pressure (~10 GB of resident
  * memoized checkpoints in a 48 GiB heap inflating late consumers):
  * the flag line now sits at 15×/decade (~n^1.18), so a repeat of
  * semdedup's 92%-of-budget near-breach fails loudly instead of
  * passing.
  *
  * Run the committed sweep ONE TIER PER JVM (tools/decade_sweep.sh,
  * "tier:N" args): r12 measured that a single-JVM full sweep inflates
  * late queries 5-20× in executor CPU — kernel-side fault storms
  * (30+ cores of guest sys-time, zero reclaim, GC and code cache
  * clean) that track the process's grown RSS on this memory-
  * overcommitted host, vanish in fresh JVMs, and poisoned both the
  * r11 "growth cluster" and two full r12 sweep attempts. Per-tier
  * JVMs bound the footprint the way a real cluster's per-stage
  * executors would.
  *
  * Usage: runMain graft.tools.DecadeProbe [sf10Dir] [artifact.json] [query...]
  * (trailing query names restrict the probe set — for re-measuring the
  * queries a fix changed without re-rolling the full hour-long sweep).
  * `--gen-only` generates the corpora and exits (so measurement JVMs
  * start lean). GRAFT_SCALE_SET=sf100 shifts the whole probe one decade
  * up — sf1 -> sf10 -> sf100 (5M docs / 2M embeddings / 100M events) —
  * with the same tiers, gate, and retry discipline; the artifact's
  * growth/budget keys are renamed to the scales they actually span.
  */
object DecadeProbe {

  /** Probe set: the heaviest sf1 queries whose inputs live in the
    * GENERATED corpus (documents/embeddings/events — the tables that
    * actually grow a decade here), in registry order so the memoized
    * tiers' visible build entries run before their consumers at each
    * scale, exactly like the bench. Relational-tier heavies
    * (tpch_q18_large_orders, column_stats_exact, ...) read symlinked
    * sf0.1 data at every scale and would only fit noise.
    */
  /** The probe set, partitioned into its memo TIERS. Within a tier,
    * builds run before consumers (registry order, like the bench); at
    * every tier BOUNDARY the probe drops the finished tier's memoized
    * checkpoints (Memo.reset + clearCache) — new in r12. The r11 sweep
    * kept every tier's localCheckpoint blocks resident to the end
    * (~57 GB live at sf10), and the resulting allocator/GC churn
    * inflated late consumers 2-5× in CPU (the entire 18-28×/decade
    * "growth" cluster vanished in fresh-JVM isolated re-runs). A real
    * pipeline releases a finished stage's scratch; the probe now does
    * structurally what the isolated re-runs did by process boundary.
    * Each tier still pays its own builds inside their visible entries;
    * pipeline_funnel becomes the quality-gate memo's first consumer in
    * the text tier (the documented first-consumer-absorbs pattern)
    * instead of reading cluster_representatives' leftover frame across
    * the tier boundary.
    *
    * winnowing_pairs is the bigram-blocked scale path (the r12
    * default); winnowing_pairs_exact is its Σdf²-shaped fidelity twin —
    * predicted superlinear across this decade (df mass saturating into
    * the 400 cap), but the r12 isolated re-measure put it at
    * 8.1×/decade, so the twin stays in the gated set rather than being
    * carved out on a theory its own measurement contradicts.
    */
  private val Tiers: Seq[Seq[String]] = Seq(
    // tier = one memo family: the build (or memo-owning first consumer)
    // followed by every probed query that reads its frames — verified
    // against the Memo call sites in DedupQueries/SimilarityQueries/
    // TextAnalytics, so a reset boundary never drops state a remaining
    // query reads
    Seq("minhash_index_build", "dedup_minhash_lsh", "dedup_ngram_jaccard"),
    Seq("substring_covered_build", "dedup_substring_spans"),
    Seq("winnowing_pairs", "winnowing_pairs_exact"),
    Seq("neardup_graph_build", "dedup_components", "label_propagation",
      "cluster_representatives"), // + quality_gate via cluster_representatives
    Seq("ann_index_build", "ann_ivf", "ann_pq", "ann_ivf_pq"), // emb_view + pq_model
    Seq("kmeans_embeddings", "semdedup_cell_stats", "semdedup"), // memo-free
    Seq("embedding_band_stats", "embedding_neardup"), // memo-free
    Seq( // text-analysis / selection tier; quality_gate re-owned by
      // pipeline_funnel (first-consumer-absorbs)
      "tfidf_top_terms", "bm25_search", "hybrid_search_rrf",
      "ngram_lm_perplexity", "nb_lang_classifier", "dsir_selection",
      "split_contamination", "doc_repetition", "boilerplate_spans",
      "content_defined_chunks", "pipeline_funnel"),
    Seq( // event tier
      "q1_hot_items", "q2_hot_pages", "active_user_windows"),
    // r15 century-set extension (VERDICT r14 item 5): the shaping/
    // tokenizer heavies the 34-query set omitted. Memo-free (verified:
    // no Memo.frame/cached call sites), so each group is its own
    // clean-boundary tier. The BPE tier's per-round argmax is a bounded
    // 1-row driver scalar, but its word-table rollup IS corpus-sized —
    // the decade verdict the set owed.
    Seq("bpe_merges", "bpe_vocab", "bpe_tokenize"),
    Seq("corpus_diff", "ngram_counts", "sequence_packing"))

  private val DefaultSelected: Seq[String] = Tiers.flatten

  /** Tier index (extras passed via CLI share a trailing pseudo-tier). */
  private def tierOf(name: String): Int = {
    val i = Tiers.indexWhere(_.contains(name))
    if (i < 0) Tiers.size else i
  }

  private def fmt(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  def main(args: Array[String]): Unit = {
    val sf10Dir = args.headOption.getOrElse("testdata_sf10")
    val artifact = args.drop(1).headOption.getOrElse("SCALE_sf10_r12.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-decade-probe")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // GRAFT_SCALE_SET=sf100 shifts the whole probe one decade up
    // (sf1 -> sf10 -> sf100: 5M docs / 2M embeddings / 100M events) —
    // same generator profile, same tiers, same 15x/decade gate; only n
    // moves another 10x. Every corpus is generated idempotently here
    // (ScaleProbe.generate skips tables that exist), so a fresh box can
    // run either sweep from nothing.
    val century = sys.env.get("GRAFT_SCALE_SET").contains("sf100")
    val profiles: Seq[(String, Long, Long, Long)] =
      Seq(("testdata_sf1", 50000L, 20000L, 1000000L),
        (if (century) "testdata_sf10" else sf10Dir,
          500000L, 200000L, 10000000L)) ++
        (if (century)
          Seq(("testdata_sf100", 5000000L, 2000000L, 100000000L))
        else Nil)
    for ((d, nd, nv, ne) <- profiles) {
      ScaleProbe.generate(spark, d, nDocs = nd, nVecs = nv, nEvents = ne)
      ScaleProbe.linkRelational(d)
    }
    if (args.drop(2).contains("--gen-only")) { spark.stop(); return }

    val scales =
      if (century) Seq("testdata_sf1", "testdata_sf10", "testdata_sf100")
      else Seq("/root/testdata/sf0.1", "testdata_sf1", sf10Dir)
    val byName = graft.SparkEntry.all.map(q => q.name -> q).toMap
    // "tier:N" args expand to that tier's query list (single-sourced
    // here), for the per-tier fresh-JVM sweep tools/decade_sweep.sh
    val only = args.drop(2).filterNot(_ == "--gen-only").flatMap {
      case s if s.startsWith("tier:") => Tiers(s.stripPrefix("tier:").toInt)
      case s => Seq(s)
    }.toSet
    val Selected =
      if (only.isEmpty) DefaultSelected
      else DefaultSelected.filter(only) ++
        only.filterNot(DefaultSelected.contains).toSeq.sorted
    val missing = Selected.filterNot(byName.contains)
    require(missing.isEmpty, s"unknown probe queries: $missing")
    val meter = new CpuMeter(spark)

    def timedRun(name: String, dir: String, tag: String = ""): (String, Long, Double, Double) = {
      val q = byName(name)
      val cpu0 = meter.snapshot()
      val t0 = System.nanoTime()
      val rows =
        try q.run(spark, dir).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          println(s"[decade] $name@$dir FAILED: ${e.getMessage}"); -1L }
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = meter.snapshot() - cpu0
      println(f"[decade] $name%-28s @$dir%-22s rows=$rows%10d wall=${wall}%8.1f s cpu=${cpu}%8.1f s$tag")
      (name, rows, wall, cpu)
    }

    // scale-major order: each scale pays its memoized builds exactly
    // once, inside the visible *_build (or first-consumer) entries that
    // run first in their tier — and drops the finished tier's
    // checkpoints at every tier boundary (see [[Tiers]])
    val measured = scales.map { dir =>
      val out = scala.collection.mutable.Map[String, (String, Long, Double, Double)]()
      var cur = -1
      for (name <- Selected) {
        val t = tierOf(name)
        if (t != cur) {
          graft.queries.Memo.reset(); spark.catalog.clearCache(); cur = t
        }
        out(name) = timedRun(name, dir)
      }
      dir -> out
    }.toMap

    val Seq(d01, d1, d10) = scales

    // One retry for any first-pass SUPER verdict, min-merged per scale
    // (the ScaleProbe retry-on-breach precedent): the host's ambient
    // co-tenancy windows inflate even executor CPU (memory-bandwidth
    // contention), and a growth verdict multiplies two samples — one
    // loud window on either side mints a false SUPER. A flag that
    // REPRODUCES across two samples minutes apart is shape; one that
    // doesn't is weather.
    //
    // Retry fidelity (new in r12): a retry replays the flagged query's
    // TIER from a reset — unflagged members before it run unmeasured as
    // warm-up — so the retry measures exactly what the first pass did:
    // a flagged build (or memo-owning first consumer) pays its REAL
    // build again rather than a warm-memo lookup that would hide the
    // build cost behind the min-merge (the r9 finding, which the old
    // warm-state retry would have reintroduced the first time a *_build
    // entry breached). Both samples are disclosed via cpu_first.
    val firstCpu = scala.collection.mutable.Map[String, (Double, Double)]()
    def verdictOf(name: String): String = {
      val (_, r01, _, c01) = measured(d01)(name)
      val (_, r1, _, c1) = measured(d1)(name)
      val (_, r10, _, c10) = measured(d10)(name)
      if (r01 < 0 || r1 < 0 || r10 < 0) "FAILED"
      else {
        val floor = 0.05
        val g01 = math.max(c1, floor) / math.max(c01, floor)
        if (c10 > 1.5 * c1 * math.max(g01, 10.0) + 10.0) "SUPER" else "ok"
      }
    }
    val flagged = Selected.filter(verdictOf(_) == "SUPER")
    for (name <- flagged)
      firstCpu(name) = (measured(d1)(name)._4, measured(d10)(name)._4)
    if (flagged.nonEmpty) {
      val flaggedTiers = flagged.map(tierOf).toSet
      for (dir <- Seq(d1, d10)) {
        var cur = -1
        for (name <- Selected if flaggedTiers.contains(tierOf(name))) {
          val t = tierOf(name)
          if (t != cur) {
            graft.queries.Memo.reset(); spark.catalog.clearCache(); cur = t
          }
          if (flagged.contains(name)) {
            val again = timedRun(name, dir, " (retry)")
            val prev = measured(dir)(name)
            if (again._2 == prev._2 && again._4 < prev._4)
              measured(dir)(name) = (name, prev._2, math.min(again._3, prev._3), again._4)
          } else if (Tiers.lift(t).exists(tier =>
              tier.indexOf(name) < tier.lastIndexWhere(flagged.contains))) {
            // unmeasured warm-up: only members BEFORE the tier's last
            // flagged entry can feed a flagged one's memo state
            try byName(name).run(spark, dir).queryExecution.toRdd.count()
            catch { case _: Throwable => () }
          }
        }
      }
    }

    val rows = Selected.map { name =>
      val (_, r01, w01, c01) = measured(d01)(name)
      val (_, r1, w1, c1) = measured(d1)(name)
      val (_, r10, w10, c10) = measured(d10)(name)
      val failed = r01 < 0 || r1 < 0 || r10 < 0
      // growth ratio per decade on cpu, floored so near-zero sf0.1
      // samples (sub-100ms) can't fabricate a huge or tiny exponent
      val floor = 0.05
      val g01 = math.max(c1, floor) / math.max(c01, floor)
      val g1 = math.max(c10, floor) / math.max(c1, floor)
      // Expected growth floors at LINEAR (10x/decade): the probe hunts
      // SUPERlinearity, so a query that looked sublinear sf0.1->sf1
      // (often just a loud sf0.1 window inflating c01) still earns a
      // linear allowance. Flag threshold is 1.5x linear = 15x/decade
      // ~ n^1.18 (tightened from r11's 3x once the high-growth cluster
      // was isolated to shared-heap pressure).
      val expected = c1 * math.max(g01, 10.0)
      val budget = 1.5 * expected + 10.0
      val verdict =
        if (failed) "FAILED"
        else if (c10 > budget) "SUPER"
        else "ok"
      val dark = !failed && r10 == 0
      val retried = firstCpu.get(name)
        .map { case (f1, f10) => s""""cpu_first":[${fmt(f1)},${fmt(f10)}],""" }
        .getOrElse("")
      // entry keys name the actual scales (the century set shifts them
      // a decade up) so a reader of the artifact alone can't misread
      // which corpus a growth ratio spans
      val (gLoKey, gHiKey, budgetKey) =
        if (century) ("growth_1_10", "growth_10_100", "budget_cpu_sf100")
        else ("growth_01_1", "growth_1_10", "budget_cpu_sf10")
      (name, verdict, dark,
        s""""$name":{"rows":[$r01,$r1,$r10],""" +
          s""""wall":[${fmt(w01)},${fmt(w1)},${fmt(w10)}],""" +
          s""""cpu":[${fmt(c01)},${fmt(c1)},${fmt(c10)}],$retried""" +
          s""""$gLoKey":${fmt(g01)},"$gHiKey":${fmt(g1)},""" +
          s""""$budgetKey":${fmt(budget)},"verdict":"$verdict"}""")
    }
    val supers = rows.filter(_._2 == "SUPER").map(_._1)
    val fails = rows.filter(_._2 == "FAILED").map(_._1)
    val dark = rows.filter(_._3).map(_._1)
    def arr(xs: Seq[String]) = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    // the r11 lesson: the heap SIZE is part of the methodology — ~10 GB
    // of resident memoized checkpoints in a 48 GiB heap inflated late
    // consumers 2-3x at sf10 — so the artifact stamps it
    val heapGb = Runtime.getRuntime.maxMemory / (1L << 30)
    // ... and so is pre-touch (r12): without -Xms=-Xmx+AlwaysPreTouch
    // the first heavy allocation ramp after JVM start lands in task CPU
    // as kernel fault time (minhash_index_build@sf100: 12,120 CPU s
    // first-pass vs 692 s in-JVM retry). The sweep script sets it; the
    // artifact records whether this run had it.
    val pretouch = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.contains("-XX:+AlwaysPreTouch")
    val (probeTag, corpusKey, corpusDesc, hiTag, gLoName) =
      if (century)
        ("three-scale century growth (sf1 -> sf10 -> sf100)",
          "corpus_sf100",
          "documents 5M / embeddings 2M / events 100M, ScaleProbe.generate profile (same distribution as sf1/sf10 — only n moves); TPC-H tables symlinked from sf0.1 (relational tier excluded from the probe set)",
          "sf100", "growth_1_10")
      else
        ("three-scale decade growth (sf0.1 -> sf1 -> sf10)",
          "corpus_sf10",
          "documents 500k / embeddings 200k / events 10M, ScaleProbe.generate profile; TPC-H tables symlinked from sf0.1 (relational tier excluded from the probe set)",
          "sf10", "growth_01_1")
    val json =
      s"""{"probe":"$probeTag","timing":"toRdd","metric":"executor-cpu","heap_gb":$heapGb,"heap_pretouch":$pretouch,
         |"$corpusKey":"$corpusDesc",
         |"budget":"cpu_$hiTag <= 1.5 x cpu_mid x max($gLoName, 10) + 10s — expected growth floors at linear (10x/decade) so a loud low-scale window cannot collapse the budget and flag linear growth; the 1.5x headroom puts the flag threshold at 15x/decade (~n^1.18), tightened from r11's 3x after the 18-28x/decade cluster isolated to shared-heap pressure; wall recorded but not gated (ambient co-tenancy); first-pass SUPER verdicts re-measured once at the two upper scales by replaying the flagged query's TIER from a memo reset (warm-up unmeasured) and min-merged (cpu_first discloses the louder sample) — a flagged build re-pays its real build, never a warm-memo lookup",
         |"tier_resets":"memoized checkpoints dropped at every tier boundary within each scale (r12): the r11 sweep held every finished tier's localCheckpoint blocks to the end (~57 GB live at sf10) and the allocator/GC churn inflated late consumers 2-5x in CPU — the entire 18-28x/decade growth cluster vanished in fresh-JVM isolated re-runs; each tier still pays its builds inside its visible entries",
         |"nqueries":${rows.size},"superlinear":${arr(supers)},"failed":${arr(fails)},"dark":${arr(dark)},
         |"total_cpu_$hiTag":${fmt(Selected.map(measured(d10)(_)._4).sum)},"total_wall_$hiTag":${fmt(Selected.map(measured(d10)(_)._3).sum)},
         |"queries":${rows.map(_._4).mkString("{", ",", "}")}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[decade] superlinear=${supers.size} failed=${fails.size} dark=${dark.size} -> $artifact")
    spark.stop()
  }
}
