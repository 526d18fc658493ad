package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Structural invariants for the pipeline-shaping tier (exact values
  * are oracle-gated; these assert the properties the oracle can't
  * state — partition/coverage/interval laws).
  */
class PipelineShapingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("ngram_counts: doc frequency never exceeds occurrences, top-50 bounded") {
    val df = SparkEntry.queries("ngram_counts")(spark, sf)
    assert(df.count() <= 50)
    assert(df.filter(col("n_docs") > col("n_occurrences")).isEmpty)
  }

  test("doc_chunking: chunk indexes contiguous from 0, full coverage with overlap") {
    val chunks = SparkEntry.queries("doc_chunking")(spark, sf)
    // per doc: chunk_idx runs 0..max with no gaps
    val idx = chunks.groupBy("doc_id")
      .agg(min("chunk_idx").as("lo"), max("chunk_idx").as("hi"),
        count(lit(1)).as("n"))
    assert(idx.filter(col("lo") =!= 0 || col("n") =!= col("hi") + 1).isEmpty)
    // every chunk holds 1..32 tokens; chunks cover at least all tokens
    assert(chunks.filter(col("n_tokens") < 1 || col("n_tokens") > 32).isEmpty)
    val covered = chunks.groupBy("doc_id").agg(sum("n_tokens").as("ct"))
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).cast("long").as("n"))
    assert(covered.join(toks, "doc_id").filter(col("ct") < col("n")).isEmpty,
      "chunks must cover every token at least once")
  }

  test("sequence_packing: bins partition each source's token stream") {
    val bins = SparkEntry.queries("sequence_packing")(spark, sf)
    val perSource = bins.groupBy("source")
      .agg(sum("n_tokens").as("bt"), sum("n_docs").as("bd"),
        min("bin").as("lo"), max("bin").as("hi"))
    val truth = graft.sources.Tables.documents(spark, sf)
      .groupBy("source")
      .agg(sum(size(split(trim(col("text")), " "))).as("tt"),
        count(lit(1)).as("td"))
    val j = perSource.join(truth, "source")
    assert(j.filter(col("bt") =!= col("tt") || col("bd") =!= col("td")).isEmpty,
      "every doc and every token lands in exactly one bin")
    assert(j.filter(col("lo") =!= 0).isEmpty, "first bin is 0 per source")
    // bin ids are dense: max bin < total tokens / ctx + 1
    assert(j.filter(col("hi") > col("tt") / 256 + 1).isEmpty)
  }

  test("boilerplate_spans: ratio is a proper fraction of the shingle rollup") {
    val df = SparkEntry.queries("boilerplate_spans")(spark, sf)
    assert(df.filter(col("n_dup_shingles") > col("n_shingles")).isEmpty)
    assert(df.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).isEmpty)
  }

  test("scd2_user_state: intervals chain without overlap, one open per user") {
    val iv = SparkEntry.queries("scd2_user_state")(spark, sf)
    // exactly one open (is_current) interval per user
    val open = iv.groupBy("user_id").agg(sum("is_current").as("n_open"))
    assert(open.filter(col("n_open") =!= 1).isEmpty)
    // closed intervals end strictly after they start, and runs chain:
    // each interval's valid_to equals the next run's valid_from
    assert(iv.filter(col("valid_to_us").isNotNull &&
      col("valid_to_us") <= col("valid_from_us")).isEmpty)
    val chained = iv.as("a").join(iv.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.run_id") === col("b.run_id") - 1)
    assert(chained.filter(col("a.valid_to_us") =!= col("b.valid_from_us")).isEmpty)
    // interval event counts partition the event table
    val total = iv.agg(sum("n_events")).first().getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("forward_fill: carried value equals the user's latest preceding purchase") {
    val df = SparkEntry.queries("forward_fill")(spark, sf)
    // rows before any purchase are null; purchase rows carry their own value
    val events = graft.sources.Tables.events(spark, sf)
      .filter(col("user_id") % 20 === 0)
    assert(df.count() == events.count())
    val purchases = df.filter(col("event_type") === "purchase")
    val evVals = events.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("value"))
    assert(purchases.join(evVals, "event_id")
      .filter(col("last_purchase_value") =!= col("value")).isEmpty,
      "a purchase row must carry its own value")
  }

  test("incremental_agg_merge: merged partials equal a direct full aggregation") {
    val merged = SparkEntry.queries("incremental_agg_merge")(spark, sf)
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_direct"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)")
          .cast("double").as("s_direct"))
    val j = merged.join(direct, "user_id")
    assert(j.filter(col("n_events") =!= col("n_direct") ||
      col("sum_value") =!= col("s_direct")).isEmpty,
      "delta merge must reproduce the full recompute exactly")
  }

  test("zorder_layout: every 64-key bucket is an aligned 8x8 tile (skippable on both dims)") {
    val df = SparkEntry.queries("zorder_layout")(spark, sf)
    // the 6 low Morton bits carry 3 bits per dimension: a bucket's
    // bounding box can never exceed 8 cells on either axis
    assert(df.filter(col("qx_max") - col("qx_min") >= 8 ||
      col("qy_max") - col("qy_min") >= 8).isEmpty,
      "z-bucket bounding boxes must stay within the aligned tile")
    assert(df.count() <= 64)
    val total = df.agg(sum("n_rows")).first().getLong(0)
    assert(total == graft.sources.Tables.lineitem(spark, sf).count())
  }

  test("uv_sketch_rollup: daily-sketch union equals the direct sketch, bounds hold") {
    val df = SparkEntry.queries("uv_sketch_rollup")(spark, sf)
    // union-of-daily == direct sketch over raw rows (exact associativity)
    val direct = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("uv_direct"))
    assert(df.join(direct, "event_type")
      .filter(col("uv_est") =!= col("uv_direct")).isEmpty,
      "sketch union must be exactly associative")
    // estimate within HLL error of exact; day-sum is an upper bound
    assert(df.filter(abs(col("uv_est") - col("uv_exact")) >
      col("uv_exact") * 0.05 + lit(2)).isEmpty)
    assert(df.filter(col("uv_day_sum") < col("uv_exact")).isEmpty)
  }

  test("pmi_bigrams: co-occurrence bounded by component counts") {
    val df = SparkEntry.queries("pmi_bigrams")(spark, sf)
    assert(df.count() <= 50)
    assert(df.filter(col("n_cooccur") > col("c1") ||
      col("n_cooccur") > col("c2")).isEmpty)
  }

  test("doc_entropy: bounded by ln(n_distinct), normalized form in [0,1]") {
    val df = SparkEntry.queries("doc_entropy")(spark, sf)
    assert(df.filter(col("entropy") < 0 ||
      col("entropy") > log(col("n_distinct").cast("double")) + 1e-6).isEmpty)
    assert(df.filter(col("norm_entropy") < 0 || col("norm_entropy") > 1.000001).isEmpty)
    // a single-distinct-token doc has zero entropy by definition
    assert(df.filter(col("n_distinct") === 1 && col("entropy") =!= 0.0).isEmpty)
  }

  test("source_divergence: KL is non-negative (Gibbs), tokens partition the corpus") {
    val df = SparkEntry.queries("source_divergence")(spark, sf)
    assert(df.filter(col("kl_divergence") < -1e-6).isEmpty, "KL must be >= 0")
    val total = df.agg(sum("n_tokens")).first().getLong(0)
    val expected = graft.sources.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), " "))).count()
    assert(total == expected)
  }

  test("weighted_sample: deterministic under rerun, favors heavy documents") {
    val a = SparkEntry.queries("weighted_sample")(spark, sf).collect().map(_.toString).sorted
    val b = SparkEntry.queries("weighted_sample")(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b), "sample must be rerun-stable")
    // weight-proportional: the sampled mean n_chars exceeds the corpus mean
    val sampled = SparkEntry.queries("weighted_sample")(spark, sf)
      .agg(avg("n_chars")).first().getDouble(0)
    val corpus = graft.sources.Tables.documents(spark, sf)
      .agg(avg("n_chars")).first().getDouble(0)
    assert(sampled > corpus, s"weighted sample mean $sampled should exceed corpus mean $corpus")
  }

  test("outlier_events: every reported row is beyond 3 sigma") {
    val df = SparkEntry.queries("outlier_events")(spark, sf)
    assert(df.filter(abs(col("z_score")) <= 3.0).isEmpty)
  }

  test("equi_depth_histogram: balanced tiles with ordered, non-overlapping ranges") {
    val df = SparkEntry.queries("equi_depth_histogram")(spark, sf)
    // ntile balance: within each type, bucket sizes differ by at most 1
    val spread = df.groupBy("event_type")
      .agg((max("n") - min("n")).as("spread"))
    assert(spread.filter(col("spread") > 1).isEmpty)
    // ranges ordered: tile t's hi <= tile t+1's lo never violated
    val bad = df.as("a").join(df.as("b"),
      col("a.event_type") === col("b.event_type") &&
        col("a.tile") === col("b.tile") - 1)
      .filter(col("a.hi") > col("b.lo"))
    assert(bad.isEmpty, "equi-depth buckets must not overlap")
  }

  test("rolling_features: first event per user sees an empty window") {
    val df = SparkEntry.queries("rolling_features")(spark, sf)
    val firsts = df.groupBy("user_id").agg(min("sec").as("first_sec"))
    val j = df.join(firsts, "user_id").filter(col("sec") === col("first_sec"))
    assert(j.filter(col("n_prev_7d") =!= 0 || col("sum_prev_7d") =!= 0.0).isEmpty)
    assert(df.filter(col("n_prev_7d") < 0).isEmpty)
  }

  test("gapfill_hourly: dense grid, counts partition the event stream") {
    val df = SparkEntry.queries("gapfill_hourly")(spark, sf)
    val types = df.select("event_type").distinct().count()
    val hours = df.select("hour").distinct().count()
    assert(df.count() == types * hours, "grid must be complete (every type x every hour)")
    val total = df.agg(sum("n")).first().getLong(0)
    assert(total == graft.sources.Tables.events(spark, sf).count())
  }

  test("active_user_windows: dau <= wau <= mau pointwise") {
    val df = SparkEntry.queries("active_user_windows")(spark, sf)
    assert(df.filter(col("dau") > col("wau") || col("wau") > col("mau")).isEmpty)
    assert(df.count() > 0)
  }

  test("item_cooccurrence: pair support bounded by the user universe") {
    val df = SparkEntry.queries("item_cooccurrence")(spark, sf)
    val users = graft.sources.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(df.filter(col("n_users") > users).isEmpty)
    assert(df.filter(col("item_a") >= col("item_b")).isEmpty, "pairs must be ordered")
  }

  test("purchase_attribution: attributions partition the purchase events") {
    val df = SparkEntry.queries("purchase_attribution")(spark, sf)
    val total = df.agg(sum("n_purchases")).first().getLong(0)
    val purchases = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(total == purchases)
    assert(df.filter(col("attributed_to") === "purchase").isEmpty,
      "a purchase can never attribute to itself")
    assert(df.filter(col("n_users") > col("n_purchases")).isEmpty)
  }

  test("session_paths: bounded paths, session totals consistent with sessionize") {
    val df = SparkEntry.queries("session_paths")(spark, sf)
    assert(df.count() <= 20)
    assert(df.filter(size(split(col("path"), ">")) > 5).isEmpty,
      "paths are capped at the first 5 events")
    val sessions = SparkEntry.queries("sessionize")(spark, sf).count()
    val counted = df.agg(sum("n_sessions")).first().getLong(0)
    assert(counted <= sessions, "top-20 path sessions cannot exceed all sessions")
  }

  test("vocab_growth: cumulative curves are monotone and close at the corpus totals") {
    val df = SparkEntry.queries("vocab_growth")(spark, sf).orderBy("bucket").collect()
    assert(df.nonEmpty)
    val vocabs = df.map(_.getAs[Long]("cum_vocab"))
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b })
    val lastVocab = vocabs.last
    val distinctTerms = graft.sources.Tables.documents(spark, sf)
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= lit(""))).as("t"))
      .select("t").distinct().count()
    assert(lastVocab == distinctTerms, s"final cum_vocab $lastVocab != $distinctTerms")
  }

  test("percentile_normalization: ranks live in [0,1] with 0 present per type") {
    val df = SparkEntry.queries("percentile_normalization")(spark, sf)
    assert(df.filter(col("pct_rank") < 0 || col("pct_rank") > 1).isEmpty)
  }

  test("target_encoding: LOO mean stays within the group's value range") {
    val df = SparkEntry.queries("target_encoding")(spark, sf)
    val ranges = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type").agg(min("value").as("vlo"), max("value").as("vhi"))
    val j = df.filter(col("loo_mean").isNotNull).join(ranges, "event_type")
    assert(j.filter(col("loo_mean") < col("vlo") - 1e-6 ||
      col("loo_mean") > col("vhi") + 1e-6).isEmpty)
  }

  test("column_stats: one row per column, ndv bounded by row count, min <= max") {
    val df = SparkEntry.queries("column_stats")(spark, sf)
    assert(df.count() == 6)
    val rows = graft.sources.Tables.lineitem(spark, sf).count()
    assert(df.filter(col("ndv") > rows || col("min_value") > col("max_value")).isEmpty)
  }

  test("winnowing_pairs: >=0.9 MinHash-confirmed recall holds in the SHORT-DOC stratum specifically") {
    // The r12 width-4 block re-cut narrowed the candidate guarantee to
    // shared runs of >= 18 tokens for LONG docs, with a width-2
    // fallback key space ('s:') for docs <= 18 tokens. The corpus-
    // aggregate recall spec can mask a short-doc regression (short docs
    // are ~10% of the probe corpus), so this asserts the floor PER
    // STRATUM on a ScaleProbe-generated corpus — the same generator
    // profile the sf1/sf10 WinnowRecallProbe artifact measures, where
    // ~5% of docs are planted near-dups and doc length is uniform
    // 10..100 tokens.
    val dir = java.nio.file.Files.createTempDirectory("graft-winnow-short").toString
    graft.tools.ScaleProbe.generate(spark, dir, nDocs = 6000L, nVecs = 10L, nEvents = 200L)
    val ntk = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), size(split(trim(col("text")), " ")).cast("long").as("nt"))
    // 18 = WinShortToks, the blocked path's short-doc fallback cutoff
    def strata(pairs: org.apache.spark.sql.DataFrame) = pairs
      .join(ntk.select(col("doc_id").as("doc_a"), col("nt").as("na")), "doc_a")
      .join(ntk.select(col("doc_id").as("doc_b"), col("nt").as("nb")), "doc_b")
      .withColumn("stratum", when(col("na") <= 18 && col("nb") <= 18, "short")
        .otherwise("long"))
    val conf = strata(SparkEntry.queries("dedup_minhash_lsh")(spark, dir)
      .select(col("doc_a"), col("doc_b"))).cache()
    val win = SparkEntry.queries("winnowing_pairs")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val byStratum = conf
      .join(win.withColumn("hit", lit(1)), Seq("doc_a", "doc_b"), "left")
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("got"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    conf.unpersist()
    val (nShort, gotShort) = byStratum.getOrElse("short", (0L, 0L))
    assert(nShort >= 10,
      s"stratum must be non-vacuous: only $nShort confirmed short-doc near-dup pairs")
    assert(gotShort.toDouble / nShort >= 0.9,
      s"short-doc stratum recall ${gotShort.toDouble / nShort} ($gotShort/$nShort) below the 0.9 floor")
    val (nLong, gotLong) = byStratum.getOrElse("long", (1L, 0L))
    assert(gotLong.toDouble / nLong >= 0.9,
      s"long-doc stratum recall ${gotLong.toDouble / nLong} ($gotLong/$nLong) below the 0.9 floor")
  }
}
