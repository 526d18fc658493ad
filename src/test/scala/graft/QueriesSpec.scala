package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Smoke + invariant tests for every registered query at sf0.001.
  * Exact-value correctness is gated by the DuckDB oracle (Verify +
  * driver compare); these tests assert structural invariants that the
  * oracle can't express.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  // Queries where an empty result at sf0.001 is legitimate (tiny data).
  private val mayBeEmpty =
    Set("q8_blacklist", "q9_login_fail", "q9_login_burst", "split_contamination",
      // sf0.001 has ~10 suppliers across 25 nations: NATION_7 (q11's
      // supplying nation) has none there, and q20's dominance test can
      // select zero suppliers from so thin a pair graph
      "tpch_q11_important_stock", "tpch_q20_excess_supply")

  for (q <- SparkEntry.all) {
    test(s"${q.name} runs and returns rows at sf0.001") {
      val df = q.run(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q1 top-3: rn bounded, counts non-increasing within window") {
    val df = SparkEntry.queries("q1_hot_items")(spark, sf)
    assert(df.filter(col("rn") > 3).isEmpty)
    val bad = df.as("a")
      .join(df.as("b"),
        col("a.window_start") === col("b.window_start") &&
          col("a.rn") === col("b.rn") - 1)
      .filter(col("a.cnt") < col("b.cnt"))
    assert(bad.isEmpty, "counts must be non-increasing in rank order")
  }

  test("q5 approx UV within 10% of q4 exact UV per window") {
    val exact = SparkEntry.queries("q4_uv_hourly")(spark, sf)
    val approx = SparkEntry.queries("q5_uv_approx")(spark, sf)
    val joined = exact.join(approx, "window_start")
    val bad = joined.filter(
      abs(col("uv_approx") - col("uv")) > col("uv") * 0.1 + lit(2))
    assert(bad.isEmpty, "approx UV drifted >10% from exact")
  }

  test("column_stats approx NDV within HLL bound of column_stats_exact, other stats identical") {
    val exact = SparkEntry.queries("column_stats_exact")(spark, sf)
      .select(col("column_name"), col("ndv").as("ndv_exact"),
        col("null_count").as("nulls_exact"), col("min_value").as("min_exact"),
        col("max_value").as("max_exact"))
    val approx = SparkEntry.queries("column_stats")(spark, sf)
    val joined = exact.join(approx, "column_name")
    assert(joined.count() == 6, "both forms must cover all six columns")
    // HLL++ at rsd=0.02: 3 sigma ≈ 6% relative error bound
    val badNdv = joined.filter(
      abs(col("ndv") - col("ndv_exact")) > col("ndv_exact") * 0.06 + lit(2))
    assert(badNdv.isEmpty, s"approx NDV drifted >6% from exact: ${badNdv.collect().mkString}")
    // nulls/min/max are exact aggregates in both forms — must match exactly
    val badRest = joined.filter(
      col("null_count") =!= col("nulls_exact") ||
        col("min_value") =!= col("min_exact") ||
        col("max_value") =!= col("max_exact"))
    assert(badRest.isEmpty, "non-NDV stats must be identical between forms")
  }

  test("q3 PV total equals filtered row count (window partition invariant)") {
    val total = SparkEntry.queries("q3_pv_hourly")(spark, sf)
      .agg(sum("pv")).first().getLong(0)
    val expected = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "view").count()
    assert(total == expected)
  }

  test("q10 statuses partition the orders table") {
    val df = SparkEntry.queries("q10_order_timeout")(spark, sf)
    val orders = graft.sources.Tables.orders(spark, sf).count()
    assert(df.count() == orders)
    assert(df.select("status").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(Set("shipped", "timeout")))
  }

  test("hybrid_search_rrf: every fused doc came from a list, ranks ≤ 20, rrf bounded") {
    val df = SparkEntry.queries("hybrid_search_rrf")(spark, sf)
    assert(df.filter(col("lex_rank").isNull && col("vec_rank").isNull).isEmpty,
      "a fused doc must appear in at least one source list")
    assert(df.filter(
      coalesce(col("lex_rank"), lit(1L)) > 20 ||
        coalesce(col("vec_rank"), lit(1L)) > 20).isEmpty)
    // max possible RRF = rank 1 in both lists = 2/61; min > 0
    assert(df.filter(col("rrf") > 2.0 / 61 + 1e-9 || col("rrf") <= 0).isEmpty)
  }

  test("k_anonymity: classes partition customers; l ≤ k; at_risk ⇔ k < 5") {
    val df = SparkEntry.queries("k_anonymity")(spark, sf)
    val customers = graft.sources.Tables.read(spark, sf, "customer").count()
    assert(df.agg(sum("k")).first().getLong(0) == customers,
      "equivalence classes must partition the table")
    assert(df.filter(col("l") > col("k")).isEmpty, "l-diversity can't exceed class size")
    assert(df.filter((col("k") < 5).cast("long") =!= col("at_risk")).isEmpty)
  }

  test("dp_noisy_counts: deterministic, noise bounded by b·ln(mod)") {
    val a = SparkEntry.queries("dp_noisy_counts")(spark, sf).collect()
    val b = SparkEntry.queries("dp_noisy_counts")(spark, sf).collect()
    assert(a.sameElements(b), "seeded noise must replay identically")
    val exact = graft.sources.Tables.read(spark, sf, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n"))
    val joined = SparkEntry.queries("dp_noisy_counts")(spark, sf).join(exact, "nation")
    // inverse-CDF magnitude cap: b·ln(1/(2·u_min)) with u_min = 1/(mod+1)
    // + 1e-6: the minimum-u group hits the cap exactly, modulo float
    // association between the cap formula and the engine's ln chain
    val cap = 2.0 * math.log((1000003.0 + 1) / 2) + 1e-6
    assert(joined.filter(abs(col("noisy_n") - col("n")) > cap).isEmpty)
  }

  test("mmr_rerank: 5 distinct picks from the dense top-20, mmr ≤ λ·rel, first pick is pure-rel argmax") {
    val df = SparkEntry.queries("mmr_rerank")(spark, sf).orderBy("pick").collect()
    assert(df.length == 5)
    assert(df.map(_.getLong(df.head.fieldIndex("vec_id"))).distinct.length == 5,
      "greedy picks must be distinct")
    val relIdx = df.head.fieldIndex("rel")
    val mmrIdx = df.head.fieldIndex("mmr")
    // penalty term is subtractive: mmr can never exceed λ·rel (+ rounding)
    assert(df.forall(r => r.getDouble(mmrIdx) <= 0.7 * r.getDouble(relIdx) + 1e-6))
    // pick 1 has the max relevance of the whole candidate list
    assert(df.head.getDouble(relIdx) == df.map(_.getDouble(relIdx)).max)
  }

  test("skew_audit: shares ≤ 1 and descending, skew ratio consistent with share") {
    val df = SparkEntry.queries("skew_audit")(spark, sf)
      .orderBy(col("cnt").desc, col("join_key")).collect()
    assert(df.length > 0 && df.length <= 20)
    val shares = df.map(_.getDouble(df.head.fieldIndex("share")))
    assert(shares.forall(s => s > 0 && s <= 1.0))
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    // skew_vs_avg = share * n_keys (same formula, 4dp vs 6dp rounding)
    df.foreach { r =>
      val expect = r.getDouble(r.fieldIndex("share")) * r.getLong(r.fieldIndex("n_keys"))
      assert(math.abs(r.getDouble(r.fieldIndex("skew_vs_avg")) - expect) < 1e-2)
    }
  }

  test("join_size_estimate: exact equals the materialized join; estimate unbiased-ish") {
    val r = SparkEntry.queries("join_size_estimate")(spark, sf).collect().head
    val ev = graft.sources.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click").select("user_id", "event_id")
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("e2"))
    val exact = clicks.join(purch, "user_id").count()
    assert(r.getLong(r.fieldIndex("exact_size")) == exact,
      "Σ a_u·b_u must equal the true join output size")
    assert(r.getLong(r.fieldIndex("keys_sampled")) <= r.getLong(r.fieldIndex("keys_total")))
    // the estimator path must actually run on the fixture: at least one
    // key under the hash threshold, and the 1/8-sample estimate within
    // 1x of truth (measured 0.40 on this corpus) — a sampler that
    // samples nothing and estimates 0 must fail here
    assert(r.getLong(r.fieldIndex("keys_sampled")) >= 1,
      "hash-threshold sampler sampled zero keys on the fixture")
    assert(r.getDouble(r.fieldIndex("est_size")) > 0)
    assert(r.getDouble(r.fieldIndex("rel_err")) < 1.0,
      s"estimate too far off: ${r.getDouble(r.fieldIndex("rel_err"))}")
  }

  test("dedup_containment: containment ≥ jaccard, bounded by 1, and ≥ threshold somewhere") {
    val df = SparkEntry.queries("dedup_containment")(spark, sf).collect()
    assert(df.length > 0, "sf0.001 fixture has near-dup docs; containment must find pairs")
    df.foreach { r =>
      val ca = r.getDouble(r.fieldIndex("cont_a_in_b"))
      val cb = r.getDouble(r.fieldIndex("cont_b_in_a"))
      val j = r.getDouble(r.fieldIndex("jaccard"))
      assert(ca <= 1.0 + 1e-9 && cb <= 1.0 + 1e-9)
      assert(math.max(ca, cb) >= 0.7)
      // containment dominates Jaccard: |A∩B|/|A| ≥ |A∩B|/|A∪B|
      assert(ca >= j - 1e-9 && cb >= j - 1e-9)
    }
  }

  test("label_propagation: labels every doc; community sizes consistent; isolated docs keep own id") {
    val df = SparkEntry.queries("label_propagation")(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(df.count() == docs.count(), "every doc gets a community")
    // community_size is the actual census of its label
    val census = df.groupBy(col("community")).agg(count(lit(1)).as("actual"))
    assert(df.join(census, "community")
      .filter(col("community_size") =!= col("actual")).isEmpty)
    // at least one non-trivial community exists on the near-dup fixture
    assert(df.filter(col("community_size") > 1).count() > 0)
  }

  test("bloom_prefilter_join equals the plain exact join (false positives re-checked)") {
    val df = SparkEntry.queries("bloom_prefilter_join")(spark, sf)
    val ev = graft.sources.Tables.events(spark, sf)
    val build = ev.filter(col("event_type") === "error")
      .groupBy("user_id").agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= 3).select("user_id")
    val plain = ev.filter(col("event_type") === "purchase")
      .join(build, "user_id")
      .groupBy("user_id").agg(count(lit(1)).as("n_purchases"))
    assert(df.select("user_id", "n_purchases").exceptAll(plain).isEmpty)
    assert(plain.exceptAll(df.select("user_id", "n_purchases")).isEmpty)
  }

  test("compaction_plan: files partition each source's docs and balance within one max-doc") {
    val df = SparkEntry.queries("compaction_plan")(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    val totalDocs = docs.count()
    assert(df.map(_.getLong(df.head.fieldIndex("n_docs"))).sum == totalDocs,
      "planned files must partition the corpus")
    val bySrc = df.groupBy(_.getString(df.head.fieldIndex("source")))
    val maxChars = docs.agg(max("n_chars")).first().getLong(0)
    bySrc.foreach { case (_, rows) =>
      // target_files is capped at the source's doc count, so the plan
      // emits exactly target_files NON-EMPTY files at every data shape
      assert(rows.length == rows.head.getLong(rows.head.fieldIndex("target_files")),
        "plan must emit exactly target_files files per source")
      assert(rows.forall(_.getLong(rows.head.fieldIndex("n_docs")) >= 1),
        "no planned file may be empty")
      val sizes = rows.map(_.getLong(rows.head.fieldIndex("file_bytes")))
      // LPT round-robin bound: spread ≤ one max doc
      assert(sizes.max - sizes.min <= maxChars)
    }
  }

  test("lr_quality_classifier: deterministic replay, sane metrics, moving weights") {
    val a = SparkEntry.queries("lr_quality_classifier")(spark, sf).collect()
    val b = SparkEntry.queries("lr_quality_classifier")(spark, sf).collect()
    assert(a.sameElements(b), "decimal-pinned GD must replay bit-identically")
    val r = a.head
    val acc = r.getDouble(r.fieldIndex("train_acc"))
    assert(acc >= 0.0 && acc <= 1.0)
    assert(r.getLong(r.fieldIndex("n_docs")) ==
      graft.sources.Tables.documents(spark, sf).count())
    // 3 GD steps from w=0 with a non-degenerate target must move weights
    assert(Seq("w0", "w1", "w2").map(c => r.getDouble(r.fieldIndex(c)))
      .exists(_ != 0.0))
  }

  test("nb_lang_classifier: scores every odd doc, predicts only trained classes") {
    val df = SparkEntry.queries("nb_lang_classifier")(spark, sf)
    val docs = graft.sources.Tables.documents(spark, sf)
    val oddDocs = docs.filter(col("doc_id") % 2 === 1).count()
    assert(df.count() == oddDocs, "every held-out doc must get a prediction")
    val trainLangs = docs.filter(col("doc_id") % 2 === 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(df.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
      .subsetOf(trainLangs))
    assert(df.filter(!col("correct").isin(0L, 1L)).isEmpty)
  }
}
