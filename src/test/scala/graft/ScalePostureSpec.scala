package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Storage

/** Scale-posture properties: bucketed co-located joins eliminate the
  * shuffle, partitioned writes prune directories, SQL extension
  * registration, and watermark late-data semantics.
  */
class ScalePostureSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("bucketed tables join with no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the test is differential: with it on, BOTH
    // joins are exchange-free and a broken bucketing would pass
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val ev = graft.sources.Tables.events(spark, sf)
      val cust = graft.sources.Tables.customer(spark, sf)
      Storage.writeBucketed(ev.select("event_id", "user_id", "event_type"), "ev_b", 4, "user_id")
      Storage.writeBucketed(cust.select("c_custkey", "c_nationkey"), "cust_b", 4, "c_custkey")
      val joined = Storage.table(spark, "ev_b")
        .join(Storage.table(spark, "cust_b"),
          col("user_id") === col("c_custkey"))
      // co-located bucketed join: no hash-partition exchange in the plan
      assert(!Storage.hasShuffle(joined), joined.queryExecution.executedPlan.toString())
      // while the un-bucketed join DOES shuffle (differential check)
      val plain = ev.join(cust, ev("user_id") === cust("c_custkey"))
      assert(Storage.hasShuffle(plain), "plain join should shuffle with broadcast off")
      assert(joined.count() == plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partitioned write prunes partitions at read") {
    val path = java.nio.file.Files.createTempDirectory("graft-part").toString
    Storage.writePartitioned(
      graft.sources.Tables.events(spark, sf).select("event_id", "user_id", "event_type"),
      path, "event_type")
    val pruned = spark.read.parquet(path).filter(col("event_type") === "error")
    val scan = pruned.queryExecution.executedPlan.toString()
    // partition filter present => directory pruning, not a data filter
    assert(scan.contains("PartitionFilters") && scan.contains("error"))
    assert(pruned.count() ==
      graft.sources.Tables.events(spark, sf).filter(col("event_type") === "error").count())
  }

  test("GraftExtensions registers float_vec_dot, word_shingles, char_ngrams for SQL users") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("ext-test")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      val r = ext.sql(
        "SELECT float_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
        .head().getDouble(0)
      assert(r == 11.0)
      val sh = ext.sql("SELECT word_shingles(array('a','b','c','d'), 3) AS s")
        .head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val ng = ext.sql("SELECT char_ngrams('abcd', 2) AS g").head().getSeq[String](0)
      assert(ng == Seq("ab", "bc", "cd"))
      // SQL surface trims like the DataFrame helper (one behavior everywhere)
      val ngTrim = ext.sql("SELECT char_ngrams('  abcd  ', 2) AS g").head().getSeq[String](0)
      assert(ngTrim == Seq("ab", "bc", "cd"))
      // NULL input -> empty array, not NULL (documented contract; safe
      // for size()/aggregation consumers)
      val nulls = ext.sql(
        "SELECT size(word_shingles(CAST(NULL AS ARRAY<STRING>), 3)) AS a, " +
          "size(char_ngrams(CAST(NULL AS STRING), 2)) AS b").head()
      assert(nulls.getInt(0) == 0 && nulls.getInt(1) == 0)
      // morton_interleave: x=5 (101b) into even bits, y=3 (011b) into odd
      val mz = ext.sql("SELECT morton_interleave(5L, 3L) AS z").head().getLong(0)
      assert(mz == 27L, s"morton_interleave(5,3) = $mz, expected 27")
      // bit-twiddle spread == per-bit arithmetic across 100k rank pairs
      // (one distributed query, not per-row round trips)
      val arith = (0 until 16).map(i =>
        s"shiftleft(shiftright(qx, $i) & 1, ${2 * i}) + shiftleft(shiftright(qy, $i) & 1, ${2 * i + 1})")
        .mkString(" + ")
      val mismatches = ext.sql(
        s"""SELECT count(*) FROM (
           |  SELECT id % 65536 AS qx, (id * 2654435761) % 65536 AS qy FROM range(100000)
           |) WHERE morton_interleave(qx, qy) != ($arith)""".stripMargin)
        .head().getLong(0)
      assert(mismatches == 0L, s"$mismatches fused/arithmetic morton mismatches")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("pipeline TVFs: SELECT * FROM dedup_verdicts(dir) equals the registered query") {
    import org.apache.spark.sql.SparkSession
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("tvf-test")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      val viaTvf = ext.sql(s"SELECT * FROM dedup_verdicts('$sf')")
      val registered = SparkEntry.queries("dedup_verdicts")(ext, sf)
      assert(rows(viaTvf) == rows(registered))
      // predicate composes through the expansion — no materialization
      val drops = ext.sql(
        s"SELECT count(*) AS n FROM dedup_verdicts('$sf') WHERE verdict = 'drop'")
        .head().getLong(0)
      assert(drops == registered.filter(col("verdict") === "drop").count())
      // the quality gate and chunker answer in SQL too
      assert(ext.sql(s"SELECT * FROM text_quality_filter('$sf')").count() ==
        SparkEntry.queries("text_quality_filter")(ext, sf).count())
      assert(ext.sql(s"SELECT * FROM content_defined_chunks('$sf')").count() ==
        SparkEntry.queries("content_defined_chunks")(ext, sf).count())
      // generic registry escape hatch
      val q1 = ext.sql(s"SELECT * FROM graft_query('tpch_q1_pricing_summary', '$sf')")
      assert(rows(q1) == rows(SparkEntry.queries("tpch_q1_pricing_summary")(ext, sf)))
      // unknown names fail with a catalogue hint, not a planner crash
      val err = intercept[Exception](ext.sql(s"SELECT * FROM graft_query('nope', '$sf')"))
      assert(err.getMessage.contains("unknown graft query"))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("as-of join plans exactly one shuffle (union + window, no range-join explosion)") {
    val df = SparkEntry.queries("asof_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    val exchanges = "(?m)^\\s*[+:]?[- ]*Exchange ".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 exchange, plan:\n$plan")
    assert(df.count() > 0)
  }

  test("embedding_neardup plans as equi-joins — no cartesian/nested-loop product") {
    val df = SparkEntry.queries("embedding_neardup")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup candidate generation must stay bucketed, plan:\n$plan")
    assert(df.count() > 0)
  }

  test("neardup verify-join guard: past broadcast range the lookups swap to shuffle-hash, same pairs") {
    val s = spark
    import s.implicits._
    import graft.queries.SimilarityQueries.neardupPairs
    val rnd = new scala.util.Random(17)
    val base = (0 until 40).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val dups = (0 until 10).map { i =>
      ((1000 + i).toLong, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val bcast = neardupPairs(df)                      // 50 rows << default gate
    val shuffled = neardupPairs(df, bcastMaxRows = 1) // force the large-corpus branch
    // the large-corpus branch must plan NO broadcast of the vector map
    // and NO sort of the pair stream — shuffle-HASH joins only
    val plan = shuffled.queryExecution.executedPlan.toString()
    assert(plan.contains("ShuffledHashJoin"),
      s"large-corpus verify lookups must be shuffle-hash joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"pair stream must never be sorted (the r12 sf100 disk-death):\n$plan")
    // the verify lookups join on vec_a / vec_b; candidate-stage joins
    // (band/sig self-join, liveness collect_set) may still auto-
    // broadcast at this tiny scale — those are threshold-decided, not
    // forced hints, so they degrade on their own at scale
    assert(!plan.contains("BroadcastHashJoin [vec_a") &&
      !plan.contains("BroadcastHashJoin [vec_b"),
      s"past broadcast range no verify side may be broadcast:\n$plan")
    // and the small-corpus branch does broadcast the verify lookups
    // (differential)
    val bplan = bcast.queryExecution.executedPlan.toString()
    assert(bplan.contains("BroadcastHashJoin [vec_a") &&
      bplan.contains("BroadcastHashJoin [vec_b"), bplan)
    // both branches produce the identical pair set
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pairs(bcast) == pairs(shuffled),
      "broadcast and shuffle-hash verify branches must agree exactly")
  }

  test("ann_pq: ADC shortlist + exact re-rank recalls >= 0.6 of true L2 top-5, plans join-only") {
    // sf0.01 (500 vectors, 5 probes): sf0.001's single probe with a
    // corpus smaller than the shortlist would make recall trivially 1.0
    val dir = "/root/testdata/sf0.01"
    val pq = SparkEntry.queries("ann_pq")(spark, dir)
    val plan = pq.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"),
      s"PQ search must stay a code/LUT equi-join pipeline:\n$plan")
    val got = pq.select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact L2 top-5 per probe, computed independently of any ANN path
    val v = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").as("e"))
    val probes = v.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("d2"), col("vec_id"))
    val exact = probes.crossJoin(v)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("d2", aggregate(zip_with(col("pe"), col("e"),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (a, x) => a + x))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= 5)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall@5 = $recall (expected >= 0.6 with 64-bit codes + 50-deep re-rank)")
  }

  test("banded-LSH near-dup candidates recall planted duplicates, stay selective on noise") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    // 20 planted dups: id 1000+i is a tiny perturbation of base i (cos >= 0.999)
    val dups = (0 until 20).map { i =>
      ((1000 + i).toLong, base(i)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val pairs = graft.queries.SimilarityQueries.neardupPairs(df).collect()
    val planted = pairs.count(r => r.getLong(1) == r.getLong(0) + 1000L)
    assert(planted >= 19, s"expected >=19/20 planted dups recalled, got $planted")
    // selectivity: unrelated random pairs collide at ~L/2^k = 4/256
    val noise = pairs.length - planted
    assert(noise < 200, s"candidate generation not selective: $noise noise pairs of ${60 * 59 / 2}")
  }

  test("near-dup bucket cap bounds a planted mega-bucket's pair volume") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // 30 near-identical vectors: every band hashes them to ONE bucket,
    // so uncapped candidates = 30*29/2 = 435 regardless of plane count
    val center = Array.fill(64)(rnd.nextGaussian().toFloat)
    val cluster = (0 until 30).map { i =>
      (i.toLong, center.map(x => x + 1e-4f * rnd.nextGaussian().toFloat))
    }
    val df = cluster.toDF("vec_id", "embedding")
    val capped = graft.queries.SimilarityQueries.neardupPairs(df, cap = 10).collect()
    // the 10 lowest vec_ids survive every band's bucket: exactly
    // 10*9/2 = 45 pairs, all among ids 0-9
    assert(capped.length == 45, s"expected 45 capped pairs, got ${capped.length}")
    assert(capped.forall(r => r.getLong(0) < 10 && r.getLong(1) < 10),
      "cap must keep the lowest vec_ids deterministically")
    val uncapped = graft.queries.SimilarityQueries.neardupPairs(df, cap = 1000).collect()
    assert(uncapped.length == 30 * 29 / 2, s"uncapped mega-bucket should sweep all pairs, got ${uncapped.length}")
  }

  test("capped static near-dup index bounds per-probe amplification; live-mask dedup exact") {
    val s = spark
    import s.implicits._
    import graft.queries.SimilarityQueries._
    val rnd = new scala.util.Random(13)
    // 30 near-identical vectors: every band's bucket holds all 30, so an
    // uncapped index would amplify every probe row 29x; cap = 10
    val center = Array.fill(64)(rnd.nextGaussian().toFloat)
    val df = (0 until 30).map { i =>
      (i.toLong, center.map(x => x + 1e-4f * rnd.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding")
    val index = bandKeyedCappedIndex(df, "idx_id", "ei", "ni", "band_i",
      "sig_i", "sigs_i", "live_i", cap = 10)
    val probes = bandKeyed(df, "in_id", "ev", "nv", "band_v", "sig_v", "sigs_v")
    val alerts = probes.join(index,
        col("band_v") === col("band_i") && col("sig_v") === col("sig_i") &&
          col("in_id") =!= col("idx_id"))
      .filter(firstLiveCollidingBand("sigs_v", "sigs_i", "live_i", "band_v"))
      .select("in_id", "idx_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(alerts.length == alerts.toSet.size,
      "live-mask dedup must emit each (probe, index) pair exactly once")
    assert(alerts.forall(_._2 < 10), "only the 10 lowest ids may survive the capped index")
    val expected = (0 until 30).flatMap(v =>
      (0 until 10).filter(_ != v).map(i => (v.toLong, i.toLong))).toSet
    assert(alerts.toSet == expected,
      s"expected every probe x live-index pair once, got ${alerts.length} of ${expected.size}")
  }

  test("capped MinHash probe index skips oversized buckets; survivors still match") {
    val s = spark
    import s.implicits._
    import graft.queries.DedupQueries.{minhashBandKeyed, minhashBandKeyedCappedIndex}
    // index: ids 1-3 share text A (bucket of 3 per band — SKIPPED at
    // cap 2), ids 10-11 share text B (bucket of 2 — kept)
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six seven"
    val indexDocs = Seq((1L, textA), (2L, textA), (3L, textA),
      (10L, textB), (11L, textB)).toDF("doc_id", "text")
    // probes: 100 carries text A (its buckets were capped away → no
    // candidates), 101 carries text B (matches the surviving pair)
    val probeDocs = Seq((100L, textA), (101L, textB)).toDF("doc_id", "text")
    val index = minhashBandKeyedCappedIndex(indexDocs,
      "idx_id", "shs_i", "c_i", "band_i", "bh_i", "bands_i", "live_i", cap = 2)
    val probe = minhashBandKeyed(probeDocs,
      "in_id", "shs_v", "c_v", "band_v", "bh_v", "bands_v")
    val matches = probe.join(index,
        col("band_v") === col("band_i") && col("bh_v") === col("bh_i"))
      .filter(graft.queries.SimilarityQueries.firstLiveCollidingBand(
        "bands_v", "bands_i", "live_i", "band_v"))
      .select("in_id", "idx_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(matches.length == matches.toSet.size, "live-mask dedup must emit each pair once")
    assert(matches.toSet == Set((101L, 10L), (101L, 11L)),
      s"expected only the surviving text-B bucket to match, got ${matches.toSet}")
  }

  test("firstLiveCollidingBand keeps a pair capped out of an earlier band, drops true duplicates") {
    val s = spark
    import s.implicits._
    val df = Seq(
      // sigs agree at bands 0 and 2; index row capped OUT of band 0 →
      // the band-2 join row is the pair's ONLY appearance: keep it
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 9L), Seq(false, true, true, true), 2),
      // same agreement but live at band 0 → the band-2 row is a
      // duplicate of the band-0 appearance: drop it
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 9L), Seq(true, true, true, true), 2),
      // band 0 itself: empty earlier-band slice, always kept
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 9L), Seq(true, true, true, true), 0)
    ).toDF("sigs_v", "sigs_i", "live_i", "band_v")
    val kept = df.filter(graft.queries.SimilarityQueries
      .firstLiveCollidingBand("sigs_v", "sigs_i", "live_i", "band_v")).count()
    assert(kept == 2, s"expected the capped-out pair and the band-0 row, got $kept")
  }

  test("new relational shapes plan as intended: semi-join, single-join disjunction, no cartesians") {
    // Q4: EXISTS compiles to a semi-join, not an aggregate-and-join
    val q4 = SparkEntry.queries("tpch_q4_priority_check")(spark, sf)
    assert(q4.queryExecution.executedPlan.toString().contains("LeftSemi"))
    // Q19: OR-of-ANDs stays ONE join over one lineitem scan, not a
    // union of three plans
    val q19 = SparkEntry.queries("tpch_q19_disjunctive_rev")(spark, sf)
    val q19Plan = q19.queryExecution.executedPlan.toString()
    assert("(?i)scan parquet".r.findAllIn(q19Plan).length == 2, q19Plan)
    // decontamination + pagerank: equi-join pipelines, never a product
    for (name <- Seq("split_contamination", "neardup_pagerank")) {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        s"$name must stay bucketed:\n$plan")
    }
  }

  test("pipeline-shaping tier plans with the minimal exchange set") {
    def exchanges(name: String): (Int, String) = {
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()
      ("(?m)^\\s*[+:]?[- ]*Exchange ".r.findAllIn(plan).length, plan)
    }
    // chunking is explode-over-scan: the only exchange is the small-scan
    // fan-out (none beyond it)
    val (chunkEx, chunkPlan) = exchanges("doc_chunking")
    assert(chunkEx <= 1, s"doc_chunking must not shuffle beyond fan-out:\n$chunkPlan")
    // packing: ONE source-keyed exchange feeds both the window and the
    // manifest rollup
    val (packEx, packPlan) = exchanges("sequence_packing")
    assert(packEx <= 2, s"sequence_packing must reuse the source exchange:\n$packPlan")
    // SCD2: all three window stages + interval rollup ride ONE
    // user-keyed exchange
    val (scdEx, scdPlan) = exchanges("scd2_user_state")
    assert(scdEx <= 2, s"scd2 stages must share the user_id exchange:\n$scdPlan")
    // forward fill: one user-keyed exchange after the pushed sample
    // filter; the modulo predicate must reach the scan's data filters
    val ff = SparkEntry.queries("forward_fill")(spark, sf)
    val ffPlan = ff.queryExecution.executedPlan.toString()
    assert("(?m)^\\s*[+:]?[- ]*Exchange ".r.findAllIn(ffPlan).length <= 2, ffPlan)
    // incremental merge: no cartesians, partial-agg merge is keyed
    val (_, mergePlan) = exchanges("incremental_agg_merge")
    assert(!mergePlan.contains("CartesianProduct") &&
      !mergePlan.contains("BroadcastNestedLoopJoin"), mergePlan)
  }

  test("selection tier: semdedup pair join stays keyed; LM/DSIR products are only the scalar broadcasts") {
    def planOf(name: String) =
      SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString()
    // semdedup: the post-checkpoint plan is the pairwise sweep — it
    // must join on the cell id, never a product (the k-row centroid
    // broadcasts live inside the checkpointed training chain)
    val sd = planOf("semdedup")
    assert(!sd.contains("CartesianProduct") && !sd.contains("BroadcastNestedLoopJoin"),
      s"semdedup pairwise sweep must be an equi-join on the cell id:\n$sd")
    // LM bucketing and DSIR selection: exactly ONE product each — the
    // broadcast 1-row total that decorates ranks; anything more means
    // an accidental unkeyed join slipped into the scoring path
    for (name <- Seq("ngram_lm_perplexity", "dsir_selection")) {
      val p = planOf(name)
      assert(!p.contains("CartesianProduct"), s"$name must not plan a cartesian:\n$p")
      val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
      assert(bnlj == 1, s"$name should broadcast exactly the 1-row total, found $bnlj products:\n$p")
    }
  }

  test("BandJoinRewrite: SQL abs-band join plans bucketed and matches the naive result") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("band-rule-test")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      import ext.implicits._
      // boundary-heavy values: exact multiples of the band (the ±2
      // probe edge case), off-grid values, and negatives
      val vals = ((0 until 400).map(i => i * 0.05) ++
        (0 until 400).map(i => i * 0.013 - 2.0)).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }
      val df = vals.toDF("id", "v")
      df.createOrReplaceTempView("band_a")
      df.createOrReplaceTempView("band_b")
      val q = ext.sql(
        """SELECT a.id AS ia, b.id AS ib FROM band_a a JOIN band_b b
          |ON abs(a.v - b.v) <= 0.05""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString()
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"band join must be rewritten to a bucketed equi-join:\n$plan")
      // row-for-row identical to the naive cross product on the plain
      // session (no rule installed there)
      val naive = vals.flatMap { case (ia, va) =>
        vals.collect { case (ib, vb) if math.abs(va - vb) <= 0.05 => (ia, ib) }
      }.toSet
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive,
        s"rewrite changed the result: missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
      // swapped operand order (abs(b.v - a.v)) still rewrites
      val swapped = ext.sql(
        """SELECT a.id AS ia, b.id AS ib FROM band_a a JOIN band_b b
          |ON abs(b.v - a.v) <= 0.05""".stripMargin)
      assert(!swapped.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
      assert(swapped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == naive)
      // extra non-equality conjunct rides along as a post-filter
      val withExtra = ext.sql(
        """SELECT a.id AS ia, b.id AS ib FROM band_a a JOIN band_b b
          |ON abs(a.v - b.v) <= 0.05 AND a.id <> b.id""".stripMargin)
      assert(!withExtra.queryExecution.executedPlan.toString().contains("BroadcastNestedLoopJoin"))
      assert(withExtra.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
        naive.filter { case (x, y) => x != y })
      // a join that already has a cross-side equality is left alone
      val equi = ext.sql(
        """SELECT count(*) FROM band_a a JOIN band_b b
          |ON a.id = b.id AND abs(a.v - b.v) <= 0.05""".stripMargin)
      assert(!equi.queryExecution.optimizedPlan.toString().contains("__graft_band_bucket"))
      assert(equi.head().getLong(0) == vals.size)
      // ...and so is one with a null-safe cross-side equality (<=>):
      // Spark already hash-joins it, the explode would be pure overhead
      val nullSafe = ext.sql(
        """SELECT count(*) FROM band_a a JOIN band_b b
          |ON a.id <=> b.id AND abs(a.v - b.v) <= 0.05""".stripMargin)
      assert(!nullSafe.queryExecution.optimizedPlan.toString().contains("__graft_band_bucket"),
        "null-safe equality must count as an existing cross-side equality")
      assert(nullSafe.head().getLong(0) == vals.size)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("BandJoinRewrite: randomized trials across bands stay equivalent to the naive join") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .master("local[2]")
        .appName("band-rule-prop")
        .withExtensions(new graft.plans.GraftExtensions())
        .getOrCreate()
      import ext.implicits._
      val rnd = new scala.util.Random(42)
      for ((band, trial) <- Seq(0.05, 0.3, 1.7).zipWithIndex) {
        // adversarial mix: exact band multiples (boundary ±2-probe
        // territory), near-boundary offsets within a few ulp, uniform
        // noise, and negatives
        val vals = (
          (0 until 100).map(i => i * band) ++
            (0 until 100).map(i => i * band + band * 1e-15) ++
            (0 until 100).map(i => i * band - band * 1e-15) ++
            (0 until 200).map(_ => (rnd.nextDouble() - 0.5) * 60 * band)
          ).zipWithIndex.map { case (v, i) => (i.toLong, v) }
        val df = vals.toDF("id", "v")
        df.createOrReplaceTempView(s"bp_a_$trial")
        val q = ext.sql(
          s"SELECT a.id AS ia, b.id AS ib FROM bp_a_$trial a JOIN bp_a_$trial b ON abs(a.v - b.v) <= $band")
        val plan = q.queryExecution.executedPlan.toString()
        assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
          s"trial $trial (band=$band) not rewritten:\n$plan")
        val naive = vals.flatMap { case (ia, va) =>
          vals.collect { case (ib, vb) if math.abs(va - vb) <= band => (ia, ib) }
        }.toSet
        val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == naive, s"trial $trial (band=$band): " +
          s"missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
      }
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("runtime bloom filter injects on selective-dim shuffle joins") {
    // At 100 TB a selective dimension predicate should reach the fact
    // scan as a runtime bloom filter (Catalyst's InjectRuntimeFilter).
    // The size thresholds that gate it are tuned for real tables, so
    // lower them to observe the plan shape at test scale; broadcast is
    // disabled because the bloom filter targets shuffle joins (a
    // broadcast join already prunes at the hash lookup).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val orders = graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = graft.sources.Tables.lineitem(spark, sf)
      val j = li.join(orders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("bloom_filter_might_contain") ||
        optimized.toLowerCase.contains("bloomfilter"),
        s"expected an injected runtime bloom filter, plan:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // one hot key (80% of the fact side) against a uniform dimension:
    // with the skew thresholds scaled to test data, AQE must replan the
    // sort-merge join with the hot partition split (skew=true marker)
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val s = spark
      import s.implicits._
      val fact = s.range(0, 50000)
        .select(when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
          col("id").as("payload"))
      val dim = s.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("dk"))
      // NOTE: no key-preserving operator above the join — a groupBy on
      // the join key would forbid the split (it needs the original
      // hash partitioning); the non-keyed rollup leaves AQE free
      val joined = fact.join(dim, "k").agg(sum("payload").as("s"))
      joined.collect() // execute so AQE replans with real sizes
      val finalPlan = joined.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"expected AQE skew-join split in the final plan:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("Z-order clustering pays off: tile-range scan materializes a fraction of the unclustered rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val mf = graft.queries.LayoutAnalytics.mortonFrame(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // same rows, two layouts: z-range-clustered files vs round-robin
    mf.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.parquet(s"$base/clustered")
    mf.repartition(16).write.parquet(s"$base/shuffled")
    def scanRows(path: String): (Long, Long) = {
      val df = spark.read.parquet(path)
        .filter(col("qx").between(8, 15) && col("qy").between(8, 15))
      val matched = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val scans = plan.collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty, s"expected a parquet scan:\n$plan")
      assert(scans.head.metadata("PushedFilters").contains("qx"),
        "tile predicate must push to the parquet reader")
      (matched, scans.map(_.metrics("numOutputRows").value).sum)
    }
    val (matchedC, readC) = scanRows(s"$base/clustered")
    val (matchedS, readS) = scanRows(s"$base/shuffled")
    assert(matchedC == matchedS, "layout must never change results")
    // round-robin files all overlap the tile -> their row groups can't
    // be skipped; z-clustered files bound the tile into a few groups
    assert(readS > matchedS * 2,
      s"fixture check: unclustered scan should over-read (read $readS for $matchedS matches)")
    assert(readC * 2 <= readS,
      s"z-clustered scan must materialize at most half the unclustered rows (got $readC vs $readS)")
  }

  test("item_cooccurrence salted == unsalted row-for-row on a planted-skew basket") {
    val s = spark
    import s.implicits._
    // one hot user with a 120-item basket (7140 pairs from a single
    // join key) against 50 normal users with 4-item baskets
    val hot = (0 until 120).map(i => (999L, i.toLong))
    val normal = for (u <- 0 until 50; i <- 0 until 4)
      yield (u.toLong, (u % 7 + i).toLong)
    val ui = (hot ++ normal).toDF("user_id", "item_id").distinct()
    val plain = graft.queries.TemporalAnalytics.cooccurrenceFrom(ui, saltFactor = 1)
    val salted = graft.queries.TemporalAnalytics.cooccurrenceFrom(ui, saltFactor = 8)
    val p = plain.collect().map(_.toSeq).toSeq
    val q = salted.collect().map(_.toSeq).toSeq
    assert(p == q, s"salted pair join must be row-for-row identical:\nplain=$p\nsalted=$q")
    // the salt really fans the hot key out: the salted plan's join has
    // no single partition carrying the whole hot basket product
    val saltedPlan = salted.queryExecution.executedPlan.toString()
    assert(saltedPlan.contains("__salt") || saltedPlan.contains("xxhash64"),
      s"expected the salt key in the salted plan:\n$saltedPlan")
  }

  test("AQE splits the skewed pair self-join at runtime (skew=true, same planted basket)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> scala.util.Try(Option(conf.get(k))).toOption.flatten)
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val s = spark
      import s.implicits._
      val hot = (0 until 2000).map(i => (999L, i.toLong))
      val normal = for (u <- 0 until 50; i <- 0 until 4)
        yield (u.toLong, (u % 7 + i).toLong)
      // the payload column fattens shuffle bytes past the 8KB skew
      // threshold (2000 hot rows of bare longs compress under it)
      val ui = (hot ++ normal).toDF("user_id", "item_id").distinct()
        .withColumn("payload", lpad(col("item_id").cast("string"), 120, "x"))
      // pair join WITHOUT the top-20 head so the join executes fully;
      // the group-by keys (ia, ib) differ from the join key, leaving
      // AQE free to split the hot user_id partition
      val a = ui.select(col("user_id"), col("item_id").as("ia"), col("payload"))
      val b = ui.select(col("user_id").as("user_id_b"), col("item_id").as("ib"))
      val pairs = a.join(b, col("user_id") === col("user_id_b") && col("ia") < col("ib"))
        .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("total"))
      pairs.collect()
      val finalPlan = pairs.queryExecution.executedPlan.toString()
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to split the hot basket's partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("registry-wide plan audit: products only where a tiny broadcast is intentional") {
    // Queries where a CartesianProduct/BroadcastNestedLoopJoin is the
    // DESIGNED plan: a scalar or k-row statistics frame broadcast onto
    // the fact side (bounds, corpus totals, centroid tables, probe
    // sets). Everything else must plan product-free.
    val intentionalTinyBroadcast = Set(
      "ann_bruteforce", "ann_ivf", "ann_ivf_pq", "kmeans_embeddings", // probe/centroid k-rows
      "ann_pq", // brute ADC baseline: probe-set LUT broadcast product, like ann_bruteforce
      "ann_index_probe", // same centroid-table broadcast as ann_ivf_pq
      "semdedup", // same k-row centroid broadcast as kmeans_embeddings
      "semdedup_cell_stats", // composes kmeansAssign: same k-row centroid broadcast
      "tfidf_top_terms", "bm25_search", "pmi_bigrams", // corpus totals (1 row)
      "source_divergence", // 1-row corpus token total
      "zorder_layout", "gapfill_hourly", "active_user_windows", // min/max bounds
      "stratified_sample", "dataset_split", "split_contamination",
      "tpch_q11_important_stock", "tpch_q15_top_supplier", // scalar thresholds
      "tpch_q17_small_qty_revenue", "tpch_q22_lapsed_customers",
      "vocab_growth", "heavy_hitters_cms", "embedding_neardup",
      "ngram_lm_perplexity", "dsir_selection", // broadcast V/N/total scalars
      "hard_negatives", "mixture_alpha_sample", // broadcast probe set / 1-row totals
      "mixture_manifest", // composes mixture_alpha_sample's 1-row total
      "winnowing_pairs_exact", // 1-row ndocs broadcast for the relative stop cutoff
      "dedup_band_stats", // same 1-row ndocs broadcast via the winnowing postings
      "neardup_graph_build", "minhash_index_build", // 1-row x 1-row summary products
      "kmv_overlap", // 5-row day self-pairing
      "hybrid_search_rrf", // 1-row probe vector + bm25's 1-row corpus stats
      "hybrid_search_rrf_indexed", // same 1-row probe + 10-row centroid/cell broadcasts
      "nb_lang_classifier", // broadcast model: 5-row lang totals + 1-row V
      "mmr_rerank", // 1-row probe + 20-row candidate pairwise sims (collapsed list)
      "skew_audit", // 1-row (total, ndv) stats broadcast onto the top-20 frame
      "lr_quality_classifier") // 1-row weight frame broadcast per GD step
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for (q <- SparkEntry.all) {
      val plan =
        try q.run(spark, sf).queryExecution.executedPlan.toString()
        catch { case e: Throwable => fail(s"${q.name} failed to plan: ${e.getMessage}") }
      val hasProduct = plan.contains("CartesianProduct") ||
        plan.contains("BroadcastNestedLoopJoin")
      if (hasProduct && !intentionalTinyBroadcast(q.name)) offenders += q.name
    }
    assert(offenders.isEmpty,
      s"unexpected product joins in: ${offenders.mkString(", ")}")
  }

  test("small single-split scans fan out to session parallelism") {
    val docs = graft.sources.Tables.documents(spark, sf)
    assert(docs.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("bloom prefilter is genuinely selective: bounded bucket table, probe rows shrink before the key join") {
    import graft.queries.WorkloadProfiling
    val ev = graft.sources.Tables.events(spark, sf)
    // the registered query's own build side covers EVERY user at the
    // tiny test scales (each has ≥3 errors), so prove the MECHANISM
    // with an explicitly selective build subset: 3 of the ~15 users
    val build = ev.select(col("user_id").as("err_user")).distinct()
      .orderBy(col("err_user")).limit(3)
    val buckets = build
      .select(WorkloadProfiling.bloomBucketCol(col("err_user")).as("bk")).distinct()
    assert(buckets.count() <= 4096, "the bloom relation must stay broadcast-sized by construction")
    val purchases = ev.filter(col("event_type") === "purchase")
    val afterPrefilter = purchases
      .withColumn("bk", WorkloadProfiling.bloomBucketCol(col("user_id")))
      .join(broadcast(buckets), "bk").count()
    val exactMatches = purchases
      .join(build, col("user_id") === col("err_user")).count()
    // prefilter admits every true match plus only bucket-colliding noise
    assert(afterPrefilter >= exactMatches)
    assert(afterPrefilter < purchases.count(),
      "the prefilter must drop non-colliding probe rows before the join")
    // and the full prefiltered pipeline equals the plain join on this build
    val viaBloom = WorkloadProfiling.bloomPrefilteredProbe(ev, build)
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    val plain = purchases.join(build, col("user_id") === col("err_user"))
      .select(col("event_id")).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == plain)
    // and the bucket semi-join broadcasts — never shuffles the probe
    val plan = graft.SparkEntry.queries("bloom_prefilter_join")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), "bucket prefilter must be a broadcast join")
  }

  test("skew_audit's top-20 plans as TakeOrdered, never a global sort of the key space") {
    val plan = graft.SparkEntry.queries("skew_audit")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected a per-partition top-k heap, got:\n$plan")
  }

  test("watermark drops late data in append-mode streaming aggregation") {
    import java.nio.file.{Files, Paths}
    // two files processed as two micro-batches: the second contains an
    // event far earlier than the first batch's max ts - watermark
    val dir = Files.createTempDirectory("graft-late")
    val s = spark
    import s.implicits._
    Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 12:00:00"))
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(dir.resolve("f1").toString)
    Seq((3L, "2024-01-01 08:00:00")) // 4h late vs batch-1 watermark (12:00 - 10min)
      .toDF("id", "t").withColumn("ts", col("t").cast("timestamp")).drop("t")
      .coalesce(1).write.parquet(dir.resolve("f2").toString)
    val stage = Files.createTempDirectory("graft-late-in")
    Files.list(dir.resolve("f1")).filter(_.toString.endsWith(".parquet"))
      .forEach(p => Files.copy(p, stage.resolve("a_" + p.getFileName)))
    val stream = spark.readStream
      .schema("id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(stage.toString)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("ws"), col("n"))
    val q = stream.writeStream.format("memory").queryName("late_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable() // batch 1: watermark advances to 11:50
      Files.list(dir.resolve("f2")).filter(_.toString.endsWith(".parquet"))
        .forEach(p => Files.copy(p, stage.resolve("b_" + p.getFileName)))
      q.processAllAvailable() // batch 2: 08:00 event is behind the watermark
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("late_test").select("ws").collect().map(_.getLong(0)).toSet
    val late = java.time.Instant.parse("2024-01-01T08:00:00Z").getEpochSecond
    assert(!emitted.contains(late), s"late event's window must be dropped, got $emitted")
  }

  test("persisted ANN index: probe equals fused ivf-pq; bucketed codes never reshuffle") {
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
    // probe builds the index on first use, then reads only the tables
    val probe = SparkEntry.queries("ann_index_probe")(spark, sf)
    val fused = SparkEntry.queries("ann_ivf_pq")(spark, sf)
    assert(rows(probe) == rows(fused), "persisted index must be lossless")
    // the code table's bucket key is the probe join/agg key: clustering
    // comes from the bucketed scan, not an Exchange
    val codes = Storage.table(spark, s"graft_ann_codes_${math.abs(sf.hashCode)}")
    assert(!Storage.hasShuffle(codes.groupBy(col("vec_id")).agg(count(lit(1)))),
      "bucketed code table must satisfy vec_id clustering without a shuffle")
  }

  test("hybrid_search_rrf_indexed equals the brute-force fusion on a clustered corpus") {
    // On data whose clusters are REAL the IVF-pruned dense list is
    // lossless: the probe's own cell holds its entire cosine top-20, so
    // the indexed fusion must reproduce the brute-force fusion row for
    // row. (On the driver's near-unclustered gate embeddings the two
    // variants legitimately differ — that's the IVF recall trade, and
    // each variant is oracle-gated separately.)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid-idx").toString
    (0 until 60).map { i =>
      val text =
        if (i % 3 == 0) s"spark window join doc$i filler words here append"
        else s"doc$i plain filler words with no query terms at all"
      (i.toLong, text)
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // 10 orthogonal clusters (label l lives on dims 6l..6l+5); the
    // probe's cluster gets 30 members so the whole top-20 is in-cell
    (0 until 200).map { id =>
      val lab = if (id >= 90 && id < 120) 0 else id % 9 + 1
      val e = Array.tabulate(64) { d =>
        val base = if (d / 6 == lab) 5.0f else 0.0f
        base + ((id * 31 + d) % 7 - 3) * 0.001f
      }
      (id.toLong, e, lab)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def rows(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq
    assert(rows("hybrid_search_rrf_indexed") == rows("hybrid_search_rrf"),
      "indexed fusion must be lossless on a genuinely clustered corpus")
  }

  test("LSH band-bucket cap bounds a planted mega-bucket; dropped mass is accounted") {
    // 500 byte-identical docs saturate ONE bucket in every SimHash byte
    // band and every MinHash band (the boilerplate blow-up: candidate
    // pairs would be C(500,2) = 124,750 per band). With the cap the
    // pair queries must skip that bucket entirely and still report the
    // 5 planted small clusters; dedup_band_stats must account the
    // skipped mass. Without the cap this corpus is the exact profile
    // that grew dedup_simhash_pairs ~quadratically at sf1.
    import spark.implicits._
    val mega = (0 until 500).map(i =>
      (i.toLong, "the big boilerplate banner text repeated across every page of the site"))
    val smallPairs = (0 until 5).flatMap { c =>
      // fully disjoint token sets per cluster — clusters sharing 9 of
      // 10 tokens would legitimately pair across clusters (hamming <=2)
      val text = (0 until 10).map(j => s"c${c}tok$j").mkString(" ")
      Seq((1000L + 2 * c, text), (1001L + 2 * c, text))
    }
    val unique = (0 until 50).map(i =>
      (2000L + i, (0 until 10).map(j => s"u${i}w$j").mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-megabucket").toString
    (mega ++ smallPairs ++ unique).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val pairs = SparkEntry.queries("dedup_simhash_pairs")(spark, dir).collect()
    assert(pairs.length == 5,
      s"capped pair graph must keep exactly the 5 small clusters, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(0) >= 1000L && r.getLong(1) == r.getLong(0) + 1),
      "surviving pairs must be the planted small clusters")

    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, dir).collect()
    assert(lsh.length == 5 && lsh.forall(_.getDouble(2) == 1.0),
      s"minhash cap must keep only the 5 identical small pairs, got ${lsh.length}")

    val stats = SparkEntry.queries("dedup_band_stats")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    val sim = stats.filter(_._1 == "simhash")
    assert(sim.length == 4)
    // every band holds the 500-doc bucket: 4 × C(500,2) pairs avoided
    // >= 500: a band's mega bucket may absorb the odd unique doc whose
    // simhash byte happens to coincide — the cap drops it with the rest
    assert(sim.forall { case (_, _, maxB, capped, dropped, avoided) =>
      maxB >= 500L && capped >= 1L && dropped >= 500L && avoided >= 124750L },
      s"simhash stats must account the mega-bucket per band: ${sim.mkString(", ")}")
    val mh = stats.filter(_._1 == "minhash")
    assert(mh.forall { case (_, _, maxB, _, dropped, avoided) =>
      maxB >= 500L && dropped >= 500L && avoided >= 124750L },
      s"minhash stats must account the mega-bucket per band: ${mh.mkString(", ")}")
  }

  test("dropCheckpointStats: leaf estimate stays constant across 12 squaring checkpoint rounds") {
    // The CC loop's failure mode (r12 century probe, sf100): each
    // round's self-join SQUARES the previous checkpoint's INHERITED
    // sizeInBytes estimate, growing it doubly-exponentially until the
    // BigInteger behind SizeInBytesOnlyStatsPlanVisitor overflows.
    // Pin the fix's contract — a Spark upgrade that changes
    // LogicalRDD.rewriteStatsAndConstraints must trip this, not sf100.
    import org.apache.spark.sql.graftbridge.PlanBridge
    def ckpt(df: org.apache.spark.sql.DataFrame) =
      PlanBridge.dropCheckpointStats(df.localCheckpoint())
    var cur = ckpt(spark.range(200).toDF("id"))
    val leafEstimate = cur.queryExecution.optimizedPlan.stats.sizeInBytes
    for (_ <- 1 to 12) {
      val nxt = cur.as("a").join(cur.as("b"), col("a.id") === col("b.id"))
        .select(col("a.id"))
      val prev = cur
      cur = ckpt(nxt)
      graft.queries.Memo.unpersistCheckpoint(prev)
      assert(cur.queryExecution.optimizedPlan.stats.sizeInBytes == leafEstimate,
        "re-leafed checkpoint estimate must be the constant default, every round")
    }
    assert(cur.count() == 200)
    graft.queries.Memo.unpersistCheckpoint(cur)
    // differential premise: the RAW checkpoint chain INHERITS the join
    // estimate and compounds it — each round's self-join multiplies the
    // previous inherited size, so three rounds must grow strictly
    var raw = spark.range(200).toDF("id").localCheckpoint()
    var prevSz = raw.queryExecution.optimizedPlan.stats.sizeInBytes
    for (round <- 1 to 3) {
      val nxt = raw.as("a").join(raw.as("b"), col("a.id") === col("b.id"))
        .select(col("a.id")).localCheckpoint()
      val sz = nxt.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(sz > prevSz,
        s"raw checkpoint round $round should inherit a compounding estimate ($prevSz -> $sz)")
      prevSz = sz
      graft.queries.Memo.unpersistCheckpoint(raw)
      raw = nxt
    }
    graft.queries.Memo.unpersistCheckpoint(raw)
  }

  test("dropCheckpointStats: no auto-broadcast from default leaf stats; an explicit hint still broadcasts") {
    // VERDICT r12 item 4: the re-leafed checkpoint carries the DEFAULT
    // leaf estimate, which is LARGE — so a genuinely tiny checkpointed
    // frame will never auto-broadcast. Pin both halves: (a) the planner
    // does not broadcast the dropped-stats side on its own (today's
    // behavior — consumers relying on auto-broadcast would silently
    // shuffle), and (b) an explicit broadcast() hint on the dropped
    // frame still produces a BroadcastHashJoin, so any consumer that
    // NEEDS the tiny-side broadcast can pin it. The CC loop itself
    // wants large-large sort-merge rounds, so (a) is the desired
    // default there.
    import org.apache.spark.sql.graftbridge.PlanBridge
    val tiny = PlanBridge.dropCheckpointStats(
      spark.range(8).toDF("k").localCheckpoint())
    assert(tiny.queryExecution.optimizedPlan.stats.sizeInBytes ==
      spark.sessionState.conf.defaultSizeInBytes,
      "dropped-stats leaf must report the session default size")
    // the probe side must itself be above the broadcast threshold by
    // stats (range of 2M longs ~ 16 MB > the 10 MB default), else the
    // planner just broadcasts IT instead and the assertion is vacuous
    val big = spark.range(2000000).toDF("k")
    val auto = big.join(tiny, "k")
    assert(!auto.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"),
      "default-stats leaf must not auto-broadcast (it reports the default size)")
    val hinted = big.join(broadcast(tiny), "k")
    assert(hinted.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"),
      "an explicit broadcast hint must survive dropCheckpointStats")
    assert(hinted.count() == 8)
    graft.queries.Memo.unpersistCheckpoint(tiny)
  }
}
