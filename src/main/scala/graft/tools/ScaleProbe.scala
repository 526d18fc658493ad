package graft.tools

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 absolute-threshold probe — now over the ENTIRE query registry.
  *
  * The winnowing lesson (round 7): a cutoff that passes at sf0.01 can
  * go DARK a decade up (fixed df cutoffs, saturating char-gram
  * vocabularies). And the round-8 lesson: probing only the 15 heaviest
  * queries misses growth pathologies elsewhere (dedup_simhash_pairs
  * grew ~quadratically and only the probe showed it). This main probes
  * the next decade above the bench scale for every registered query:
  *
  *  - documents/embeddings/events are GENERATED at 10× the sf0.1 bench
  *    shape (50k docs, 20k vectors, 1M events over 15k users — same
  *    statistical profile as the driver's synthetic tables: 31-word
  *    vocabulary, 20 sources, ~5% perturbed near-dup copies, labelled
  *    Gaussian embedding clusters with planted near-identical pairs,
  *    5 uniform event types with 30-day uniform timestamps and the
  *    same ~66-events-per-user density);
  *  - the TPC-H star tables are symlinked from the sf0.1 bench corpus
  *    (their tier has no absolute thresholds and faithful sf1 TPC-H
  *    generation belongs to the driver, not this probe) — the artifact
  *    records the split.
  *
  * Every query materializes its FULL output rows (toRdd.count — a
  * plain count() would let Catalyst prune expensive final projections)
  * with wall time, checked against a prior artifact's per-query budget
  * and row band; rows == 0 where a query is expected to produce output
  * means an absolute threshold is hiding in it.
  *
  * Usage: runMain graft.tools.ScaleProbe [outDir] [artifact.json] [baseline.json]
  */
object ScaleProbe {

  private val Vocab = Array(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window")
  private val Langs = Array("de", "en", "es", "fr", "zh")
  private val EventTypes = Array("signup", "click", "purchase", "error", "view")

  /** Deterministic uniform in [0, n) from md5 of the tag. */
  private def h(tag: String, n: Int): Int = {
    val d = MessageDigest.getInstance("MD5").digest(tag.getBytes("UTF-8"))
    val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    (v % n).toInt
  }

  private def docText(id: Long): String = {
    val n = 10 + h(s"len:$id", 91) // 10..100 words, like the driver corpus
    // UNIFORM word draw — the driver corpus is flat (every vocab word
    // ~equal count at sf0.1); a skewed draw concentrates simhashes and
    // explodes the pair queries into a profile the real data doesn't have
    (0 until n).map(i => Vocab(h(s"w:$id:$i:a", Vocab.length))).mkString(" ")
  }

  def generate(spark: SparkSession, dir: String, nDocs: Long, nVecs: Long,
      nEvents: Long): Unit = {
    import spark.implicits._
    def missing(table: String) = !new java.io.File(s"$dir/$table.parquet").exists()
    if (missing("documents")) {
    val docs = spark.range(nDocs).map { id =>
      // ~5% of docs are a near-duplicate of their predecessor: same
      // text with the final word swapped (high-Jaccard planted pairs,
      // the profile minhash/simhash/winnowing feed on)
      val base = if (id % 20 == 1) {
        val prev = docText(id - 1).split(' ')
        prev.init.mkString(" ") + " " + Vocab(h(s"swap:$id", Vocab.length))
      } else docText(id)
      (id, base, Langs(h(s"lang:$id", Langs.length)),
        s"src${h(s"src:$id", 20)}", base.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    }

    if (missing("embeddings")) {
    val vecs = spark.range(nVecs).map { id =>
      val label = h(s"lab:$id", 10)
      def dim(vid: Long, i: Int): Float = {
        val lab = h(s"lab:$vid", 10)
        val centroid = (h(s"c:$lab:$i", 2001) - 1000) / 500.0f
        centroid + (h(s"e:$vid:$i", 2001) - 1000) / 1000.0f
      }
      // planted near-identical pairs for embedding_neardup
      val e =
        if (id % 50 == 1) (0 until 64).map(i => dim(id - 1, i) + 0.001f).toArray
        else (0 until 64).map(i => dim(id, i)).toArray
      (id, e, label)
    }.toDF("vec_id", "embedding", "label")
    vecs.repartition(8).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    }

    if (missing("events")) {
    // events at the driver's per-user density (~66 events/user): both
    // axes scale together, so per-user/per-item rates — what the
    // blacklist/burst/session thresholds key on — match the bench corpus
    val nUsers = (nEvents / 66).max(100)
    val t0 = 1704067200L // 2024-01-01T00:00:00Z, like the driver data
    val events = spark.range(nEvents).map { id =>
      val ts = t0 + h(s"ts:$id", 30 * 24 * 3600).toLong
      // value is EXPONENTIAL (mean 50), like the driver's: measured
      // sf0.1 stats are mean 49.9 / std 49.6 / max 560 — a uniform draw
      // here has max z-score 1.73 and silently blanks every 3-sigma
      // query (outlier_events went dark on the round-9 probe's first
      // uniform-valued corpus)
      val u = (h(s"v:$id", 1000000) + 1) / 1000001.0
      (id,
        new java.sql.Timestamp(ts * 1000L),
        h(s"u:$id", nUsers.toInt).toLong,
        EventTypes(h(s"et:$id", EventTypes.length)),
        math.rint(-50.0 * math.log(u) * 100) / 100.0,
        s"""{"k": ${h(s"k:$id", 100)}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.repartition(32).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")
    }
  }

  /** Deterministic SCALED relational star tables (VERDICT r15 item 5:
    * the TPC-H/join tier had no growth measurement — every probe scale
    * symlinked the sf0.1 tables). Mirrors the driver corpus's measured
    * sf0.1 marginals with the same profile-only-n-moves discipline the
    * document/event generator uses:
    *  - row counts scale with `mult` (sf0.1 × mult): orders 150k,
    *    lineitem 600k, customer 15k, supplier 1k, part 20k;
    *  - every foreign key draws uniformly over its scaled parent range,
    *    so per-key fan-outs are scale-invariant (orders/customer 10,
    *    lineitem/order ~4 Poisson-like via independent draws — the
    *    measured sf0.1 profile has per-order counts 1..17 with
    *    l_linenumber uniform 1..7, i.e. independent line draws, which
    *    is exactly what this reproduces);
    *  - value marginals match the measured data: o_totalprice uniform
    *    1000..500000 (2dp), dates uniform over 1995-01-01..2001-08-01
    *    (orders) / +95d tail (shipdate, uncorrelated with the order
    *    date — measured datediff spans ±2400d, independent draws),
    *    uniform thirds/fifths for the categorical columns, the 8×8
    *    adjective×noun part vocabulary, Brand#1..25, 6 types.
    * nation/region stay symlinked — TPC-H holds them CONSTANT at every
    * scale factor by definition.
    * Timestamps are written as LocalDateTime (TIMESTAMP_NTZ), matching
    * the driver parquet the readers branch on.
    */
  def generateRelational(spark: SparkSession, dir: String, mult: Int): Unit = {
    import spark.implicits._
    def missing(table: String) = !new java.io.File(s"$dir/$table.parquet").exists()
    new java.io.File(dir).mkdirs()
    val day0 = java.time.LocalDate.of(1995, 1, 1)
    def dayTs(off: Int): java.time.LocalDateTime = day0.plusDays(off.toLong).atStartOfDay()
    val nOrders = 150000L * mult
    val nCust = 15000L * mult
    val nSupp = 1000L * mult
    val nPart = 20000L * mult
    val nLine = 600000L * mult

    if (missing("orders")) {
      val status = Array("F", "O", "P")
      val prio = Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      spark.range(nOrders).map { id =>
        (id, h(s"oc:$id", nCust.toInt).toLong, status(h(s"os:$id", 3)),
          (100000L + h(s"op:$id", 49900001)) / 100.0,
          dayTs(h(s"od:$id", 2404)), prio(h(s"opr:$id", 5)))
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
        .repartition(32).write.mode("overwrite").parquet(s"$dir/orders.parquet")
    }

    if (missing("lineitem")) {
      val rf = Array("A", "N", "R")
      val ls = Array("F", "O")
      spark.range(nLine).map { id =>
        (h(s"lo:$id", nOrders.toInt).toLong, h(s"lp:$id", nPart.toInt).toLong,
          h(s"lsup:$id", nSupp.toInt).toLong, 1 + h(s"ln:$id", 7),
          (1 + h(s"lq:$id", 50)).toDouble,
          (90000L + h(s"lep:$id", 10410001)) / 100.0,
          h(s"ld:$id", 11) / 100.0, h(s"lt:$id", 9) / 100.0,
          rf(h(s"lrf:$id", 3)), ls(h(s"lls:$id", 2)),
          dayTs(1 + h(s"lsd:$id", 2498)))
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
        .repartition(32).write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    }

    if (missing("customer")) {
      val seg = Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      spark.range(nCust).map { id =>
        (id, f"Customer#$id%09d", h(s"cn:$id", 25),
          (-100000L + h(s"ca:$id", 1100001)) / 100.0, seg(h(s"cs:$id", 5)))
      }.toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .repartition(8).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    }

    if (missing("supplier")) {
      spark.range(nSupp).map { id =>
        (id, f"Supplier#$id%09d", h(s"sn:$id", 25),
          (-100000L + h(s"sa:$id", 1100001)) / 100.0)
      }.toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
        .repartition(4).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    }

    if (missing("part")) {
      val adjs = Array("blue", "cold", "hot", "large", "new", "old", "red", "small")
      val nouns = Array("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
      val types = Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
      spark.range(nPart).map { id =>
        (id, s"${adjs(h(s"pa:$id", 8))} ${nouns(h(s"pn:$id", 8))}",
          s"Brand#${1 + h(s"pb:$id", 25)}", types(h(s"pt:$id", 6)),
          1 + h(s"ps:$id", 50), (9000L + h(s"pp:$id", 1000)) / 10.0)
      }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .repartition(8).write.mode("overwrite").parquet(s"$dir/part.parquet")
    }

    // constant-size tables + the events corpus the asof/band-join
    // probes grow on (generated separately at the matching scale)
    for ((t, src) <- Seq(
        "region" -> "/root/testdata/sf0.1/region.parquet",
        "nation" -> "/root/testdata/sf0.1/nation.parquet")) {
      val link = java.nio.file.Paths.get(s"$dir/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(
          link, java.nio.file.Paths.get(src))
    }
  }

  /** Symlink the TPC-H star tables from the sf0.1 bench corpus. */
  def linkRelational(dir: String): Unit = {
    val src = "/root/testdata/sf0.1"
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .foreach { t =>
        val link = java.nio.file.Paths.get(s"$dir/$t.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(
            link, java.nio.file.Paths.get(s"$src/$t.parquet"))
      }
  }

  /** Queries whose empty result is legitimate on this corpus, with the
    * reason recorded in the artifact (everything else must emit rows).
    */
  private val EmptyOk: Map[String, String] = Map()

  /** Per-query expectations from a PRIOR committed probe artifact —
    * "alive" alone missed superlinearity until a human read the slow
    * list (VERDICT r9 item 7), so each query now carries a BUDGET
    * (3× its recorded time + a 5 s floor, wide enough for the 1.5-2×
    * ambient host variance, tight enough that quadratic growth at the
    * next corpus change fails loudly) and a ROW BAND (±25% of recorded
    * rows + a small absolute floor; the corpus is deterministic, so
    * real drift means a semantic change). Queries absent from the
    * baseline are recorded as baseline="new" with no verdict.
    */
  /** (entries, baseline timed with toRdd?). Budgets HARD-fail only
    * against a same-methodology baseline: this probe times full output
    * materialization (toRdd), so against an older count()-timed
    * artifact — where output-heavy queries timed only their grouping
    * skeleton — breaches are recorded as "rebase" rather than failing
    * the run, and this run's artifact (marked "timing":"toRdd")
    * becomes the first hard-budget baseline.
    */
  /** (rows, wallSec, cpuSec — NaN when the baseline predates cpu
    * recording).
    */
  private def loadBaseline(path: String): (Map[String, (Long, Double, Double)], Boolean) = {
    val f = new java.io.File(path)
    if (!f.exists()) (Map.empty, false)
    else {
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      // entries may carry trailing fields (budget_sec/rows_exp/... in
      // budgeted artifacts) — match the (rows, sec[, cpu_sec]) prefix only
      val Re = """"([A-Za-z0-9_]+)":\{"rows":(-?\d+),"sec":([0-9.]+)(,"cpu_sec":([0-9.]+))?[,}]""".r
      (Re.findAllMatchIn(txt)
        .map(m => m.group(1) -> ((m.group(2).toLong, m.group(3).toDouble,
          Option(m.group(5)).map(_.toDouble).getOrElse(Double.NaN)))).toMap,
        txt.contains(""""timing":"toRdd""""))
    }
  }

  private def budgetSec(baseSec: Double): Double = math.max(5.0, 3.0 * baseSec)

  /** Wall-fallback budget (baseline has no cpu_sec, i.e. pre-r11):
    * wall on this host carries a documented 1.5-10x multiplicative
    * ambient band, so a sub-10s absolute wall breach against a 2s
    * quiet-host baseline is indistinguishable from weather — three
    * consecutive r11 runs each minted exactly one such marginal breach
    * on a DIFFERENT untouched relational query (6.1/7.4/5.5s vs 5.4-6.6s
    * budgets) while the other two passed. The floor rises to 10s for
    * this path only; every pathology this probe has ever caught (21s,
    * 192s) is far past it, and cpu-carrying baselines (r11 onward)
    * keep the tight 5s floor on the contention-immune metric.
    */
  private def wallBudgetSec(baseSec: Double): Double = math.max(10.0, 3.0 * baseSec)

  /** Named methodology changes: queries whose output shape or
    * steady-state cost legitimately moved because their SOURCE changed
    * this round, declared here BEFORE the run with the change named.
    * Their budget/row verdicts are reported as "rebaselined(<reason>)"
    * instead of failing, and this artifact's numbers become their new
    * baseline. This is the only sanctioned bypass of hard mode — an
    * UNDECLARED breach still fails the run — so budgets can never
    * silently absorb drift, and the artifact enumerates exactly what
    * was reset and why.
    */
  private val Rebaselined: Map[String, String] = Map(
    // r12/r13: empty — every shape change stayed inside the old row
    // bands and budgets, so the queries faced the real checks.
    "winnowing_pairs_exact" -> ("r14 sized rescue rule: the exact " +
      "fidelity twin now reports 2-anchor pairs on <=3-fingerprint " +
      "docs — including the mixed-length containment pairs the MOSS " +
      "floor dropped — so its sf1 rows moved 2,922 -> 3,778 (+29%), " +
      "just past the +/-25% band; DuckDB-hash-exact at sf10 " +
      "(SCALE_ORACLE_sf10_r14) and recall-gated (WINNOW_RECALL_r14); " +
      "cpu 77 s vs its 252 s budget, so only the ROW band is declared")
  )

  private def rowsOk(rows: Long, expected: Long): Boolean =
    math.abs(rows - expected) <= math.max(2L, (0.25 * expected).toLong)

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("testdata_sf1")
    val artifact = args.drop(1).headOption.getOrElse("SCALE_r11.json")
    val baselinePath = args.drop(2).headOption.getOrElse("SCALE_r10.json")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(s"[probe] ensuring sf1 corpus under $out ...")
    generate(spark, out, nDocs = 50000L, nVecs = 20000L, nEvents = 1000000L)
    linkRelational(out)

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
    val (baseline, baselineComparable) = loadBaseline(baselinePath)
    if (baseline.nonEmpty && !baselineComparable)
      println(s"[probe] NOTE: $baselinePath predates toRdd timing — budget " +
        "breaches recorded as 'rebase', not failures; this artifact rebaselines")
    if (baseline.isEmpty)
      println(s"[probe] NOTE: no baseline at $baselinePath — all queries recorded as new")

    // toRdd.count(), NOT Dataset.count(): count() lets Catalyst prune
    // every output column, so a query ending in an expensive projection
    // (regex scrub, array math) times only its grouping skeleton;
    // toRdd materializes the full output rows — what a real consumer
    // pays — and still returns the row count for the band check.
    // Each run also brackets executor CPU time: wall carries the
    // host's 1.5-10x ambient co-tenancy error bar, cpu does not, so
    // once a baseline carries cpu_sec the budget verdict runs on cpu.
    val meter = new CpuMeter(spark)
    def timedRun(q: graft.queries.GraftQuery): (Long, Double, Double) = {
      val cpu0 = meter.snapshot()
      val t0 = System.nanoTime()
      val rows =
        try q.run(spark, out).queryExecution.toRdd.count()
        catch { case e: Throwable =>
          println(s"[probe] ${q.name} FAILED: ${e.getMessage}"); -1L }
      (rows, (System.nanoTime() - t0) / 1e9, meter.snapshot() - cpu0)
    }
    val results = graft.SparkEntry.all.map { q =>
      var (rows, sec, cpu) = timedRun(q)
      // cpu-first budget check: against a cpu-carrying baseline the
      // budget is on executor CPU (ambient contention cannot false-
      // fail it); against an older wall-only baseline it stays on wall
      def budgetBad(w: Double, c: Double) =
        !Rebaselined.contains(q.name) && baseline.get(q.name).exists {
          case (_, bSec, bCpu) =>
            if (!bCpu.isNaN) c > budgetSec(bCpu) else w > wallBudgetSec(bSec)
        }
      // one retry on a budget breach: the host shows multi-second
      // contention windows that inflate random queries 5-10×; a breach
      // that reproduces twice is growth, once is weather. Acceptance is
      // keyed on the GATING metric (cpu against a cpu-carrying
      // baseline, wall otherwise) — accepting on wall while gating on
      // cpu lets a retry fail to clear a false cpu breach, or swap in
      // a worse cpu sample. BOTH samples are recorded (sec/sec_first,
      // cpu/cpu_first) so the asymmetric best-of-2 can't silently
      // ratchet rebased budgets tighter.
      var secFirst = Double.NaN
      var cpuFirst = Double.NaN
      if (rows >= 0 && budgetBad(sec, cpu)) {
        val gateOnCpu = baseline.get(q.name).exists(b => !b._3.isNaN)
        val (r2, s2, c2) = timedRun(q)
        if (r2 >= 0 && (if (gateOnCpu) c2 < cpu else s2 < sec)) {
          secFirst = sec; cpuFirst = cpu; rows = r2; sec = s2; cpu = c2
        }
      }
      val verdict = baseline.get(q.name) match {
        case None => "new"
        case _ if Rebaselined.contains(q.name) =>
          s"rebaselined(${Rebaselined(q.name)})"
        case Some((bRows, bSec, bCpu)) =>
          val onCpu = !bCpu.isNaN
          val (got, bud) =
            if (onCpu) (cpu, budgetSec(bCpu)) else (sec, wallBudgetSec(bSec))
          val metric = if (onCpu) "cpu" else "wall"
          val b =
            if (got <= bud) ""
            else if (baselineComparable) s" BUDGET $metric ${fmt(got)}s > ${fmt(bud)}s"
            else s" rebase($metric ${fmt(got)}s > ${fmt(bud)}s count-timed)"
          val r = if (rows >= 0 && rowsOk(rows, bRows)) "" else s" ROWS $rows vs $bRows"
          if (b.isEmpty && r.isEmpty) "ok" else (b + r).trim
      }
      println(f"[probe] ${q.name}%-32s rows=$rows%10d  ${sec}%7.1f s  cpu=${cpu}%7.1f s  [$verdict]")
      (q.name, rows, sec, verdict, cpu, secFirst, cpuFirst)
    }
    val dark = results.filter(r => r._2 == 0 && !EmptyOk.contains(r._1))
    val failed = results.filter(_._2 < 0)
    val budgetFail = results.filter(_._4.contains("BUDGET"))
    val rebase = results.filter(_._4.contains("rebase"))
    val rowsFail = results.filter(_._4.contains("ROWS"))
    val qjson = results.map { case (n, r, s, v, c, sFirst, cFirst) =>
      val (bRows, bSec, bCpu) = baseline.getOrElse(n, (-1L, -1.0, Double.NaN))
      val retried = (if (sFirst.isNaN) "" else s""","sec_first":${fmt(sFirst)}""") +
        (if (cFirst.isNaN) "" else s""","cpu_first":${fmt(cFirst)}""")
      val extra =
        if (v == "new") s""","baseline":"new""""
        else {
          val bud = if (!bCpu.isNaN) budgetSec(bCpu) else wallBudgetSec(bSec)
          val metric = if (!bCpu.isNaN) "cpu" else "wall"
          s""","budget_sec":${fmt(bud)},"budget_metric":"$metric","budget_ok":${!v.contains("BUDGET")},"rows_exp":$bRows,"rows_ok":${!v.contains("ROWS")}"""
        }
      s""""$n":{"rows":$r,"sec":${fmt(s)},"cpu_sec":${fmt(c)}$retried$extra}""" }.mkString("{", ",", "}")
    val mode = if (baselineComparable) "hard" else "rebase-allowed"
    val json =
      s"""{"probe":"full-registry sf1 (budgeted)","timing":"toRdd","mode":"$mode",
         |"corpus":"documents 50k / embeddings 20k / events 1M generated at 10x the sf0.1 shape; TPC-H star tables symlinked from sf0.1 (no absolute thresholds in that tier)",
         |"baseline":"$baselinePath (budget = max(5s, 3x recorded cpu_sec) on executor CPU where the baseline has it; max(10s, 3x recorded sec) on wall against a pre-r11 cpu-less baseline — the wall floor is wider because wall carries the documented 1.5-10x ambient band; rows band = +-25%; sec_first discloses the pre-retry sample on budget-breach retries)",
         |"rebase":${rebase.map("\"" + _._1 + "\"").mkString("[", ",", "]")},
         |"rebaselined":${results.filter(r => Rebaselined.contains(r._1)).map(r => s""""${r._1}":"${Rebaselined(r._1)}"""").mkString("{", ",", "}")},
         |"nqueries":${results.size},"dark":${dark.map("\"" + _._1 + "\"").mkString("[", ",", "]")},
         |"failed":${failed.map("\"" + _._1 + "\"").mkString("[", ",", "]")},
         |"budget_fail":${budgetFail.map("\"" + _._1 + "\"").mkString("[", ",", "]")},
         |"rows_fail":${rowsFail.map("\"" + _._1 + "\"").mkString("[", ",", "]")},
         |"total_sec":${fmt(results.map(_._3).sum)},"total_cpu_sec":${fmt(results.map(_._5).sum)},
         |"queries":$qjson}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val bad = dark.nonEmpty || failed.nonEmpty || budgetFail.nonEmpty || rowsFail.nonEmpty
    println(if (!bad)
      s"[probe] PASS: all ${results.size} queries alive + within budget/row band -> $artifact"
    else s"[probe] DARK: ${dark.map(_._1).mkString(",")} FAILED: ${failed.map(_._1).mkString(",")} " +
      s"BUDGET: ${budgetFail.map(_._1).mkString(",")} ROWS: ${rowsFail.map(_._1).mkString(",")} -> $artifact")
    spark.stop()
  }
}
