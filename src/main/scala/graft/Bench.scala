package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is fully materialized through the `noop` sink (all
  * output columns computed, nothing collected to the driver — unlike
  * count(), which would let Catalyst prune expensive output
  * expressions). Queries run in three round-robin passes (memo
  * registry reset at each pass boundary) and each reports its fastest
  * sample, so the numbers reflect steady-state plan execution rather
  * than JIT / first-scan warmup — with each pass paying every
  * memoized build exactly once inside its registered *_build /
  * first-consumer entry.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Non-integer values (e.g. "*" for local[*]) are valid Spark
    // masters but would interpolate as unparseable bare JSON into the
    // "cpus" stamp below, silently breaking the driver parse for the
    // whole run — resolve them to the machine's core count instead.
    val cpusRaw = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val cpus = cpusRaw.toIntOption
      .getOrElse(Runtime.getRuntime.availableProcessors).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // wall AND executor-CPU per query: wall carries the host's
    // documented 1.5-10x ambient co-tenancy error bar, cpu does not —
    // the regression gate (tools/bench_compare.py) evaluates cpu
    // first, wall second
    val meter = new graft.tools.CpuMeter(spark)

    // Measurement-condition stamps (VERDICT r12 item 3: BENCH_r12's
    // cpu_total moved +46% round-over-round with flat wall and no
    // per-query regression on the pinned config — an unattributed
    // ambient delta). The artifact now carries enough to attribute one:
    // the 1-min load average at start/end brackets the host's ambient
    // co-tenancy window, process CPU totals the WHOLE JVM (GC, planning,
    // page-fault kernel time — everything executor-CPU excludes), and
    // the pretouch flag records whether the heap was faulted in at
    // startup (outside every timed region) or lazily during the run.
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def loadAvg: Double =
      math.max(0.0, osBean.getSystemLoadAverage) // -1 when unavailable
    def processCpuSec: Double = osBean.getProcessCpuTime / 1e9
    val loadStart = loadAvg
    val processCpuStart = processCpuSec
    val pretouch = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.contains("-XX:+AlwaysPreTouch")
    def once(name: String): (Double, Double) = {
      val cpu0 = meter.snapshot()
      val t0 = System.nanoTime()
      val elapsed =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
      val cpu = if (elapsed < 0) -1.0 else meter.snapshot() - cpu0
      // OUTSIDE the timed window: queries may cache intermediates
      // (e.g. the LSH shingle exchange); drop them so no query's
      // timing pays for another's leftover blocks or eviction churn —
      // or for its own teardown
      spark.catalog.clearCache()
      (elapsed, cpu)
    }

    // session warmup: JIT the scan/agg/codegen paths once
    once("q3_pv_hourly")

    // SPARK_GRAFT_ONLY=a,b,c limits the run for local iteration; the
    // driver never sets it, so its runs always cover everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.all)(s => SparkEntry.all.filter(q => s(q.name)))

    // best-of-3 sampled ROUND-ROBIN (three full passes over the list,
    // not three back-to-back runs per query): the host shows
    // multi-second I/O-stall windows that cluster in time — consecutive
    // sampling lets one window poison every sample of one query, while
    // pass-interleaving spreads a window across different queries and
    // the per-query minimum stays a clean steady-state estimate.
    // The memo registry (shared pair graph / MinHash index / PQ model /
    // quality gate) resets at every pass boundary so each pass pays
    // each build exactly once, inside its registered *_build /
    // first-consumer entry — without the reset the one sample that paid
    // a build was discarded by min() and the build cost appeared in NO
    // pinned number (VERDICT r9 finding 1)
    val samples = Seq.fill(3) {
      graft.queries.Memo.reset()
      selected.map(q => q.name -> once(q.name))
    }.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // wall and cpu each take their own best-of-3 minimum: both are
    // steady-state estimators (rep1 pays scan/JIT/memo-build in BOTH
    // metrics), and min() is the right noise filter for each
    val results = selected.map { q =>
      val runs = samples(q.name)
      val best =
        if (runs.exists(_._1 < 0)) (-1.0, -1.0)
        else (runs.map(_._1).min, runs.map(_._2).min)
      q.name -> best
    }
    // 3-decimal (millisecond) precision: full-precision doubles push
    // the JSON line past the driver's stdout tail buffer, and a
    // front-truncated line parses as null (BENCH_r02/r03)
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._1) }
      .mkString("{", ",", "}")
    val qsCpu = results.map { case (k, v) => "\"" + k + "\":" + fmt(v._2) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val cpuTotal = results.map(_._2._2).filter(_ >= 0).sum
    // failed queries report -1 per-query AND a failure count: a broken
    // query must not make the total look faster
    val failed = results.count(_._2._1 < 0)
    // "queries" stays the WALL map (the driver's parse contract);
    // "queries_cpu" is the contention-immune twin the gate prefers
    // "cpus" stamps the thread config: the SAME binary at local[32]
    // measures ~4x the aggregate executor CPU of local[4] on sf0.1's
    // micro-tasks (pure 32-way contention), so cross-config comparisons
    // are meaningless — bench_compare refuses them when both artifacts
    // carry the stamp
    // conditions: pretouch + loadavg bracket + whole-process CPU. When
    // cpu_total (sum of per-query EXECUTOR cpu minima) moves between
    // rounds, cpu_process vs cpu_total separates "the queries got
    // slower" from "the JVM spent more outside tasks" and the load
    // bracket separates both from "the host was louder".
    val conditions =
      s""""pretouch":$pretouch,"load_start":${fmt(loadStart)},"load_end":${fmt(loadAvg)},"cpu_process":${fmt(processCpuSec - processCpuStart)}"""
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"cpu_total":${fmt(cpuTotal)},"cpus":$cpus,$conditions,"queries":$qs,"queries_cpu":$qsCpu,"sf":"$sfDir"}"""
    // Belt and braces for the driver's parse: the JSON goes to stdout
    // AND to bench_out.json (an unparseable stdout line — sbt chrome,
    // interleaved WARNs — is otherwise indistinguishable from a
    // missing bench).
    java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_out.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    // The driver captures only the LAST 2000 chars of stdout (measured
    // from BENCH_r05: tail length 2000, full line 2461 → front-truncated
    // line → "parsed": null three rounds running). The full line above
    // is for humans / bench_out.json is the committed full record; the
    // FINAL line is a compact summary guaranteed to fit the tail
    // buffer: totals + the slowest queries, with a pointer to the full
    // per-query map.
    val slowest = results.filter(_._2._1 >= 0).sortBy(-_._2._1).take(15)
    val slowJson = slowest.map { case (k, v) => "\"" + k + "\":" + fmt(v._1) }
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"cpu_total":${fmt(cpuTotal)},"nqueries":${results.size},$conditions,"queries":$slowJson,"queries_note":"15 slowest by wall; full wall+cpu maps in bench_out.json and the line above","sf":"$sfDir"}"""
    println(compact)
    System.out.flush()
    spark.stop()
  }
}
