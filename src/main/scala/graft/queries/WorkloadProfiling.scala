package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Workload-planning profiles a 100 TB operator actually consults
  * BEFORE committing to a physical plan: join-key skew audits (decide
  * salting / AQE skew thresholds from data, not folklore) and
  * sketch-based join-output cardinality estimation (decide
  * broadcast-vs-shuffle and reserve shuffle capacity without running
  * the join). The reference engine has no planning tier at all — these
  * extend the analytic surface the way an operations team would need
  * at cluster scale.
  */
object WorkloadProfiling {

  // ------------------------------------------------- join-key skew audit
  private val SkewTopK = 20

  /** Per-key frequency profile of the orders→customer join key: the
    * top-20 heaviest o_custkey values with their absolute count, share
    * of all rows, and ratio to the mean per-key load. The skew ratio is
    * exactly the number AQE's skew-join threshold and a salting factor
    * are derived from.
    *
    * Scale shape: ONE shuffle (groupBy key), a 3-number global rollup
    * of the per-key counts broadcast back over the top-k frame, and a
    * TakeOrdered for the top-20 — never a global sort of the key space.
    */
  private def skewAudit(spark: SparkSession, dir: String): DataFrame = {
    val perKey = Tables.read(spark, dir, "orders")
      .groupBy(col("o_custkey").as("join_key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = perKey.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    perKey
      .orderBy(col("cnt").desc, col("join_key"))
      .limit(SkewTopK)
      .crossJoin(broadcast(stats))
      // QRound: integer ratios — exact-boundary class (ROUND_AUDIT U3;
      // total_rows is 2-5-smooth-capable, e.g. exactly 10^k rows)
      .select(
        col("join_key"), col("cnt"),
        QRound.col(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        QRound.col(col("cnt").cast("double") * col("n_keys") / col("total_rows"), 4)
          .as("skew_vs_avg"),
        col("n_keys"))
  }

  private val skewAuditOracle =
    s"""WITH per_key AS (
       |  SELECT o_custkey AS join_key, CAST(count(*) AS BIGINT) AS cnt
       |  FROM orders GROUP BY 1),
       |stats AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
       |         CAST(count(*) AS BIGINT) AS n_keys
       |  FROM per_key),
       |top AS (
       |  SELECT join_key, cnt FROM per_key
       |  ORDER BY cnt DESC, join_key LIMIT $SkewTopK)
       |SELECT join_key, cnt,
       |       ${QRound.duck("CAST(cnt AS DOUBLE) / total_rows", 6)} AS share,
       |       ${QRound.duck("CAST(cnt AS DOUBLE) * n_keys / total_rows", 4)} AS skew_vs_avg,
       |       n_keys
       |FROM top CROSS JOIN stats""".stripMargin

  // ------------------------------------------------- join size estimation
  /** Coordinated-sampling rate: keep a key iff its 32-bit md5 prefix
    * falls in the bottom 1/8 of the hash space. Both join sides use
    * the SAME hash, so a sampled key contributes its FULL a·b product
    * — the estimator is unbiased over keys (Σ a_u·b_u · 1/p).
    */
  private val JsHashSpace = 4294967296L // 2^32
  private val JsSampleDiv = 8L
  private val JsThreshold = JsHashSpace / JsSampleDiv

  /** Join-output cardinality estimation for the self-join
    * `clicks ⋈ purchases ON user_id` — the Σ_u a_u·b_u frequency
    * moment that decides whether a join is safe to shuffle at all.
    * The estimate uses coordinated (hash-threshold) key sampling: only
    * keys whose shared deterministic hash lands under 2^32/8
    * contribute, scaled by 8. The exact value is computed alongside as
    * the fidelity reference (at 100 TB you run ONLY the sketch: the
    * sampled aggregation reads 1/8 of the keys' per-key counts, and
    * per-key counts are a map-side-combined groupBy, never the join
    * itself).
    */
  private def joinSizeEstimate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def perUser(tpe: String, as: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .groupBy(col("user_id")).agg(count(lit(1)).as(as))
    val joined = perUser("click", "a_cnt")
      .join(perUser("purchase", "b_cnt"), "user_id")
      .withColumn("hv",
        conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long"))
    joined.agg(
      sum(col("a_cnt") * col("b_cnt")).as("exact_size"),
      round(
        sum(when(col("hv") < JsThreshold, col("a_cnt") * col("b_cnt"))
          .otherwise(lit(0L))).cast("double") * JsSampleDiv, 2)
        .as("est_size"),
      sum(when(col("hv") < JsThreshold, 1L).otherwise(0L)).as("keys_sampled"),
      count(lit(1)).as("keys_total"))
      // QRound: integer ratio — exact-boundary class (ROUND_AUDIT U3)
      .withColumn("rel_err",
        QRound.col(abs(col("est_size") - col("exact_size")) / col("exact_size"), 4))
  }

  private val joinSizeEstimateOracle =
    s"""WITH a AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS a_cnt FROM events
       |  WHERE event_type = 'click' GROUP BY 1),
       |b AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS b_cnt FROM events
       |  WHERE event_type = 'purchase' GROUP BY 1),
       |j AS (
       |  SELECT a.user_id, a_cnt, b_cnt,
       |    CAST(CAST('0x' || substr(md5(CAST(a.user_id AS VARCHAR)), 1, 8) AS UBIGINT) AS BIGINT) AS hv
       |  FROM a JOIN b ON a.user_id = b.user_id),
       |agg AS (
       |  SELECT CAST(sum(a_cnt * b_cnt) AS BIGINT) AS exact_size,
       |         round(CAST(sum(CASE WHEN hv < $JsThreshold THEN a_cnt * b_cnt ELSE 0 END) AS DOUBLE) * $JsSampleDiv, 2) AS est_size,
       |         CAST(sum(CASE WHEN hv < $JsThreshold THEN 1 ELSE 0 END) AS BIGINT) AS keys_sampled,
       |         CAST(count(*) AS BIGINT) AS keys_total
       |  FROM j)
       |SELECT exact_size, est_size, keys_sampled, keys_total,
       |       ${QRound.duck("abs(est_size - exact_size) / exact_size", 4)} AS rel_err
       |FROM agg""".stripMargin

  // ------------------------------------------------- bloom-prefilter join
  private val BloomBuckets = 4096L
  private val BloomErrMin = 3L

  /** Runtime-filter join, expressed relationally: purchases of users
    * with ≥3 error events. The build side's key set is collapsed to a
    * ≤4096-row BUCKET table (one-hash Bloom filter as a relation); the
    * probe side semi-joins the broadcast bucket table BEFORE the exact
    * key join re-checks the false positives. Output is identical to
    * the plain join by construction — the oracle IS the plain join —
    * while the probe shuffle carries only bucket-colliding rows. This
    * is the shape Spark's own `spark.sql.optimizer.runtimeFilter`
    * injects; materializing it as an operator makes the pattern
    * available (and provable) on engines/paths where the optimizer
    * can't see through the build side.
    */
  /** The one-hash bucket of a key — the "Bloom bit" both join sides
    * share. Exposed for the streaming twin. */
  private[graft] def bloomBucketCol(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
      .cast("long") % BloomBuckets

  /** Build side: users with ≥3 error events. Exposed for the streaming
    * twin, which runs the identical prefilter stream-static. */
  private[graft] def errorUserBuild(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "error")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
      .filter(col("n_err") >= BloomErrMin)
      .select(col("user_id").as("err_user"))

  /** Bloom-prefiltered probe: the bucket semi-join then the exact
    * re-check, shared verbatim by the batch query and the stream twin
    * (the probe frame is the only thing that differs). */
  private[graft] def bloomPrefilteredProbe(probe: DataFrame, build: DataFrame): DataFrame = {
    val buckets = build.select(bloomBucketCol(col("err_user")).as("bk")).distinct()
    probe.filter(col("event_type") === "purchase")
      .withColumn("bk", bloomBucketCol(col("user_id")))
      .join(broadcast(buckets), "bk") // bloom prefilter: drops most rows
      .join(build, col("user_id") === col("err_user")) // exact re-check
  }

  private def bloomPrefilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    bloomPrefilteredProbe(ev, errorUserBuild(ev))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
  }

  private val bloomPrefilterJoinOracle =
    s"""WITH build AS (
       |  SELECT user_id FROM events WHERE event_type = 'error'
       |  GROUP BY 1 HAVING count(*) >= $BloomErrMin)
       |SELECT e.user_id, CAST(count(*) AS BIGINT) AS n_purchases,
       |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |FROM events e JOIN build USING (user_id)
       |WHERE e.event_type = 'purchase'
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------- compaction planning
  private val TargetFileBytes = 4096L

  /** Small-file compaction planning over `documents` by source: size
    * each source in bytes (n_chars as the proxy), derive the target
    * file count for a fixed file-size budget, and assign every doc to
    * an output file by round-robin over the size-descending rank — the
    * classic LPT-flavored balancing that keeps file sizes within one
    * max-doc of each other. Emits the PLAN (per planned file: doc
    * count + bytes), which is what a lakehouse maintenance job
    * executes as its shuffle spec. Scale shape: one groupBy per
    * source + a per-source window rank — partitioned by the same key
    * the write would be, never a global sort.
    */
  private def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
    // target_files is capped at the source's doc count: a doc is the
    // atomic unit of assignment, so a source of n docs can never fill
    // more than n files — without the cap a single oversized doc
    // "plans" files that stay empty (the plan under-provisions)
    val sized = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("src_bytes"), count(lit(1)).as("n_src_docs"))
      .withColumn("target_files",
        least(
          greatest(lit(1L), ceil(col("src_bytes").cast("double") / TargetFileBytes)),
          col("n_src_docs")))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    docs.join(sized, "source")
      .withColumn("file_id", (row_number().over(w) - 1) % col("target_files"))
      .groupBy(col("source"), col("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("file_bytes"))
      .join(sized.select(col("source"), col("target_files")), "source")
  }

  private val compactionPlanOracle =
    s"""WITH sized AS (
       |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS src_bytes,
       |         least(greatest(1, CAST(ceil(CAST(sum(n_chars) AS DOUBLE) / $TargetFileBytes) AS BIGINT)),
       |               count(*)) AS target_files
       |  FROM documents GROUP BY 1),
       |assigned AS (
       |  SELECT d.source, d.n_chars,
       |         (row_number() OVER (PARTITION BY d.source
       |            ORDER BY d.n_chars DESC, d.doc_id) - 1) % s.target_files AS file_id,
       |         s.target_files
       |  FROM documents d JOIN sized s USING (source))
       |SELECT source, file_id, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS file_bytes, target_files
       |FROM assigned
       |GROUP BY 1, 2, 5""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("skew_audit", Some(skewAuditOracle), skewAudit),
    GraftQuery("join_size_estimate", Some(joinSizeEstimateOracle), joinSizeEstimate),
    GraftQuery("bloom_prefilter_join", Some(bloomPrefilterJoinOracle), bloomPrefilterJoin),
    GraftQuery("compaction_plan", Some(compactionPlanOracle), compactionPlan),
  )
}
