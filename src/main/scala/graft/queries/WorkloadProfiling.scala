package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
      .select(
        col("join_key"), col("cnt"),
        round(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        round(col("cnt").cast("double") * col("n_keys") / col("total_rows"), 4)
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
       |       round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
       |       round(CAST(cnt AS DOUBLE) * n_keys / total_rows, 4) AS skew_vs_avg,
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
      .withColumn("rel_err",
        round(abs(col("est_size") - col("exact_size")) / col("exact_size"), 4))
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
       |       round(abs(est_size - exact_size) / exact_size, 4) AS rel_err
       |FROM agg""".stripMargin

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("skew_audit", Some(skewAuditOracle), skewAudit),
    GraftQuery("join_size_estimate", Some(joinSizeEstimateOracle), joinSizeEstimate),
  )
}
