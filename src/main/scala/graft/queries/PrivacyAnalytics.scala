package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Privacy-governance operators a training-data pipeline runs before a
  * corpus (or its per-group statistics) leaves the curation boundary —
  * the release-side complement of `doc_pii_scrub` (which redacts text
  * in place).
  *
  * - `k_anonymity`: equivalence-class audit over quasi-identifiers.
  *   Classes of customers sharing (nation, account-balance band) with
  *   size k < 5 re-identify; the sensitive attribute's distinct count
  *   per class is its l-diversity. One hash-aggregation over the
  *   table — partial map-side combine, class-keyed shuffle only, so at
  *   100 TB it's a single pass; the class table itself is
  *   |QI-domain|-sized (tiny) regardless of row count.
  * - `dp_noisy_counts`: an ε-differentially-private count release
  *   (Laplace mechanism, sensitivity 1, ε = 0.5 → b = 2). Noise is
  *   drawn via inverse-CDF from a SEEDED integer-arithmetic uniform
  *   keyed on the group — deterministic and bit-identical across
  *   engines/retries (a `rand()` draw would break both the oracle and
  *   replay-idempotence; production would swap the keyed hash for a
  *   per-release secret seed, changing nothing structural). The noise
  *   add is per-group post-aggregation work on a group-count-sized
  *   frame — free at any scale.
  */
object PrivacyAnalytics {

  private val KThreshold = 5
  private val BandWidth = 2000.0

  private def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "customer")
      .select(
        col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / BandWidth).cast("long").as("bal_band"),
        col("c_mktsegment"))
      .groupBy(col("nation"), col("bal_band"))
      .agg(
        count(lit(1)).as("k"),
        countDistinct(col("c_mktsegment")).as("l"))
      .withColumn("at_risk", (col("k") < KThreshold).cast("long"))
      .orderBy(col("nation"), col("bal_band"))

  private val kAnonymityOracle =
    s"""SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |       CAST(floor(c_acctbal / $BandWidth) AS BIGINT) AS bal_band,
       |       CAST(count(*) AS BIGINT) AS k,
       |       CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l,
       |       CAST(count(*) < $KThreshold AS BIGINT) AS at_risk
       |FROM customer
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // Laplace(b = 1/ε) via inverse CDF: u ∈ (0,1), d = u - 1/2,
  // noise = -b · sign(d) · ln(1 - 2|d|). The uniform is Knuth's
  // multiplicative hash of the group key mod a prime — exact BIGINT
  // arithmetic, then ONE double division, identical on both engines.
  private val Eps = 0.5
  private val LapB = 1.0 / Eps
  private val HashMul = 2654435761L
  private val HashMod = 1000003L

  private def dpNoisyCounts(spark: SparkSession, dir: String): DataFrame = {
    val u = ((col("nation") * HashMul) % HashMod + 1L).cast("double") /
      lit((HashMod + 1).toDouble)
    val d = u - 0.5
    val sign: Column =
      when(d > 0, 1.0).when(d < 0, -1.0).otherwise(0.0)
    val noise = lit(-LapB) * sign * log(lit(1.0) - lit(2.0) * abs(d))
    Tables.read(spark, dir, "customer")
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n"))
      .withColumn("noisy_n", round(col("n") + noise, 6))
      .select(col("nation"), col("noisy_n"))
      .orderBy(col("nation"))
  }

  private val dpNoisyCountsOracle = {
    val u = s"CAST((nation * $HashMul) % $HashMod + 1 AS DOUBLE) / ${(HashMod + 1).toDouble}"
    s"""WITH g AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nation, CAST(count(*) AS BIGINT) AS n
       |  FROM customer GROUP BY 1),
       |d AS (SELECT nation, n, $u - 0.5 AS dd FROM g)
       |SELECT nation,
       |       round(n + (-$LapB) *
       |             (CASE WHEN dd > 0 THEN 1.0 WHEN dd < 0 THEN -1.0 ELSE 0.0 END) *
       |             ln(1.0 - 2.0 * abs(dd)), 6) AS noisy_n
       |FROM d
       |ORDER BY nation""".stripMargin
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("k_anonymity", Some(kAnonymityOracle), kAnonymity),
    GraftQuery("dp_noisy_counts", Some(dpNoisyCountsOracle), dpNoisyCounts),
  )
}
