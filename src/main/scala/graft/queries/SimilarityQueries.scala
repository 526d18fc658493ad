package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate-nearest-neighbor / similarity search over the
  * `embeddings` table (Array[Float] vectors).
  *
  * - `ann_bruteforce`: exact top-k cosine for a probe set. The probe
  *   side broadcasts; similarity is a codegen'd zip_with/aggregate fold
  *   in double precision; top-k is a rank-limit (WindowGroupLimit), so
  *   per-partition state is k rows per probe.
  * - `embedding_neardup`: global top-50 most-similar pairs (the
  *   embedding-cosine near-dup primitive).
  * - `ann_ivf`: IVF-style two-stage search — coarse quantize to
  *   per-label centroids, probe only the 2 nearest cells. At 100 TB
  *   this is the scale path: the fine search touches ~2/10ths of the
  *   corpus and both stages stay as joins, never a driver loop.
  *
  * Similarities are rounded to 6 decimals before ranking so the
  * Spark/DuckDB float fold association can't flip an ordering.
  */
object SimilarityQueries {

  /** Codegen'd double-precision dot product of two float arrays. */
  private def dot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  private def cosine(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** DuckDB twin of [[dot]]/[[cosine]] with identical association. */
  private def duckDot(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), 'sum')"

  private def duckCosine(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  // --------------------------------------------------------- brute force
  private def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    vecs.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("simr", round(expr(cosine("pe", "embedding")), 6))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("simr"), col("rn"))
  }

  private val annBruteforceOracle =
    s"""WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
       |p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id % 100 = 0),
       |s AS (
       |  SELECT probe_id, vec_id, round(${duckCosine("pe", "e")}, 6) AS simr
       |  FROM v CROSS JOIN p WHERE vec_id <> probe_id)
       |SELECT probe_id, vec_id, simr, rn FROM (
       |  SELECT s.*, row_number() OVER (PARTITION BY probe_id ORDER BY simr DESC, vec_id) AS rn
       |  FROM s) t
       |WHERE rn <= 5""".stripMargin

  // ------------------------------------------------------ near-dup pairs
  private def embeddingNeardup(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.embeddings(spark, dir).select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val b = Tables.embeddings(spark, dir).select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    a.crossJoin(b)
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("simr", round(expr(cosine("ea", "eb")), 6))
      .orderBy(col("simr").desc, col("vec_a"), col("vec_b"))
      .limit(50)
      .select(col("vec_a"), col("vec_b"), col("simr"))
  }

  private val embeddingNeardupOracle =
    s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       round(${duckCosine("a.embedding", "b.embedding")}, 6) AS simr
       |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       |ORDER BY simr DESC, vec_a, vec_b
       |LIMIT 50""".stripMargin

  // ---------------------------------------------------------------- IVF
  /** IVF two-stage ANN. Centroids are per-label means (computed
    * distributedly via posexplode + per-dimension avg); each probe
    * searches only its 2 nearest cells. No DuckDB oracle — float-mean
    * centroids aren't bit-stable across engines; AnnSpec instead checks
    * recall against ann_bruteforce.
    */
  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val vecs = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"), col("embedding"))
    val centroids = vecs
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col").cast("double")).as("v"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("v")))).as("pv"))
      .select(col("label").as("c_label"), expr("transform(pv, x -> x.v)").as("cvec"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("csim").desc, col("c_label"))
    val cells = probes.crossJoin(broadcast(centroids))
      .withColumn("csim", expr(cosine("pe", "cvec")))
      .withColumn("crn", row_number().over(wCell))
      .filter(col("crn") <= 2)
      .select(col("probe_id"), col("pe"), col("c_label"))
    val wFine = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("simr").desc, col("vec_id"))
    cells.join(vecs, cells("c_label") === vecs("label"))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("simr", round(expr(cosine("pe", "embedding")), 6))
      .withColumn("rn", row_number().over(wFine).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("probe_id"), col("vec_id"), col("simr"), col("rn"))
  }

  val queries: Seq[GraftQuery] = Seq(
    GraftQuery("ann_bruteforce", Some(annBruteforceOracle), annBruteforce),
    GraftQuery("embedding_neardup", Some(embeddingNeardupOracle), embeddingNeardup),
    GraftQuery("ann_ivf", None, annIvf),
  )
}
