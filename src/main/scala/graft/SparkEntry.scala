package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.multimodal.Multimodal
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator registers one entry in `queries` (Spark
  * plan) and, when ANSI-SQL-expressible, one in `oracleSql` (DuckDB
  * twin the driver hash-compares against).
  */
object SparkEntry {

  /** All registered capabilities, in registration order. */
  lazy val all: Seq[GraftQuery] =
    EventAnalytics.queries ++ TpchAnalytics.queries ++ TpchAnalytics2.queries ++
      TextAnalytics.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ Multimodal.queries ++
      StatefulQueries.queries ++ ExtendedAnalytics.queries ++
      RelationalExtras.queries ++ SequenceAnalytics.queries ++
      StatsAnalytics.queries ++ CorpusMining.queries ++ SketchQueries.queries ++
      PipelineShaping.queries ++ LayoutAnalytics.queries ++ MixtureAnalytics.queries ++
      TemporalAnalytics.queries ++ RetrievalFusion.queries ++ PrivacyAnalytics.queries ++
      WorkloadProfiling.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_hot_items")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
