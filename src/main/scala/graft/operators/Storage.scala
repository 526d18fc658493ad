package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout helpers — the levers that matter at 100 TB:
  *
  *  - **partitioned writes** prune whole directories at read time
  *    (predicate on the partition column never touches excluded files);
  *  - **bucketed writes** pre-shuffle a table once at write time so
  *    every later equi-join/aggregation on the bucket key runs with NO
  *    exchange (both sides read co-located buckets).
  *
  * On a real cluster the bucketed tables live in the metastore; local
  * tests use the session-local warehouse. StorageSpec proves the
  * no-shuffle property by asserting the joined plan contains no
  * ShuffleExchange.
  */
object Storage {

  /** Write `df` partitioned by `cols` (directory-level pruning). */
  def writePartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Drop `table` and clear any stale managed-table location a previous
    * session's metastore left behind (it blocks CREATE TABLE AS SELECT).
    */
  private def dropAndClean(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val loc = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  /** Write `df` as a bucketed+sorted managed table. `buckets` should
    * match the downstream shuffle partitioning (one-time shuffle at
    * write, none at read).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCol: String): Unit = {
    dropAndClean(df.sparkSession, table)
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` as a plain managed parquet table (small dimension /
    * model tables — codebooks, centroids — that broadcast at read).
    */
  def writeTable(df: DataFrame, table: String): Unit = {
    dropAndClean(df.sparkSession, table)
    df.write.mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** True when the executed plan of `df` contains a shuffle exchange —
    * the thing bucketing is supposed to eliminate.
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString().contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
