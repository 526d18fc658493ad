package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-within-partition top-K — the Spark-native form of the
  * reference's TopN process functions (ListState buffer + timer sort at
  * DW-Flink/HotItemsAnalysis/.../app/HotItems.scala:82-134 and
  * NetworkFlow.scala:81-140).
  *
  * Uses `row_number() over (partition by ... order by ...)`, which Spark
  * plans as a `WindowGroupLimitExec` + partial top-K sort per partition
  * (rank-limit pushdown): each shuffle partition keeps only K rows per
  * key before the final sort, so the full ranking is never
  * materialized — this is exactly the bounded-state behavior the
  * reference hand-rolls, but distributed and codegen'd. No driver-side
  * `.collect()`/sort anywhere.
  */
object TopK {

  /** Top-`k` rows per `partitionCols` group ordered by `orderCols`.
    * Callers must pass a deterministic total order (add a unique
    * tiebreaker column) so results are stable across engines.
    */
  def topK(df: DataFrame, k: Int, partitionCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
