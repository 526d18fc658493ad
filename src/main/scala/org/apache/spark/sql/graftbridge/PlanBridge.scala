package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `Dataset.checkpoint`/`localCheckpoint` wrap the materialized RDD in
  * a [[LogicalRDD]] that INHERITS the child plan's estimated statistics
  * (`LogicalRDD.rewriteStatsAndConstraints`). Inside an iterative
  * algorithm that checkpoints every round, the inherited estimate
  * compounds: round k's self-join SQUARES round k−1's inherited
  * sizeInBytes, so the estimate grows doubly-exponentially in the round
  * count and eventually overflows the BigInteger backing it
  * ("BigInteger would overflow supported range" from
  * SizeInBytesOnlyStatsPlanVisitor — the r12 century probe hit it at
  * sf100 in connected components, whose diameter needed more rounds
  * than the smaller corpora). The estimate is also meaningless by then:
  * the checkpoint IS materialized, its true size is known to be linear.
  *
  * [[dropCheckpointStats]] rebuilds the checkpoint leaf WITHOUT the
  * inherited stats/constraints, so each round starts from the default
  * leaf estimate — constant per round, no compounding. It must live
  * under org.apache.spark.sql because `Dataset.ofRows` and the
  * LogicalRDD session constructor are `private[sql]` (the conventional
  * extension-library bridge pattern, see [[ColumnBridge]]).
  */
object PlanBridge {
  def dropCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[ClassicSession]
        val fresh = LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
          lr.outputOrdering, lr.isStreaming, lr.stream)(session, None, None)
        Dataset.ofRows(session, fresh)
      case _ => df
    }
}
