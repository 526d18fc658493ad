package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 split Column from Expression (Connect). For a classic-mode
  * extension library the supported hop between them is
  * `classic.ExpressionUtils`, which is `private[sql]` — this bridge
  * lives under the org.apache.spark.sql namespace to reach it (the
  * conventional pattern for Catalyst extension libraries).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
