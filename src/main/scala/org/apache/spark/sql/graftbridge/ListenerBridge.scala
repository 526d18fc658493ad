package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession

/** `SparkContext.listenerBus` and `LiveListenerBus.waitUntilEmpty()`
  * are `private[spark]`; the CPU-time meter needs the bus drained
  * before reading its accumulator so every completed task's metrics
  * are attributed to the query that ran it (listener events post
  * asynchronously). Same namespace-bridge pattern as [[ColumnBridge]].
  */
object ListenerBridge {
  /** Block until all queued listener events are dispatched (10 s cap —
    * a local-mode bus drains in milliseconds; the timeout only fires
    * if the bus is wedged, which IS worth an exception).
    */
  def waitUntilEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
