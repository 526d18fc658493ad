package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.StateMachines.{OrderOutcome, OrderState}

/** Streaming order-timeout with REAL event-time timers (SURVEY.md §2.5
  * T3): the reference registers a timer at create+15min
  * (OT/app/OrderTimeoutWithoutCep.scala:81-82) and fires the timeout
  * when the event-time clock passes it. Spark's equivalent is
  * `flatMapGroupsWithState` + `GroupStateTimeout.EventTimeTimeout`:
  * per-order state carries the create timestamp, a pay within the
  * deadline emits "payed" immediately, and an order whose pay never
  * arrives emits "timeout" when the WATERMARK crosses
  * create+timeout — exactly the reference's timer semantics, driven by
  * the stream's own event-time progress, state removed either way.
  */
object TimedOrderMonitor {

  /** The watermarked event-time column must remain in the Dataset —
    * projecting it away fails EventTimeTimeout analysis.
    */
  final case class OrderRow(order_id: Long, ts: java.sql.Timestamp, is_create: Boolean)

  def monitor(events: Dataset[OrderRow], timeoutSec: Long): Dataset[OrderOutcome] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.order_id)
      .flatMapGroupsWithState[OrderState, OrderOutcome](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (id: Long, it: Iterator[OrderRow], state: GroupState[OrderState]) =>
          if (state.hasTimedOut) {
            // watermark passed create+timeout with no qualifying pay
            val st = state.get
            state.remove()
            Iterator.single(StateMachines.orderOutcome2(id, st, timeoutSec))
          } else {
            val st0 = state.getOption.getOrElse(OrderState(None, None))
            val st = it.toSeq.sortBy(_.ts.getTime).foldLeft(st0) { (s, e) =>
              StateMachines.orderStep(s,
                StateMachines.OrderEvent(id, e.ts.getTime / 1000L, e.is_create))
            }
            val outcome = StateMachines.orderOutcome2(id, st, timeoutSec)
            if (outcome.status == "shipped") {
              state.remove() // resolved: emit now, free the state
              Iterator.single(outcome)
            } else {
              state.update(st)
              // the reference's timer: fire at create + timeout (event
              // time). Pay-only states (pay-before-create, or a pay
              // arriving after its order already timed out and was
              // evicted) ALSO get a timer — otherwise they are never
              // flushed and leak state forever at scale. The timer is
              // clamped above the current watermark: a late event can
              // re-open state whose deadline already passed, and
              // setTimeoutTimestamp below the watermark throws and
              // kills the query.
              st.createdTs.orElse(st.paidTs).foreach { t =>
                state.setTimeoutTimestamp(
                  math.max((t + timeoutSec) * 1000L, state.getCurrentWatermarkMs() + 1))
              }
              Iterator.empty
            }
          }
      }
  }

  /** Wire the monitor over a file-replayed order-event stream (columns
    * order_id, ts [timestamp], is_create) with a watermark that drives
    * the timers.
    */
  def monitorStream(orderEvents: DataFrame, timeoutSec: Long, watermark: String = "0 seconds"): Dataset[OrderOutcome] = {
    import orderEvents.sparkSession.implicits._
    val typed = orderEvents
      .withWatermark("ts", watermark)
      .select(col("order_id"), col("ts"), col("is_create"))
      .as[OrderRow]
    monitor(typed, timeoutSec)
  }
}
