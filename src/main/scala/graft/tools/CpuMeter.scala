package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Accumulates executor CPU time (task compute, from Spark task
  * metrics) across all tasks in the session. Wall-clock timings on
  * this host carry a documented 1.5-10× ambient co-tenancy error bar
  * (hypervisor contention windows with zero container load);
  * per-task CPU time is unaffected by another tenant stealing the
  * cores — a task that computes for 2 CPU-seconds reports 2 CPU-
  * seconds whether it wall-clocked 2 s or 20 s. Bench and ScaleProbe
  * bracket each query with [[snapshot]] and record BOTH wall and cpu;
  * regression gates evaluate cpu first (tools/bench_compare.py).
  *
  * Scope: `executorCpuTime` only — task deserialization / GC /
  * scheduler overhead are excluded, so cpu < wall even on a quiet
  * host. That is fine for a regression RATIO; it is not a utilization
  * measure.
  */
final class CpuMeter(spark: SparkSession) {
  private val cpuNs = new LongAdder
  spark.sparkContext.addSparkListener(new SparkListener {
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) cpuNs.add(m.executorCpuTime)
    }
  })

  /** Accumulated executor CPU seconds over the session so far. Drains
    * the listener bus first (events post asynchronously) so a
    * before/after bracket attributes every completed task to the
    * query that ran it.
    */
  def snapshot(): Double = {
    org.apache.spark.sql.graftbridge.ListenerBridge.waitUntilEmpty(spark)
    cpuNs.sum() / 1e9
  }
}
