package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Drains the async listener bus so a metrics snapshot taken right
  * after a job has seen that job's trailing task-end events — Bench's
  * per-query gc/spill attribution read the counters while events for
  * the query could still be in flight, attributing stragglers to the
  * NEXT query's row (round-12 advisor item). Lives under
  * `org.apache.spark` to reach the `private[spark]` listener bus; the
  * wait is bounded and a timeout is swallowed — this serves
  * diagnostics, never correctness.
  */
object BusDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 2000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: Exception => () }
}
