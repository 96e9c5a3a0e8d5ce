package org.apache.spark

/** Compile-time-checked access to the `private[spark]` listener bus for
  * graft's measurement tools: task-end events are delivered on an ASYNC
  * queue, so a tool that resets/reads accumulated task metrics around a
  * timed query must DRAIN the bus at the boundary — otherwise in-flight
  * events from query N are counted into query N+1 and the final query's
  * tail events are dropped (exactly the spill accounting ScaleBench
  * exists to record). This shim lives in `org.apache.spark` solely to
  * reach `sc.listenerBus`; it adds no behavior.
  */
object GraftListenerBus {

  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
