package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Access shim for `SparkContext.listenerBus` (package-private to
  * org.apache.spark): the bench attributes per-query engine task-seconds via
  * a SparkListener, and the listener bus is ASYNC — sampling the accumulated
  * counter right after an action returns can miss (or, worse, mis-attribute
  * to the NEXT query) stage-completed events still queued. Draining the bus
  * before each sample pins the attribution window. The shim is measurement
  * infrastructure only; no production operator depends on it.
  */
object BusDrain {
  /** Block until every queued listener event is delivered (bounded by the
    * bus's own timeout); swallow the TimeoutException — a late sample is
    * still better than a crashed bench run.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
