package org.apache.spark

/** Test-only accessor for the private[spark] listener bus: the plan
  * audits need a deterministic "all listener events delivered" barrier
  * (a fixed sleep undercounts jobs under CI load).
  */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
