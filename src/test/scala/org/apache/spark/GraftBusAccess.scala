package org.apache.spark

/** Test-only bridge into the `private[spark]` listener bus: the plan-build
  * job audit (PlanShapeSpec) must DRAIN the async bus before reading its
  * job counter, or a job started by the audited build could be counted
  * against the next query — the bus delivers events on its own thread.
  */
object GraftBusAccess {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
