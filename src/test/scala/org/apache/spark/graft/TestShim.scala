package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `private[spark]` listener-bus draining: the
  * no-eager-job specs must flush asynchronously-posted job-start events
  * before asserting on their counter.
  */
object TestShim {
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
