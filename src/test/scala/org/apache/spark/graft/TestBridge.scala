package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only shim: `SparkContext.listenerBus` is `private[spark]`, and the
  * skew stress spec needs to drain it before reading listener-collected
  * task metrics (listener delivery is async — asserting without a drain
  * races the event queue). Declared under `org.apache.spark` the standard
  * way; only the public-shaped `waitUntilEmpty` is touched.
  */
object TestBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
