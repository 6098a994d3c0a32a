package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus` is `private[spark]`; tooling that reads task
  * metrics through a SparkListener (graft.tools.ScaleProbe) needs a real
  * drain barrier rather than a fixed sleep, so this one-method bridge lives
  * in the org.apache.spark package. Tooling-only — no query path uses it.
  */
object ListenerBridge {
  /** Block until all posted listener events have been delivered. */
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
