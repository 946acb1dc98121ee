package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Test/audit helper: block until the listener bus has delivered all
  * queued events (listener metrics are async; an audit reading
  * counters right after an action races them). `listenerBus` is
  * private[spark], hence this shim lives under org.apache.spark.
  */
object ListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
