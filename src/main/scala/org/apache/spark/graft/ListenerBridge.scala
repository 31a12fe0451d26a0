package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bridge into the `private[spark]` listener bus, for deterministic
  * metric collection: stage/job events post asynchronously, so a
  * profiler must drain the bus before reading its counters (same
  * mechanism Spark's own test utilities use).
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
