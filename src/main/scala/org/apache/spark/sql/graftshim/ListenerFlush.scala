package org.apache.spark.sql.graftshim

/** Drains the SparkListener event bus — `listenerBus` is
  * private[spark], so probes that meter task input bytes via a
  * listener (IdxReadProbe) reach it through this shim to make sure
  * every task-end event of a finished job has been delivered before
  * reading the accumulated counters. */
object ListenerFlush {
  def flush(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
