package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.streaming.state.StateStore

/** `StateStore.unloadAll()` is `private[sql]`; this shim lives inside the
  * `org.apache.spark.sql` package tree solely to expose it to the bench
  * harness (the standard access-widening pattern for Spark-internal
  * hooks). Benchmark hygiene only — never part of a query plan: streaming
  * queries leave their state-store providers (and in-memory version maps)
  * loaded after `query.stop()`, and across repeated in-JVM runs that heap
  * pressure bleeds into whichever query is timed next.
  */
object StateStoreReset {
  def unloadAll(): Unit = StateStore.unloadAll()
}
