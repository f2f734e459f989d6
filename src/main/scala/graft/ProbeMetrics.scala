package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}

/** Shared streaming-probe metrics: accumulates state/sink numbers via a
  * StreamingQueryListener (q.recentProgress retains only the last 100
  * updates — a 10 ms trigger burns that in a second, dropping early data
  * batches and late eviction batches; round-13 advice), and [[finish]]
  * polls until the async listener bus has delivered the progress event
  * for the query's FINAL batch (a fixed sleep undercounted the terminal
  * numRowsTotal/state bytes on loaded hosts; round-14 advice). One
  * instance per measured query: removed/emitted accumulate across
  * batches, stateRows/stateBytes hold the last-seen (terminal) values.
  */
final class ProbeMetrics(spark: SparkSession) {
  val removed = new java.util.concurrent.atomic.AtomicLong()
  val emitted = new java.util.concurrent.atomic.AtomicLong()
  @volatile var stateRows = 0L
  @volatile var stateBytes = 0L
  @volatile private var lastSeenBatch = -1L
  // the measured query's id: the listener is SESSION-wide, so without
  // this filter a second streaming query in the probe session would
  // silently co-mingle its metrics (r15 advice). Bound explicitly via
  // bind(q) right after start(); before binding, the first query to
  // report claims the slot (probes start exactly one query).
  private val boundId =
    new java.util.concurrent.atomic.AtomicReference[java.util.UUID](null)

  /** Pin the listener to one query; call immediately after start().
    * If the first-to-report heuristic latched a DIFFERENT query before
    * bind ran (a warmup stream racing the bind call), discard whatever
    * that query already accumulated — repointing the id alone would
    * keep the polluted counters (review finding r16). */
  def bind(q: StreamingQuery): Unit = {
    val prev = boundId.getAndSet(q.id)
    if (prev != null && prev != q.id) {
      removed.set(0L); emitted.set(0L)
      stateRows = 0L; stateBytes = 0L; lastSeenBatch = -1L
    }
  }

  private val listener = new StreamingQueryListener {
    import StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      boundId.compareAndSet(null, e.progress.id)
      if (boundId.get != e.progress.id) return
      Option(e.progress.stateOperators).toSeq.flatten.foreach { so =>
        removed.addAndGet(so.numRowsRemoved)
        stateRows = so.numRowsTotal
        stateBytes = so.memoryUsedBytes
      }
      Option(e.progress.sink).foreach(s =>
        if (s.numOutputRows > 0) emitted.addAndGet(s.numOutputRows))
      lastSeenBatch = math.max(lastSeenBatch, e.progress.batchId)
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
  }
  spark.streams.addListener(listener)

  /** Wait (bounded) for the final batch's progress event, then detach. */
  def finish(q: StreamingQuery): Unit = {
    val targetBatch = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
    val busDeadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (lastSeenBatch < targetBatch && System.nanoTime() < busDeadline)
      Thread.sleep(20)
    spark.streams.removeListener(listener)
  }
}
