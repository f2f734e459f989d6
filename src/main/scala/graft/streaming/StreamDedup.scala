package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Keyed state for an unemitted window-digest occurrence.
  *
  * Explicit ADT, not an in-band sentinel: `viral = true` means the digest
  * has been seen ≥ 2 times and every occurrence (including the stored
  * first one) has been emitted — `doc`/`pos` are then meaningless and a
  * legitimate doc_id of -1 can never be misread as the viral marker
  * (round-12 advice). */
case class SpanDigestState(viral: Boolean, doc: Long, pos: Int)

/** Cross-batch window-digest state for STREAMING substring-span dedup —
  * the streaming half of [[graft.ml.Dedup.dupSpans]] (the batch island
  * merge is the finishing compaction; the windowing rule itself is
  * [[graft.ml.Dedup.windowDigests]], shared verbatim so batch and stream
  * cannot drift).
  *
  * Retention: with `evictSingletonsAfterMs = None` the state holds one
  * entry per distinct window digest FOREVER (`NoTimeout`) — exact, and
  * fine for a bounded backfill, but on the continuous-ingestion
  * deployment this operator is pitched at, state grows with the total
  * distinct-window count of everything ever ingested (O(corpus tokens)
  * entries, most of them cold singletons that never see a second
  * occurrence). With `Some(horizonMs)` a SINGLETON digest is evicted
  * `horizonMs` of processing time after it was last touched
  * (`ProcessingTimeTimeout`); viral markers are never evicted — they are
  * the tiny minority (one row per digest that actually duplicated) and
  * evicting one would re-emit its later occurrences as fresh singletons.
  *
  * The recall trade is explicit and standard: a duplicate whose second
  * occurrence arrives more than the horizon after the first is MISSED —
  * exactly the trade the reference's own TTL'd dedupe cache makes
  * (processor_dedupe.go:20-31: dedupe is scoped to the cache TTL), and
  * the one every production stream dedup makes. Within any run shorter
  * than the horizon (e.g. the gate's AvailableNow run with a 1 h
  * horizon) the output is IDENTICAL to NoTimeout — pinned in MlSpec.
  *
  * Deployment note: size the horizon to the expected duplicate-arrival
  * lag, and run the state store on the RocksDB provider
  * (`spark.sql.streaming.stateStore.providerClass` →
  * `RocksDBStateStoreProvider`) — singleton-digest state at corpus scale
  * is disk-resident there, not heap-resident as with the default
  * in-memory provider. */
object StreamDedup {

  /** (doc_id, pos, digest) occurrence stream → (doc_id, pos) occurrences
    * of duplicated digests, emitted exactly once each (the first
    * occurrence retroactively when the digest turns viral, later ones
    * immediately). */
  def dupOccurrences(occ: Dataset[(Long, Int, Long)],
                     evictSingletonsAfterMs: Option[Long] = None): DataFrame = {
    import occ.sparkSession.implicits._
    val timeoutConf =
      if (evictSingletonsAfterMs.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    occ.groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: Long, rows: Iterator[(Long, Int, Long)],
         state: GroupState[SpanDigestState]) => {
          if (state.hasTimedOut) {
            // cold singleton past the horizon: never emitted (it was not a
            // duplicate within the horizon), drop the state row
            state.remove()
            Iterator.empty
          } else {
            val incoming = rows.map(r => (r._1, r._2)).toList
            if (state.exists && state.get.viral) incoming.iterator
            else {
              val held = if (state.exists) List((state.get.doc, state.get.pos)) else Nil
              val all = held ++ incoming
              if (all.lengthCompare(2) >= 0) {
                state.update(SpanDigestState(viral = true, 0L, 0))
                all.iterator
              } else {
                all.headOption.foreach { case (d, p) =>
                  state.update(SpanDigestState(viral = false, d, p))
                }
                // the timeout is cleared on every invocation for the key —
                // re-arm it so ONLY untouched singletons age out
                evictSingletonsAfterMs.foreach(state.setTimeoutDuration)
                Iterator.empty
              }
            }
          }
        })
      .toDF("doc_id", "pos")
  }
}
