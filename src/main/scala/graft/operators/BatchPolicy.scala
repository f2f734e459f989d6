package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch policy (reference: internal/batch/policy/policy.go:24-135): a
  * stream is chopped into batches, flushing on `count`, `byte_size`, or a
  * Bloblang `check` — the triggering message is INCLUDED in the batch it
  * closes (Add() appends first, then tests, policy.go:102-134), and
  * byte_size is a trigger threshold, not a hard cap (a batch may exceed it
  * by its final message).
  *
  * Spark-first shape: batches are per-key, ordered by an explicit order
  * column (Spark has no global stream order at scale; the key is the
  * reference's per-pipeline sequencing made explicit and shardable).
  * `batch_id` is assigned, not materialized — downstream `groupBy(key,
  * batch_id)` does the actual batching with ordinary shuffle machinery.
  *
  * Single-trigger policies (count-only, check-only) compile to pure window
  * math — whole-stage codegen, one shuffle. The general combined policy
  * runs the reference's exact greedy loop per key partition: one shuffle +
  * in-partition sort, then a linear scan — no state bigger than one
  * running tally, so it holds at any key cardinality.
  */
object BatchPolicy {

  /** `count` trigger alone: flush every n-th message → exact batches of n
    * (policy.go:110-114). Pure window math. */
  def byCount(df: DataFrame, key: Column, order: Column, n: Int): DataFrame = {
    require(n > 0, "batch policy: count must be positive")
    val w = Window.partitionBy(key).orderBy(order)
    df.withColumn("batch_id",
      floor((row_number().over(w) - 1).cast(LongType) / n))
  }

  /** `check` trigger alone: a message for which the check holds closes its
    * own batch (policy.go:120-132) → batch_id = number of check-hits among
    * strictly-preceding messages. Pure window math. */
  def byCheck(df: DataFrame, key: Column, order: Column, check: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("batch_id",
      coalesce(sum(when(check, 1L).otherwise(0L)).over(w), lit(0L)))
  }

  /** `period` trigger alone (policy.go:24-100 `period`, e.g. "1h"): the
    * batch-engine's flush timer maps onto PROCESSING-TIME TUMBLING WINDOWS
    * over the ingest timestamp — messages in the same floor(ts/period)
    * window share a batch; the timer tick that flushes batch N is the
    * window boundary that opens batch N+1. Epoch-aligned rather than
    * first-message-aligned (the reference arms its timer at batch birth);
    * alignment is the price of a pure-Column, shuffle-free assignment that
    * holds at any scale — the first-message-aligned form lives in
    * [[assign]]'s periodMicros trigger. The reference's optional random
    * `jitter` spreads thousands of in-process timers to avoid a thundering
    * herd; for a deterministic batch plan it is a declared no-op. */
  def byPeriod(df: DataFrame, ingestTs: Column, periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "batch policy: period must be positive")
    df.withColumn("batch_id",
      floor(unix_micros(ingestTs) / lit(periodSeconds * 1000000L)).cast(LongType))
  }

  /** General combined policy — the reference Add() loop verbatim: append,
    * then trigger on count / byte-tally / check, reset on flush. The
    * `periodMicros` timer is the one PRE-append trigger: a message arriving
    * after the open batch's age exceeds the period flushes that batch and
    * starts the next one WITH the new message (the reference's timer fires
    * between messages, so the late arrival is never in the batch it
    * flushed). Runs as a per-key-partition linear scan (repartition by key
    * hash, sort within partition by (key, order)); O(1) state per
    * partition. */
  def assign(df: DataFrame, keyCol: String, orderCol: String,
             count: Int = 0, byteSize: Long = 0L,
             sizeOf: Column = null, check: Column = null,
             periodMicros: Long = 0L, ingestTs: Column = null): DataFrame = {
    require(count > 0 || byteSize > 0L || check != null || periodMicros > 0L,
      "batch policy must have at least one active trigger") // policy.go:45
    require(periodMicros <= 0L || ingestTs != null,
      "batch policy: period trigger needs an ingest timestamp column")
    val withAux = df
      .withColumn("_bp_bytes",
        if (byteSize > 0) sizeOf.cast(LongType) else lit(0L))
      .withColumn("_bp_check",
        if (check != null) check else lit(false))
      .withColumn("_bp_ts",
        if (periodMicros > 0) unix_micros(ingestTs) else lit(0L))
    val schema = withAux.schema.add(StructField("batch_id", LongType, nullable = false))
    val keyIdx = withAux.schema.fieldIndex(keyCol)
    val bytesIdx = withAux.schema.fieldIndex("_bp_bytes")
    val checkIdx = withAux.schema.fieldIndex("_bp_check")
    val tsIdx = withAux.schema.fieldIndex("_bp_ts")
    val out = withAux
      .repartition(col(keyCol))
      .sortWithinPartitions(col(keyCol), col(orderCol))
      .mapPartitions { rows =>
        var curKey: Any = null
        var first = true
        var batchId = 0L
        var nParts = 0
        var tally = 0L
        var batchStart = 0L
        rows.map { r =>
          val k = r.get(keyIdx)
          if (first || k != curKey) { curKey = k; first = false; batchId = 0L; nParts = 0; tally = 0L }
          val ts = if (periodMicros > 0 && !r.isNullAt(tsIdx)) r.getLong(tsIdx) else 0L
          // period timer fires BETWEEN messages: an arrival past the open
          // batch's deadline flushes it and starts a new batch with this row
          if (periodMicros > 0 && nParts > 0 && ts - batchStart >= periodMicros) {
            batchId += 1; nParts = 0; tally = 0L
          }
          // Add(): append first...
          if (nParts == 0) batchStart = ts
          nParts += 1
          if (bytesIdx >= 0 && !r.isNullAt(bytesIdx)) tally += r.getLong(bytesIdx)
          val id = batchId
          // ...then test triggers; a hit closes THIS batch (row included)
          val triggered =
            (count > 0 && nParts >= count) ||
            (byteSize > 0 && tally >= byteSize) ||
            (!r.isNullAt(checkIdx) && r.getBoolean(checkIdx))
          if (triggered) { batchId += 1; nParts = 0; tally = 0L }
          Row.fromSeq(r.toSeq :+ id)
        }
      }(RowEncoder.encoderFor(schema))
    out.drop("_bp_bytes", "_bp_check", "_bp_ts")
  }
}
