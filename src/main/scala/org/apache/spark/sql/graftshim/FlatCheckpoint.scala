package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Bound a `localCheckpoint`'ed frame's carried origin stats.
  *
  * Spark 4's Dataset.checkpoint family captures the ORIGIN plan's
  * Statistics into the resulting LogicalRDD (`originStats`) so the
  * optimizer keeps accurate sizes across the checkpoint. Inside an
  * ITERATIVE JOIN LOOP (connectedComponents: every round self-joins the
  * previous round's checkpoint) that feature is quadratically
  * self-defeating: round r's origin stats multiply round r-1's
  * sizeInBytes at each join, so the captured BigInt DOUBLES IN BIT
  * LENGTH per round. Fast-converging graphs (<= ~15 rounds) never
  * notice; a slow-converging topology (measured: a 300-link chain plus
  * random attachments, CcChainProbe `chainrandom`) reaches rounds ~30
  * where each stats visit spends MINUTES in BigInteger.multiply and
  * then dies with "BigInteger would overflow supported range" — inside
  * Catalyst planning, before any require() can report non-convergence.
  *
  * cap() rebuilds the Dataset around the SAME checkpointed RDD with the
  * origin sizeInBytes/rowCount CLAMPED to Long.MaxValue: sizes small
  * enough to matter (broadcast-join decisions) pass through EXACTLY, so
  * plans are unchanged for real workloads, while the per-round doubling
  * is cut at a constant — computing round r's stats only ever multiplies
  * clamped leaves. (Dropping originStats entirely also fixes the
  * blowup but forfeits planning-time broadcasts — measured 3x slower
  * distributed CC at probe scale.) Lives in the org.apache.spark.sql
  * tree solely for access to the private[sql] Dataset.ofRows /
  * LogicalRDD (the CheckpointRelease pattern).
  */
object FlatCheckpoint {
  private val cap = BigInt(Long.MaxValue)
  def capStats(df: DataFrame): DataFrame = df.queryExecution.analyzed match {
    case lr: LogicalRDD =>
      val s = lr.stats // cheap: this frame's leaves are already capped
      val capped = Statistics(
        sizeInBytes = s.sizeInBytes.min(cap),
        rowCount = s.rowCount.map(_.min(cap)),
        attributeStats = s.attributeStats,
        isRuntime = s.isRuntime)
      val session = df.sparkSession.asInstanceOf[SparkSession]
      // thread the origin constraints through unchanged (r16 advice):
      // lr.constraints IS the origin set the checkpoint carried, already
      // filtered to deterministic exprs over lr.output — dropping it
      // would silently lose filter inference the pure stats clamp
      // never meant to touch
      Dataset.ofRows(session,
        LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(session, Some(capped), Some(lr.constraints)))
    case _ => df
  }
}
