package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** `system_window` buffer equivalent (reference: internal/impl/pure/
  * buffer_system_window.go:16-70): tumbling/sliding event-time windows with
  * offset and allowed lateness → Spark's `window()` + `withWatermark`.
  *
  * Works identically over batch DataFrames (windows become plain groups)
  * and streaming DataFrames (watermark drops late data, state store holds
  * open windows) — same code path, which is the point of building on
  * Structured Streaming.
  */
object Windows {

  /** Tumbling or sliding window grouping columns.
    * size/slide/offset use Spark interval strings ("1 hour", "30 seconds").
    */
  def systemWindow(df: DataFrame, tsCol: String, size: String,
                   slide: Option[String] = None, offset: Option[String] = None,
                   allowedLateness: Option[String] = None): DataFrame = {
    val watermarked = allowedLateness match {
      case Some(l) if df.isStreaming => df.withWatermark(tsCol, l)
      case _ => df
    }
    val win = (slide, offset) match {
      case (Some(s), Some(o)) => window(col(tsCol), size, s, o)
      case (Some(s), None) => window(col(tsCol), size, s)
      case (None, Some(o)) => window(col(tsCol), size, size, o)
      case (None, None) => window(col(tsCol), size)
    }
    watermarked.withColumn("win", win)
  }

  /** The reference's window-agg idiom (buffer_system_window.go:94-117):
    * window → group_by_value → from_all().sum() etc. */
  def windowedAgg(df: DataFrame, tsCol: String, size: String, keys: Seq[Column],
                  aggs: Seq[Column], lateness: Option[String] = None): DataFrame =
    systemWindow(df, tsCol, size, allowedLateness = lateness)
      .groupBy(col("win") +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows — absent in the reference (SURVEY §2.8) but free on
    * Spark; exposed for parity-plus. */
  def sessionAgg(df: DataFrame, tsCol: String, gap: String, keys: Seq[Column],
                 aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
}
