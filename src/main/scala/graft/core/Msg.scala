package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canonical message envelope — the Spark mapping of the reference's
  * message part (raw bytes + structured facet + metadata + error facet;
  * reference: internal/message/data.go:6-17).
  *
  * | facet      | column    | type                    |
  * |------------|-----------|-------------------------|
  * | content    | `content` | StringType (payload; JSON text for structured) |
  * | metadata   | `meta`    | MapType(String, String) |
  * | error      | `error`   | StringType, null = ok (reference: data.go:195-201) |
  * | batch seq  | `seq`     | LongType (reference SortGroup, sort_group.go:7-39) |
  *
  * The error facet is the backbone of try/catch/drop_on/reject_errored
  * routing: a failed operator writes `error` instead of killing the job,
  * downstream combinators filter on it (see [[graft.operators.Catch]]).
  */
object Msg {
  val ContentCol = "content"
  val MetaCol = "meta"
  val ErrorCol = "error"
  val SeqCol = "seq"

  val schema: StructType = StructType(Seq(
    StructField(ContentCol, StringType, nullable = true),
    StructField(MetaCol, MapType(StringType, StringType), nullable = true),
    StructField(ErrorCol, StringType, nullable = true),
    StructField(SeqCol, LongType, nullable = false)))

  /** Wrap an arbitrary DataFrame into the envelope: every non-envelope
    * column is serialized into the JSON `content` facet. Lazily evaluated
    * per-row by codegen'd `to_json` — no driver-side work.
    */
  def envelope(df: DataFrame, contentCols: Seq[String] = Nil): DataFrame = {
    val cols = if (contentCols.nonEmpty) contentCols else df.columns.toSeq
    df.select(
      to_json(struct(cols.map(col): _*)).as(ContentCol),
      map().cast(MapType(StringType, StringType)).as(MetaCol),
      lit(null).cast(StringType).as(ErrorCol),
      monotonically_increasing_id().as(SeqCol))
  }

  /** Parse the JSON content facet back to typed columns (the structured
    * facet). Equivalent to the reference's lazy `AsStructured()`
    * (data.go:32-37) — here it's an explicit, schema-ful boundary.
    */
  def structured(df: DataFrame, schema: StructType): DataFrame =
    df.withColumn("_doc", from_json(col(ContentCol), schema))

  def errored: Column = col(ErrorCol).isNotNull
  def ok: Column = col(ErrorCol).isNull

  /** Set the error facet where `cond` holds (idempotent, keeps first error). */
  def markError(df: DataFrame, cond: Column, message: Column): DataFrame =
    df.withColumn(ErrorCol,
      when(col(ErrorCol).isNotNull, col(ErrorCol))
        .when(cond, message)
        .otherwise(lit(null).cast(StringType)))

  /** Error-source label facet (reference `error_source_label()` —
    * functions.go:355-426): which component failed. Stored as a second
    * column so DLQ consumers can route by origin. */
  val ErrorLabelCol = "error_label"

  def markErrorLabeled(df: DataFrame, cond: Column, message: Column, label: String): DataFrame = {
    val base = if (df.columns.contains(ErrorLabelCol)) df
      else df.withColumn(ErrorLabelCol, lit(null).cast(StringType))
    markError(base, cond, message)
      .withColumn(ErrorLabelCol,
        when(col(ErrorLabelCol).isNotNull, col(ErrorLabelCol))
          .when(cond && col(ErrorCol).isNotNull, lit(label))
          .otherwise(col(ErrorLabelCol)))
  }

  def errorSourceLabel: Column = col(ErrorLabelCol)

  /** Metadata write: `meta k = v` (reference: mapping_parser.go:45-60). */
  def setMeta(df: DataFrame, key: String, value: Column): DataFrame =
    df.withColumn(MetaCol,
      map_concat(
        map_filter(coalesce(col(MetaCol), map().cast(MapType(StringType, StringType))),
          (k, _) => k =!= lit(key)),
        map(lit(key), value.cast(StringType))))

  /** Metadata read: `meta("k")` / `@k`. */
  def meta(key: String): Column = col(MetaCol).getItem(key)
}
