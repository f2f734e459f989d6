package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** A pipeline stage: a pure `DataFrame => DataFrame` transform.
  *
  * The reference chains processors over Go channels
  * (internal/pipeline/pool.go:32-127); here every processor is a lazy
  * transform on the logical plan, so Catalyst sees the WHOLE pipeline at
  * once and can fuse/reorder/push down across processor boundaries —
  * something the reference's channel design structurally cannot do.
  */
trait Processor extends (DataFrame => DataFrame) { self =>
  def name: String = getClass.getSimpleName.stripSuffix("$")
  def andThen(next: Processor): Processor = new Processor {
    override def name = s"${self.name}->${next.name}"
    def apply(df: DataFrame): DataFrame = next(self(df))
  }
}

object Processor {
  def apply(nm: String)(f: DataFrame => DataFrame): Processor = new Processor {
    override def name = nm
    def apply(df: DataFrame): DataFrame = f(df)
  }
  val noop: Processor = apply("noop")(identity)
  def chain(ps: Seq[Processor]): Processor =
    ps.foldLeft(noop)(_ andThen _)
}

/** Fluent pipeline builder — the analog of the reference's
  * `service.StreamBuilder` (public/service/stream_builder.go:84) and of the
  * YAML `input → pipeline → output` layering (internal/stream/type.go:21-33).
  * It only assembles a DataFrame lineage; execution stays 100% in Spark.
  */
final case class Flow(df: DataFrame) {
  def pipe(ps: Processor*): Flow = Flow(Processor.chain(ps)(df))
  def map(f: DataFrame => DataFrame): Flow = Flow(f(df))
  def where(cond: Column): Flow = Flow(df.filter(cond))
  def union(other: Flow): Flow = Flow(df.unionByName(other.df, allowMissingColumns = true))
  def result: DataFrame = df
}

object Flow {
  def read(spark: org.apache.spark.sql.SparkSession, dir: String, table: String): Flow =
    Flow(Tables(spark, dir, table))
}
