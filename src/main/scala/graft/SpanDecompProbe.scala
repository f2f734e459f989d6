package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** Stage decomposition for the dup-span rows (r19 verdict #4): where do
  * llm_dup_spans_skew's seconds actually go? Times, in one JVM over the
  * gate's own corpus construction, successive prefixes of the pipeline:
  *   synth    — the synthetic-corpus explode + string build + tokenize
  *   digests  — + windowDigests explode (the fused kernel)
  *   stats    — + the per-digest count aggregate (the skew-sensitive agg)
  *   full     — the complete dupSpans (join-back + island merge)
  * and reports the per-digest occurrence skew (max/median) the stats
  * aggregate absorbs, so the "does any reducer dominate" question has a
  * measured answer instead of a plan-shape argument.
  *
  * Usage: runMain graft.SpanDecompProbe <sfDir> [reps=3]
  */
object SpanDecompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables

    // the llm_dup_spans_skew construction, verbatim
    val amp = 20
    val w = 15
    val viral = (1 to 15).map(i => s"b$i").mkString(" ")
    def tail(p: String, k: Int) = concat_ws(" ",
      (1 to k).map(j => concat(lit(p), col("id"), lit(s"x$j"))): _*)
    def docs = Tables(spark, sfDir, "documents").select(
        explode(sequence(col("doc_id") * amp, col("doc_id") * amp + (amp - 1))).as("id"))
      .repartition(Tables.fanout(spark))
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, concat(lit(viral + " "), tail("u", 5)))
          .otherwise(tail("q", 20)).as("text"))

    def wall(f: => Unit): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def toks = docs.select(col("doc_id"), Dedup.tokens(col("text")).as("_t"))
      .filter(size(col("_t")) >= w)
    def occ = toks.select(col("doc_id"),
      posexplode(Dedup.windowDigests(col("_t"), w)).as(Seq("pos", "h")))

    def synth(): Unit = { toks.agg(bit_xor(xxhash64(col("doc_id"), size(col("_t"))))).collect(): Unit }
    def digests(): Unit = { occ.agg(bit_xor(xxhash64(col("pos"), col("h")))).collect(): Unit }
    def stats(): Unit = { occ.groupBy("h").agg(count(lit(1)).as("_c"))
      .filter(col("_c") >= 2).agg(bit_xor(xxhash64(col("h"), col("_c")))).collect(): Unit }
    def full(): Unit = {
      val df = Dedup.dupSpans(docs, "doc_id", "text", w = w)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect(): Unit
    }
    // key-skew receipt: per-digest occurrence counts, max vs median
    val dist = occ.groupBy("h").agg(count(lit(1)).as("_c"))
      .agg(max("_c"), expr("percentile_approx(_c, 0.5)"), count(lit(1))).head()
    val (mx, med, nk) = (dist.getLong(0), dist.getLong(1), dist.getLong(2))

    synth(); digests(); stats(); full() // codegen warmup
    val rows = Seq("synth" -> synth _, "digests" -> digests _,
      "stats" -> stats _, "full" -> full _).map { case (tag, f) =>
      val ws = (1 to reps).map(_ => wall(f()))
      f""""$tag":${ws.min}%.3f"""
    }
    println(rows.mkString(
      s"""{"spandecompprobe":"${ProbeJson.jstr(sfDir)}","max_key":$mx,"median_key":$med,"n_keys":$nk,""",
      ",", "}"))
    spark.stop()
  }
}
