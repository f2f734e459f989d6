package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Dedup

/** Window-drift-immune A/B for the r20 fused chained-xxhash kernel:
  * times the fused UDF loop against the pure-Column zip_with chain over
  * the SAME checkpointed token arrays, interleaved A,B,A,B,... in one
  * JVM so host decay hits both arms equally. Forces full evaluation with
  * the bench's bit_xor(xxhash64) fold over the exploded digests.
  *
  * Usage: runMain graft.FusedKernelProbe <sfDir> [reps=5]
  */
object FusedKernelProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
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

    val toks = QueriesLlm.plantedCorpus(spark, sfDir)
      .repartition(core.Tables.fanout(spark))
      .select(col("doc_id"), Dedup.tokens(col("text")).as("_t"))
      .localCheckpoint(true)
    toks.count()
    val th = transform(col("_t"), x => xxhash64(x))

    def wall(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(c: org.apache.spark.sql.Column): Unit = {
      toks.select(col("doc_id"), posexplode(c).as(Seq("p", "h")))
        .agg(bit_xor(xxhash64(col("p"), col("h")))).collect(): Unit
    }
    for (w <- Seq(5, 15)) {
      val fused = Dedup.windowDigests(col("_t"), w)
      val ref = Dedup.chainedXxhashCols(th, w)
      force(fused); force(ref) // codegen warmup both arms
      val (fs, rs) = (1 to reps).map { _ =>
        (wall(force(fused)), wall(force(ref)))
      }.unzip
      println(f"""{"fusedkernelprobe":"w$w","fused_min":${fs.min}%.3f,"cols_min":${rs.min}%.3f,"fused":[${fs.map(x => f"$x%.3f").mkString(",")}],"cols":[${rs.map(x => f"$x%.3f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
