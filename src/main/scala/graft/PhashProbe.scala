package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perceptual-dedup scale probe (SCALING.md round 14): times the
  * llm_phash_pairs pipeline over a scaled dir with the Hamming radius as
  * the scale knob (see [[QueriesLlm.phashPairs]]: radius 7 → 8-bit
  * blocks → 256 buckets/block, saturated past the bucket cap by a
  * ≥1M-image corpus; radius 3 → 16-bit blocks → 65536 buckets/block —
  * the multi-index-hashing block-width-vs-radius trade). Prints wall AND
  * planted-twin recall so the radius trade is measured, not asserted:
  * banding GUARANTEES pairs within the radius; twins whose dHash drifted
  * further (clamp effects) may still pair via a matching block, or be
  * missed.
  *
  * Usage: runMain graft.PhashProbe <dir> <maxHamming>
  */
object PhashProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, mh) = args.take(2)
    val maxHamming = mh.toInt
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

    val off = QueriesLlm.twinOffset(spark, dir)
    val nDocs = graft.core.Tables(spark, dir, "documents").count()
    def run(): (Double, Long, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      val out = QueriesLlm.phashPairs(spark, dir, maxHamming)
      val agg = out.agg(count(lit(1)),
        sum(when(col("id_b") === col("id_a") + off, 1L).otherwise(0L))).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
    }
    run() // codegen + scan warmup at full size
    val (wall, pairs, twins) = run()
    println(f"""{"phashprobe":"${ProbeJson.jstr(dir)}","max_hamming":$maxHamming,"n_images":${2 * nDocs},"pairs":$pairs,"twin_pairs":$twins,"twin_recall":${twins.toDouble / nDocs}%.4f,"wall":$wall%.3f}""")
    spark.stop()
  }
}
