package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporal-video-dedup scale probe (r15 verdict #7): times the
  * llm_vhash_pairs pipeline over a scaled dir with the FRAME COUNT as a
  * fixture knob. The gate's 130-frame synthetic AVIs cost ~50 GB of
  * generated video per 100x run — all fixture, no operator — so the
  * scale point uses a reduced-frame variant (e.g. 16 frames): the
  * banding/pairing machinery under measurement is IDENTICAL (vHash64
  * resamples any frame count onto its 65-slot grid; fingerprints are
  * 8 bytes either way), only the row-local synth+decode work shrinks.
  * Prints wall AND planted-twin recall (PhashProbe's contract).
  *
  * MEASURED CONSTRAINT on the frame knob: below 65 frames the grid
  * repeats frames across slots, so the repeated-slot comparison bits
  * are structurally ZERO for every video — at 16 frames only ~15 of 64
  * bits carry entropy, every video collides into a handful of bucket
  * keys per block, the degenerate-bucket cap drops them ALL, and the
  * pipeline emits zero pairs (measured at 1x before this note; the
  * fixture distorted the banding statistics it was meant to hold
  * constant). 65 frames = exactly one frame per slot = full 64-bit
  * entropy at half the gate fixture's 130-frame synth cost — the
  * smallest honest reduction.
  *
  * Usage: runMain graft.VhashProbe <dir> <nFrames> [maxHamming=7]
  * (radius 7 is the gate form; radius 3 = 16-bit blocks is the scale
  * form, same as llm_phash_pairs_r3 — at >=1M fingerprints radius 7's
  * 256-bucket blocks saturate the degenerate-bucket cap)
  */
object VhashProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nf) = args.take(2)
    val nFrames = nf.toInt
    val maxHamming = args.lift(2).map(_.toInt).getOrElse(7)
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
    val mk = udf((k: Long) => graft.ml.Multimodal.syntheticVideoAvi(k, nFrames = nFrames))
    val mkTwin = udf((k: Long) =>
      graft.ml.Multimodal.syntheticVideoAvi(k, nFrames = nFrames, brighten = 3))
    def run(): (Double, Long, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      val ids = graft.core.Tables(spark, dir, "documents").select("doc_id")
        .repartition(graft.core.Tables.fanout(spark)) // distribute synth+decode+hash
      val media = ids.select(col("doc_id").as("media_id"), mk(col("doc_id")).as("data"))
        .unionByName(ids.select((col("doc_id") + off).as("media_id"),
          mkTwin(col("doc_id")).as("data")))
      val out = graft.ml.Dedup.hammingBandedPairs(
        graft.ml.Multimodal.vhashAvi(media, "media_id", "data"),
        "media_id", "vhash", maxHamming = maxHamming)
      val agg = out.agg(count(lit(1)),
        coalesce(sum(when(col("id_b") === col("id_a") + off, 1L).otherwise(0L)),
          lit(0L))).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
    }
    run() // codegen + scan warmup at full size
    val (wall, pairs, twins) = run()
    println(f"""{"vhashprobe":"${ProbeJson.jstr(dir)}","n_frames":$nFrames,"max_hamming":$maxHamming,"n_videos":${2 * nDocs},"pairs":$pairs,"twin_pairs":$twins,"twin_recall":${twins.toDouble / nDocs}%.4f,"wall":$wall%.3f}""")
    spark.stop()
  }
}
