package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE merge-axis probe (SCALING.md round 15, closing r14 verdict #1):
  * times [[graft.ml.Bpe.bpeMerges]] at PRODUCTION merge counts (≥1k —
  * the gated 30 merges exercise correctness, this exercises the axis a
  * 32k-50k-merge tokenizer actually scales on) and measures the two
  * quantities the driver-side fork is sized by:
  *
  *  - `n_words`: the distinct-word count at the dir — the value compared
  *    against [[graft.ml.Bpe.defaultLocalVocabLimit]];
  *  - `peak_heap_mb`: max used JVM heap observed by a 50 ms sampler
  *    thread across the run — the driver-memory cost of the collected
  *    word table + Sennrich's incremental pair index (the in-memory
  *    loop's entire footprint lives inside the run window).
  *
  * Pass localVocabLimit=0 to force the distributed per-merge loop and
  * measure the scheduling-latency axis the fork exists to avoid.
  *
  * Usage: runMain graft.BpeProbe <dir> <nMerges> [localVocabLimit]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nMergesS) = args.take(2)
    val nMerges = nMergesS.toInt
    val localLimit = args.lift(2).map(_.toLong)
      .getOrElse(graft.ml.Bpe.defaultLocalVocabLimit)
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

    val docs = graft.core.Tables(spark, dir, "documents")
      .repartition(core.Tables.fanout(spark))
    val nWords = docs
      .select(explode(graft.ml.Dedup.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1))).count()

    // peak-heap sampler: the in-memory merge loop's footprint (collected
    // word table + symbol seqs + pair counts + inverted index + heap)
    // exists only DURING the run — sample it, don't model it
    @volatile var sampling = true
    @volatile var peakUsed = 0L
    val rt = Runtime.getRuntime
    val sampler = new Thread(() => {
      while (sampling) {
        peakUsed = math.max(peakUsed, rt.totalMemory() - rt.freeMemory())
        Thread.sleep(50)
      }
    })
    sampler.setDaemon(true)

    System.gc()
    val baseline = rt.totalMemory() - rt.freeMemory()
    sampler.start()
    val t0 = System.nanoTime()
    val merges = graft.ml.Bpe.bpeMerges(docs, "text", nMerges,
      localVocabLimit = localLimit)
    val learned = merges.count()
    val wall = (System.nanoTime() - t0) / 1e9
    sampling = false
    val path = if (nWords <= localLimit) "local" else "dist"
    println(f"""{"bpeprobe":"$dir","n_merges":$nMerges,"learned":$learned,"n_words":$nWords,"path":"$path","peak_heap_mb":${(peakUsed - baseline).max(0L) / 1024 / 1024},"wall":$wall%.3f}""")
    spark.stop()
  }
}
