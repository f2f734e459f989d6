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
  * `synth:<nWords>` instead of a dir sizes the measurement to a
  * PRODUCTION vocabulary: the driver corpus is a tiny closed vocabulary
  * (31 distinct words at every SF — the merge loop runs dry at ~107
  * merges), so the in-memory path's real question — 32k merges over the
  * tens-of-millions-of-words vocabulary a 100 TB web corpus yields —
  * needs a synthetic word table. Deterministic pseudo-words (4-13
  * lowercase chars via splitmix64) under a Zipf frequency law feed
  * [[graft.ml.Bpe.mergesLocal]] DIRECTLY (no SparkSession: past the one
  * corpus word-count pass the operator IS this driver-side loop, so the
  * probe measures exactly the post-collect footprint the
  * defaultLocalVocabLimit is sized by).
  *
  * Usage: runMain graft.BpeProbe <dir|synth:nWords> <nMerges> [localVocabLimit]
  */
object BpeProbe {
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def synthWordFreq(nWords: Int): Array[(String, Long)] = {
    // Morpheme-composed words, not uniform-random strings: natural
    // vocabularies share subword structure (BPE's premise), so merges
    // consolidate and affected-word sets shrink as training proceeds.
    // Uniform-random letters are BPE's pathological case — all ~676
    // bigrams stay near-tied and every merge keeps touching ~1% of the
    // vocabulary (measured: 4M random words were still merging at 24
    // minutes where this form finishes in 5) — and no web corpus looks
    // like that.
    val nMorph = 4096
    val morphs = new Array[String](nMorph)
    var m = 0
    while (m < nMorph) {
      val h = mix64(0xABCDEF00L + m)
      val len = 2 + java.lang.Long.remainderUnsigned(h, 5L).toInt
      val sb = new java.lang.StringBuilder(len)
      var j = 0
      while (j < len) {
        sb.append(('a' + java.lang.Long.remainderUnsigned(mix64(h + j), 26L)).toChar)
        j += 1
      }
      morphs(m) = sb.toString
      m += 1
    }
    val out = new Array[(String, Long)](nWords)
    var i = 0
    while (i < nWords) {
      val h = mix64(i.toLong)
      val k = 1 + java.lang.Long.remainderUnsigned(h, 3L).toInt
      val sb = new java.lang.StringBuilder(12)
      var j = 0
      while (j <= k) {
        // Zipf-ish morpheme choice: quadratic rank skew favors a head
        // inventory, the way natural morphemes distribute
        val r = java.lang.Long.remainderUnsigned(mix64(h + 17 * j), (nMorph.toLong * nMorph))
        sb.append(morphs(math.sqrt(r.toDouble).toInt.min(nMorph - 1)))
        j += 1
      }
      // Zipf: rank-i frequency ~ N/(i+1), floor 1 — the shape that makes
      // the vocabulary ≪ corpus in the first place
      out(i) = (sb.toString, math.max(1L, nWords.toLong / (i + 1)))
      i += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val Array(dir, nMergesS) = args.take(2)
    val nMerges = nMergesS.toInt
    val localLimit = args.lift(2).map(_.toLong)
      .getOrElse(graft.ml.Bpe.defaultLocalVocabLimit)

    if (dir.startsWith("synth:")) {
      val nWords = dir.stripPrefix("synth:").toInt
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
      // baseline BEFORE the word table is allocated: the real local path
      // collects the table inside its run window, so the probe's
      // peak-minus-baseline must include it too — defaultLocalVocabLimit
      // is sized by table + loop, not loop alone
      System.gc()
      val baseline = rt.totalMemory() - rt.freeMemory()
      sampler.start()
      val t0 = System.nanoTime()
      val wordFreq = synthWordFreq(nWords)
      val learned = graft.ml.Bpe.mergesLocal(wordFreq, nMerges).length
      val wall = (System.nanoTime() - t0) / 1e9
      sampling = false
      println(f"""{"bpeprobe":"${ProbeJson.jstr(dir)}","n_merges":$nMerges,"learned":$learned,"n_words":$nWords,"path":"local","peak_heap_mb":${(peakUsed - baseline).max(0L) / 1024 / 1024},"wall":$wall%.3f}""")
      return
    }
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
    println(f"""{"bpeprobe":"${ProbeJson.jstr(dir)}","n_merges":$nMerges,"learned":$learned,"n_words":$nWords,"path":"${ProbeJson.jstr(path)}","peak_heap_mb":${(peakUsed - baseline).max(0L) / 1024 / 1024},"wall":$wall%.3f}""")
    spark.stop()
  }
}
