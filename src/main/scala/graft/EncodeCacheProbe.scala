package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Encode-cache receipt probe (r16 verdict #5: replace the simulated
  * evict-half number with a measurement on the REAL corpus): runs
  * [[graft.ml.Bpe.encodeDocs]] over `documents` with (hits, misses)
  * accumulators threaded through the per-partition word cache, under a
  * chosen cache cap and overflow policy. At the production cap the
  * driver corpus never overflows (31-word vocab ≪ 2^20) — the probe's
  * cap knob forces the overflow regime so evict-half and clear() can be
  * compared on real data, not a synthetic Zipf stream.
  *
  * Usage: runMain graft.EncodeCacheProbe <dir> [cacheLimit=1048576] [policy=half|clear]
  */
object EncodeCacheProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cacheLimit = args.lift(1).map(_.toInt).getOrElse(1 << 20)
    val policy = args.lift(2).getOrElse("half")
    require(policy == "half" || policy == "clear", s"policy half|clear, got $policy")
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
      .repartition(graft.core.Tables.fanout(spark))
    val merges = graft.ml.Bpe.bpeMerges(docs, "text", nMerges = 30)
      .orderBy("rank").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val hits = spark.sparkContext.longAccumulator("encode_cache_hits")
    val misses = spark.sparkContext.longAccumulator("encode_cache_misses")
    val t0 = System.nanoTime()
    val nTok = graft.ml.Bpe.encodeDocs(docs, "doc_id", "text", merges,
        cacheLimit = cacheLimit, cacheStats = Some((hits, misses)),
        clearOnOverflow = policy == "clear")
      .agg(sum(size(col("bpe")))).collect()(0).getLong(0)
    val wall = (System.nanoTime() - t0) / 1e9
    val h = hits.value
    val m = misses.value
    val rate = if (h + m == 0) 0.0 else h.toDouble / (h + m)
    println(f"""{"encodecache":"${ProbeJson.jstr(dir)}","cache_limit":$cacheLimit,"policy":"${ProbeJson.jstr(policy)}","hits":$h,"misses":$m,"hit_rate":$rate%.6f,"n_subwords":$nTok,"wall":$wall%.3f}""")
    spark.stop()
  }
}
