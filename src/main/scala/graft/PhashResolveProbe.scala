package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Perceptual-dedup RESOLUTION scale probe (SCALING.md round 15, r14
  * verdict #7): times the llm_phash_resolve composition — dHash pairs
  * (at the radius passed in; 3 is the ≥1M-image scale form) → shared
  * path-doubling connectedComponents → min-id canonical — over a scaled
  * dir. The composition's scale question is the CC step: its rounds are
  * log(diameter) and the planted twin graph keeps components tiny
  * (diameter 1), so the probe separates the pair wall from the resolve
  * wall to show where a scale-up lands.
  *
  * Usage: runMain graft.PhashResolveProbe <dir> <maxHamming>
  */
object PhashResolveProbe {
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

    val ids0 = graft.core.Tables(spark, dir, "documents").select("doc_id")
      .repartition(core.Tables.fanout(spark))
    val off = ids0.agg(max("doc_id")).head().getLong(0) + 1
    val mk = udf((k: Long) => graft.ml.Multimodal.syntheticImageBmp(k))
    val mkTwin = udf((k: Long) => graft.ml.Multimodal.syntheticImageBmp(k, brighten = 3))
    val media = ids0.select(col("doc_id").as("media_id"), mk(col("doc_id")).as("data"))
      .unionByName(ids0.select((col("doc_id") + off).as("media_id"),
        mkTwin(col("doc_id")).as("data")))
    val nodes = ids0.select(col("doc_id").as("node"))
      .unionByName(ids0.select((col("doc_id") + off).as("node")))

    def run(): (Double, Double, Long, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      // pairs materialized once (the composition's upstream cost) so the
      // CC wall is separable — llm_phash_resolve itself runs them fused
      val pairs = graft.ml.Dedup.hammingBandedPairs(
          graft.ml.Multimodal.dhashBmp(media, "media_id", "data"),
          "media_id", "dhash", maxHamming = maxHamming)
        .select("id_a", "id_b").localCheckpoint(true)
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val resolved = graft.ml.Dedup.connectedComponents(nodes, pairs)
      val nClusters = resolved.select("label").distinct().count()
      val t2 = System.nanoTime()
      pairs.unpersist()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9, nPairs, nClusters)
    }
    run() // codegen + scan warmup at full size
    val (pairWall, ccWall, nPairs, nClusters) = run()
    println(f"""{"phashresolveprobe":"${ProbeJson.jstr(dir)}","max_hamming":$maxHamming,"n_images":${2 * ids0.count()},"pairs":$nPairs,"clusters":$nClusters,"pair_wall":$pairWall%.3f,"cc_wall":$ccWall%.3f,"wall":${pairWall + ccWall}%.3f}""")
    spark.stop()
  }
}
