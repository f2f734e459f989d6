package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming-resolution scale probe: times the incremental union-find
  * (stream_phash_resolve's machinery — pair stream → foreachBatch
  * island-merge into a compact node→label state, see
  * [[QueriesLlm.runIncrementalResolve]]) against the one-shot batch
  * form (pairs → one connectedComponents run) over the SAME fixture,
  * and asserts their labelings equal at scale (confluence, measured —
  * not just spec'd at the gate SF).
  *
  * Fixture: the band-sig fingerprints (md5-derived, planted bit-flip
  * twins — arithmetic, no decode), radius 3 / 4×16-bit blocks (the
  * scale form: the fixture's 60-bit fingerprints make radius 7's high
  * 8-bit block a 16-key space that degenerates at scale). The probe
  * therefore times pair STREAMING plus per-batch CC compaction, not
  * fixture synthesis.
  *
  * Usage: runMain graft.ResolveProbe <dir> <nSplits> [compactEvery=1] [localEdgeLimit] [cap=1000]
  * (localEdgeLimit=0 forces the distributed CC path at any size;
  * `cap` raises BOTH the batch retroactive and streaming prospective
  * bucket caps — the r16 100×-point blocker was the fixture's top
  * 12-bit block crossing cap 1000 at 5M sigs (~1.2k/bucket), where the
  * prospective/retroactive difference breaks batch==stream BY DESIGN;
  * a cap above the occupancy keeps both caps inert and the confluence
  * comparison valid at 100×)
  */
object ResolveProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, ns) = args.take(2)
    val nSplits = ns.toInt
    val compactEvery = args.lift(2).map(_.toInt).getOrElse(1)
    val localEdgeLimit = args.lift(3).map(_.toLong).getOrElse(2000000L)
    val cap = args.lift(4).map(_.toInt).getOrElse(1000)
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
    import spark.implicits._

    val (b0, t0df) = QueriesLlm.bandSigParts(spark, dir)
    val sigs = b0.unionByName(t0df).localCheckpoint(false) // fixture computed once
    val nSigs = sigs.count()

    // ---- batch reference: pairs + ONE connectedComponents run
    val maxHamming = 3
    val blocks = 4
    val bits = 64 / blocks
    val mask = (1L << bits) - 1L
    val tb = System.nanoTime()
    val bPairs = graft.ml.Dedup.hammingBandedPairs(sigs, "id", "fp", maxHamming,
        maxBucketSize = cap)
      .select("id_a", "id_b").localCheckpoint(false)
    val bNodes = bPairs.select(col("id_a").as("node"))
      .unionByName(bPairs.select(col("id_b").as("node"))).distinct()
    val bLabels = graft.ml.Dedup.connectedComponents(bNodes, bPairs)
      .localCheckpoint(false)
    val nBatch = bLabels.count()
    val batchWall = (System.nanoTime() - tb) / 1e9

    // ---- streaming incremental: nSplits micro-batches through the
    // SAME banding (StreamPhash) then per-batch island-merge compaction
    val inDir = QueriesCore.writeSplitDir("resprobe_in",
      (0 until nSplits).map(i =>
        (sigs.filter(pmod(col("id"), lit(nSplits)) === i)
          .select(col("id").as("media_id"), col("fp").as("data")),
          f"$i%02d_media.parquet")))
    val schema = spark.read.parquet(inDir.resolve("00_media.parquet").toString).schema
    val ts = System.nanoTime()
    val occ = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .repartition(graft.core.Tables.fanout(spark))
      .select(col("media_id"), col("data"),
        posexplode(array((0 until blocks).map(i =>
          shiftright(col("data"), i * bits).bitwiseAND(lit(mask))): _*))
          .as(Seq("_blk", "_key")))
      .toDF("_1", "_2", "_3", "_4").as[(Long, Long, Int, Long)]
    val sPairs = graft.streaming.StreamPhash.candidatePairs(
      occ, maxHamming = maxHamming, blocks = blocks, maxBucketSize = cap)
    val state = QueriesLlm.runIncrementalResolve(spark, sPairs, compactEvery, localEdgeLimit)
      .getOrElse(sys.error("no pairs streamed"))
    val nState = state.count()
    val streamWall = (System.nanoTime() - ts) / 1e9

    // confluence AT SCALE: incremental-fold labels == one-shot labels.
    // FULL OUTER join so membership differences count too — an inner
    // join plus a row-count delta can report 0 for two equal-sized node
    // sets that disagree on WHICH nodes they label (review finding r16)
    val diff = state.withColumnRenamed("label", "_l")
      .join(bLabels, Seq("node"), "full_outer")
      .filter(col("_l").isNull || col("label").isNull || col("_l") =!= col("label"))
      .count()
    println(f"""{"resolveprobe":"${ProbeJson.jstr(dir)}","n_sigs":$nSigs,"splits":$nSplits,"compact_every":$compactEvery,"local_edge_limit":$localEdgeLimit,"batch_wall":$batchWall%.3f,"stream_wall":$streamWall%.3f,"state_rows":$nState,"label_diffs":$diff}""")
    spark.stop()
  }
}
