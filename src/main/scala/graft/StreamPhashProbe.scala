package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming perceptual-pairs scale probe (SCALING.md round 15, r14
  * verdict #7): [[graft.streaming.StreamPhash]] over a scaled dir —
  * measures STATE growth per image and the mem-vs-RocksDB provider
  * trade, the two deployment questions the batch PhashProbe can't
  * answer. The Hamming radius is the same scale knob as batch (radius 3
  * → 16-bit blocks → 65536 buckets/block keeps buckets under the cap at
  * ≥1M images); blocks derive from the radius exactly as
  * [[graft.ml.Dedup.hammingBandedPairs]] derives them, so the streamed
  * state shape matches the batch banding. Noop sink + listener metrics
  * (the StateProbe lesson); N doc-striped splits = N micro-batches.
  *
  * Block geometry comes from the STREAMING AUTO rule
  * (StreamPhash.autoBlocks — chooseBlocks fed by the ingest-meter
  * population): by default the true image count, overridable with
  * `nHint` to probe the geometry a larger deploy's meter would pick
  * (e.g. the 100× population while running 10× data — the narrowed
  * 4-block fallback in the live topology).
  *
  * Usage: runMain graft.StreamPhashProbe <dir> <maxHamming> <nSplits> [mem|rocksdb] [nHint] [uniform|measured]
  */
object StreamPhashProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, mh, nSplitsS) = args.take(3)
    val maxHamming = mh.toInt
    val nSplits = nSplitsS.toInt
    val provider = args.lift(3).getOrElse("mem")
    val nHintArg = args.lift(4).map(_.toLong)
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
    if (provider == "rocksdb") {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // starve the JNI logger callback (StateProbe's SIGSEGV workaround)
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.streaming.state.RocksDB",
        org.apache.logging.log4j.Level.ERROR)
    }
    import spark.implicits._

    // the llm_phash_pairs planted fixture at the dir's scale: per doc a
    // pseudo-random 16×16 BMP + a brightness twin at doc_id + offset
    val ids0 = graft.core.Tables(spark, dir, "documents").select("doc_id")
      .repartition(core.Tables.fanout(spark))
    val off = ids0.agg(max("doc_id")).head().getLong(0) + 1
    val mk = udf((k: Long) => graft.ml.Multimodal.syntheticImageBmp(k))
    val mkTwin = udf((k: Long) => graft.ml.Multimodal.syntheticImageBmp(k, brighten = 3))
    val media = ids0.select(col("doc_id").as("media_id"), mk(col("doc_id")).as("data"))
      .unionByName(ids0.select((col("doc_id") + off).as("media_id"),
        mkTwin(col("doc_id")).as("data")))
    val nImages = 2 * ids0.count()

    // the ingest-meter feed: true population by default, a hint to
    // probe a larger deploy's pick (r17 verdict, What's missing #2).
    // geometry = "measured" sizes from the staged backfill prints via
    // autoBlocksMeasured — the deploy DEFAULT (r18 verdict #1: the
    // uniform pick saturates on skewed prints and silently loses
    // pairs; this arm receipts that the measured default does not)
    val geometry = args.lift(5).getOrElse("uniform")
    require(geometry == "uniform" || geometry == "measured",
      s"geometry uniform|measured, got $geometry")
    val nHint = nHintArg.getOrElse(nImages)
    val blocks =
      if (geometry == "measured") {
        val sample = graft.ml.Multimodal.dhashBmp(media, "media_id", "data")
          .select(col("media_id"), col("dhash"))
        graft.streaming.StreamPhash.autoBlocksMeasured(
          sample, "media_id", "dhash", maxHamming, nHint = Some(nHint))
      } else graft.streaming.StreamPhash.autoBlocks(nHint, maxHamming)

    val inDir = QueriesCore.writeSplitDir("sphprobe_in",
      (0 until nSplits).map(i =>
        (media.filter(pmod(col("media_id"), lit(nSplits)) === i), f"$i%02d_media.parquet")))
    val schema = spark.read.parquet(inDir.resolve("00_media.parquet").toString).schema

    val pm = new ProbeMetrics(spark)

    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .repartition(core.Tables.fanout(spark))
    val occ = graft.streaming.StreamPhash.blockOccurrences(
      graft.ml.Multimodal.dhashBmp(stream, "media_id", "data"), "media_id", "dhash", blocks)
    val pairs = graft.streaming.StreamPhash.candidatePairs(
      occ, maxHamming = maxHamming, blocks = blocks)

    val ckpt = java.nio.file.Files.createTempDirectory("sphprobe_ckpt").toFile
    ckpt.deleteOnExit()
    val t0 = System.nanoTime()
    val q = pairs.writeStream.format("noop").queryName("sphprobe_sink")
      .outputMode("append").option("checkpointLocation", ckpt.getPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    pm.bind(q) // pin the session-wide listener to this query (r15 advice)
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    pm.finish(q)
    println(f"""{"streamphashprobe":"${ProbeJson.jstr(dir)}","max_hamming":$maxHamming,"blocks":$blocks,"geometry":"${ProbeJson.jstr(geometry)}","n_hint":$nHint,"splits":$nSplits,"provider":"${ProbeJson.jstr(provider)}","n_images":$nImages,"state_rows":${pm.stateRows},"state_bytes":${pm.stateBytes},"emitted":${pm.emitted.get()},"rows_removed":${pm.removed.get()},"wall":$wall%.3f}""")
    spark.stop()
  }
}
