package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Streaming-SemDeDup scale probe (SCALING.md round 14): the
  * frozen-centroid stream ([[graft.streaming.StreamSemDedup]]) over a
  * scaled dir with `nCells` passed in — the SAME scale knob as the batch
  * SemProbe: per-cell state (and the per-arrival compare cost against
  * it) is O(corpus/nCells), so cells must grow with the corpus exactly
  * as they must for batch pair generation. Assignment switches to the
  * two-level probe at nCells ≥ 64, mirroring semDedup. N doc-striped
  * splits = N micro-batches; noop sink (the StateProbe lesson: a memory
  * sink accumulates every row on the driver and mismeasures the
  * operator); state rows / emitted come from a StreamingQueryListener.
  *
  * Usage: runMain graft.StreamSemProbe <dir> <nCells> <nSplits> [mem|rocksdb]
  */
object StreamSemProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nCellsS, nSplitsS) = args.take(3)
    val nCells = nCellsS.toInt
    val nSplits = nSplitsS.toInt
    val provider = args.lift(3).getOrElse("mem")
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

    // the SemProbe planted corpus: embeddings ∪ perturbed twins with a
    // collision-free offset from the actual max vec_id
    val emb0 = graft.core.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").repartition(core.Tables.fanout(spark))
    val off = emb0.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = emb0.unionByName(emb0.select((col("vec_id") + off).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * 1.05f + 0.01f).otherwise(x)).as("embedding")))

    // frozen centroids: trained ONCE (the deployment's one-time cost —
    // excluded from the streaming wall, like stream_lm_score's model)
    val cents = Similarity.ivfCentroids(corpus, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2)
    val assign = if (nCells >= Similarity.hierAssignThreshold)
                   Similarity.assignCellHier(cents)
                 else Similarity.assignCell(cents)
    val ccos = Similarity.centroidCos(cents)

    val inDir = QueriesCore.writeSplitDir("ssdprobe_in",
      (0 until nSplits).map(i =>
        (corpus.filter(pmod(col("vec_id"), lit(nSplits)) === i), f"$i%02d_emb.parquet")))
    val schema = spark.read.parquet(inDir.resolve("00_emb.parquet").toString).schema

    val pm = new ProbeMetrics(spark)

    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .repartition(core.Tables.fanout(spark))
      .select(col("vec_id"), Similarity.normalized(col("embedding")).as("_nv"))
      .withColumn("_cell", assign(col("_nv")))
      .withColumn("_ccos", ccos(col("_cell"), col("_nv")))
      .select("vec_id", "_cell", "_ccos", "_nv")
      .as[(Long, Int, Double, Seq[Double])]
    val decided = graft.streaming.StreamSemDedup.keepDecisions(stream, threshold = 0.95)

    val ckpt = java.nio.file.Files.createTempDirectory("ssdprobe_ckpt").toFile
    ckpt.deleteOnExit()
    val t0 = System.nanoTime()
    val q = decided.writeStream.format("noop").queryName("ssdprobe_sink")
      .outputMode("append").option("checkpointLocation", ckpt.getPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    pm.bind(q) // pin the session-wide listener to this query (r15 advice)
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    pm.finish(q)
    println(f"""{"streamsemprobe":"${ProbeJson.jstr(dir)}","n_cells":$nCells,"splits":$nSplits,"provider":"${ProbeJson.jstr(provider)}","state_rows":${pm.stateRows},"state_bytes":${pm.stateBytes},"emitted":${pm.emitted.get()},"rows_removed":${pm.removed.get()},"wall":$wall%.3f}""")
    spark.stop()
  }
}
