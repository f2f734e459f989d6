package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** QUANTIZED streaming-SemDeDup scale probe (r17 verdict, What's
  * missing #4: SemQProbe measures the batch path at 10×/100×, but
  * keepDecisionsQ — the streaming twin's state machine behind the
  * FULL-oracle stream_semdedup_q gate — had no scale row): the
  * [[StreamSemProbe]] topology in integers. Frozen ivfCentroidsQ
  * centroids (one-time cost, excluded from the streaming wall),
  * row-local quantize/assign/priority (two-level assignment at ≥64
  * cells, mirroring semDedupQ), cross-batch keyed state per cell via
  * [[graft.streaming.StreamSemDedup.keepDecisionsQ]]. Same scale knob
  * as batch: per-cell state and per-arrival compare cost are
  * O(corpus/nCells), so cells must grow with the corpus. N doc-striped
  * splits = N micro-batches; noop sink (the StateProbe lesson);
  * state/emitted from a StreamingQueryListener.
  *
  * Usage: runMain graft.StreamSemQProbe <dir> <nCells> <nSplits> [mem|rocksdb] [threshold]
  */
object StreamSemQProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nCellsS, nSplitsS) = args.take(3)
    val nCells = nCellsS.toInt
    val nSplits = nSplitsS.toInt
    val provider = args.lift(3).getOrElse("mem")
    val threshold = args.lift(4).map(_.toLong).getOrElse(4000000000L)
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

    // the SemQProbe planted corpus: embeddings ∪ perturbed twins with a
    // collision-free offset from the actual max vec_id
    val emb0 = graft.core.Tables(spark, dir, "embeddings")
      .select("vec_id", "embedding").repartition(core.Tables.fanout(spark))
    val off = emb0.agg(max("vec_id")).head().getLong(0) + 1
    val corpus = emb0.unionByName(emb0.select((col("vec_id") + off).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * 1.05f + 0.01f).otherwise(x)).as("embedding")))

    // frozen integer centroids: trained ONCE (the deployment's one-time
    // cost — excluded from the streaming wall, like stream_lm_score)
    val t0c = System.nanoTime()
    val cents = Similarity.ivfCentroidsQ(corpus, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2)
    val trainWall = (System.nanoTime() - t0c) / 1e9
    // the SAME seam constant semDedupQ switches on — not a hardcoded
    // twin that could drift if the threshold is tuned (r18 review)
    val assign = if (nCells >= Similarity.hierAssignThreshold)
                   Similarity.assignCellHierQ(cents)
                 else Similarity.assignCellQ(cents)
    val prio = Similarity.cellPriorityQ(cents)

    val inDir = QueriesCore.writeSplitDir("ssdqprobe_in",
      (0 until nSplits).map(i =>
        (corpus.filter(pmod(col("vec_id"), lit(nSplits)) === i), f"$i%02d_emb.parquet")))
    val schema = spark.read.parquet(inDir.resolve("00_emb.parquet").toString).schema

    val pm = new ProbeMetrics(spark)

    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(inDir.toString)
      .repartition(core.Tables.fanout(spark))
      .select(col("vec_id"), Similarity.quantizeVec(col("embedding"), 1048576.0).as("_qv"))
      .withColumn("_cell", assign(col("_qv")))
      .withColumn("_prio", prio(col("_cell"), col("_qv")))
      .select("vec_id", "_cell", "_prio", "_qv")
      .as[(Long, Int, Long, Seq[Long])]
    val decided = graft.streaming.StreamSemDedup.keepDecisionsQ(stream, threshold)

    val ckpt = java.nio.file.Files.createTempDirectory("ssdqprobe_ckpt").toFile
    ckpt.deleteOnExit()
    val t0 = System.nanoTime()
    val q = decided.writeStream.format("noop").queryName("ssdqprobe_sink")
      .outputMode("append").option("checkpointLocation", ckpt.getPath)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    pm.bind(q) // pin the session-wide listener to this query (r15 advice)
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    pm.finish(q)
    println(f"""{"streamsemqprobe":"${ProbeJson.jstr(dir)}","n_cells":$nCells,"splits":$nSplits,"provider":"${ProbeJson.jstr(provider)}","threshold":$threshold,"train_wall":$trainWall%.3f,"state_rows":${pm.stateRows},"state_bytes":${pm.stateBytes},"emitted":${pm.emitted.get()},"rows_removed":${pm.removed.get()},"wall":$wall%.3f}""")
    spark.stop()
  }
}
