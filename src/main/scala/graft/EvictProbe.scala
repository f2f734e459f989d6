package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Eviction-horizon recall probe (round 19 — r18 verdict, What's
  * missing #3): every retention gate runs a never-reached horizon, so
  * nothing measured the curve an operator actually tunes — missed-dup
  * rate as a function of `evictCellAfterMs`. This probe runs the
  * stream_semdedup_q topology (frozen integer centroids, keyed cell
  * state) over the planted-twin corpus with arrival engineered so the
  * original-to-twin lag VARIES by cell: originals stream cell-ascending
  * over `chunks` micro-batches, twins cell-DESCENDING over the next
  * `chunks`, with `gapMs` wall-clock between batches — cell 63's twins
  * arrive ~1 gap after its originals, cell 0's ~2·chunks−1 gaps after.
  * A horizon h therefore evicts the history of exactly the cells whose
  * lag exceeds h, and the missed-dup count traces the recall curve as
  * h sweeps from beyond the stream's span down to a single gap.
  *
  * missed(h) = kept(h) − kept(NoTimeout): a twin whose cell history was
  * evicted is KEPT (the dup goes unseen) instead of dropped.
  *
  * Usage: runMain graft.EvictProbe <dir> [nCells=64] [chunks=4] [gapMs=1500]
  */
object EvictProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = args.lift(1).map(_.toInt).getOrElse(64)
    val chunks = args.lift(2).map(_.toInt).getOrElse(4)
    val gapMs = args.lift(3).map(_.toLong).getOrElse(1500L)
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

    // the llm_semdedup_q fixture at the dir's scale: originals + planted
    // perturbed twins at +100000, quantized, frozen 64-cell model
    val emb = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val off = 100000L
    // the plantedEmb twin rule (first component ×1.05f + 0.01f)
    val twins = emb.select((col("vec_id") + off).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * 1.05f + 0.01f).otherwise(x)).as("embedding"))
    val planted = emb.unionByName(twins).repartition(graft.core.Tables.fanout(spark))
    val cents = Similarity.ivfCentroidsQ(planted, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2)
    val assign = if (cents.length >= Similarity.hierAssignThreshold)
                   Similarity.assignCellHierQ(cents)
                 else Similarity.assignCellQ(cents)
    val prio = Similarity.cellPriorityQ(cents)
    val tagged = planted
      .select(col("vec_id"), Similarity.quantizeVec(col("embedding"), 1048576.0).as("_qv"))
      .withColumn("_cell", assign(col("_qv")))
      .withColumn("_prio", prio(col("_cell"), col("_qv")))
      .select("vec_id", "_cell", "_prio", "_qv")
      .as[(Long, Int, Long, Seq[Long])]
      .collect()
    val originals = tagged.filter(_._1 < off).sortBy(r => (r._2, r._1))
    val twinRows = tagged.filter(_._1 >= off).sortBy(r => (-r._2, r._1))
    def slice(a: Array[(Long, Int, Long, Seq[Long])], i: Int) = {
      val per = (a.length + chunks - 1) / chunks
      a.slice(i * per, math.min((i + 1) * per, a.length))
    }
    val feed: Seq[Array[(Long, Int, Long, Seq[Long])]] =
      (0 until chunks).map(slice(originals, _)) ++ (0 until chunks).map(slice(twinRows, _))

    var runN = 0
    def run(evict: Option[Long]): (Long, Long, Long, Double) = {
      runN += 1
      val ss = spark.newSession()
      import ss.implicits._
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sq = ss.sqlContext
      val in = MemoryStream[(Long, Int, Long, Seq[Long])]
      val decided = graft.streaming.StreamSemDedup.keepDecisionsQ(
        in.toDS(), threshold = 4000000000L, evictCellAfterMs = evict)
      val ckpt = java.nio.file.Files.createTempDirectory(s"evictprobe$runN").toFile
      ckpt.deleteOnExit()
      val pm = new ProbeMetrics(ss)
      val sink = s"evictprobe_sink$runN"
      val t0 = System.nanoTime()
      // ProcessingTime trigger + sink-count polling, NOT
      // processAllAvailable: with ProcessingTimeTimeout the engine keeps
      // scheduling timeout-check batches and processAllAvailable never
      // settles (the MlSpec eviction specs hit this). Every input row
      // emits exactly one decision row, so the expected count is exact.
      val q = decided.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt.getPath)
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
        .start()
      pm.bind(q)
      var fed = 0L
      feed.zipWithIndex.foreach { case (chunk, i) =>
        if (i > 0) Thread.sleep(gapMs)
        in.addData(chunk.toSeq)
        fed += chunk.length
        val w0 = System.currentTimeMillis()
        while (ss.table(sink).count() < fed) {
          require(System.currentTimeMillis() - w0 < 120000, s"sink stuck below $fed rows")
          Thread.sleep(100)
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      pm.finish(q)
      q.stop()
      val out = ss.table(sink)
      val kept = out.filter(col("keep") === 1L).count()
      val emitted = out.count()
      (kept, emitted, pm.stateRows, wall)
    }

    // horizons: effectively-infinite control, then a sweep across the
    // lag spectrum (units of the inter-batch gap)
    val horizons: Seq[(String, Option[Long])] = Seq(
      ("none", None),
      ("2span", Some(2L * 2 * chunks * gapMs)),
      ("span", Some((2 * chunks - 2) * gapMs)),
      ("halfspan", Some(chunks * gapMs)),
      ("gap", Some(gapMs / 2)))
    val base = run(None)
    val lines = horizons.map { case (tag, h) =>
      val (kept, emitted, stateRows, wall) = if (h.isEmpty) base else run(h)
      val missed = kept - base._1
      s"""{"evictprobe":"${ProbeJson.jstr(dir)}","n_cells":$nCells,"chunks":$chunks,"gap_ms":$gapMs,"horizon":"${ProbeJson.jstr(tag)}","horizon_ms":${h.getOrElse(-1L)},"emitted":$emitted,"kept":$kept,"missed_dups":$missed,"state_rows":$stateRows,"wall":${f"$wall%.3f"}}"""
    }
    lines.foreach(println)
    spark.stop()
  }
}
