package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Materialized-IVF READ-path scale probe (round 19 — r18 verdict,
  * What's missing #2): the partition-pruned layout exists to NOT READ
  * the unprobed inverted lists, and until now nothing measured that
  * benefit at scale — the idx gate rows conflate write + read, and
  * AnnQProbe measures in-memory tagging. This probe builds the
  * `partitionBy(_cell)` index ONCE at the dir's scale (plus an
  * UNPARTITIONED twin of the same tagged rows — the layout a deployment
  * that skipped the partitioned write would scan), then times the same
  * probe→score→rank query against both and reports the bytes each scan
  * actually read (task input metrics, whole-run sum). The flat twin's
  * `_cell` filter is an ordinary data predicate: parquet row groups
  * contain all cells (the write is not cell-clustered), so pushdown
  * cannot skip them — it reads the corpus; the pruned scan reads
  * nProbe/nCells of it. That ratio is the layout's value at 100 TB.
  *
  * Usage: runMain graft.IdxReadProbe <dir> <nCells> [nProbe=4] [k=5]
  */
object IdxReadProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = args(1).toInt
    val nProbe = args.lift(2).map(_.toInt).getOrElse(4)
    val k = args.lift(3).map(_.toInt).getOrElse(5)
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

    // driver-side twin of probeCellsQ for the filesystem receipt below
    def probeLike(cs: Array[Array[Long]], np: Int)(v: Seq[Long]): Seq[Int] =
      cs.indices.map { c =>
        var d = 0L; var i = 0; val row = cs(c); val m = math.min(row.length, v.length)
        while (i < m) { val t = row(i) - v(i); d += t * t; i += 1 }
        (d, c)
      }.sorted.take(np).map(_._2)

    // whole-run input-bytes meter: sums task input metrics between marks
    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    val recordsRead = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytesRead.addAndGet(m.inputMetrics.bytesRead)
          recordsRead.addAndGet(m.inputMetrics.recordsRead): Unit
        }
      }
    })
    def metered[A](body: => A): (A, Double, Long, Long) = {
      org.apache.spark.sql.graftshim.ListenerFlush.flush(spark.sparkContext)
      bytesRead.set(0L); recordsRead.set(0L)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graftshim.ListenerFlush.flush(spark.sparkContext)
      (r, wall, bytesRead.get(), recordsRead.get())
    }

    val emb = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .repartition(graft.core.Tables.fanout(spark))
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 5).localCheckpoint(false)

    val cents = Similarity.ivfCentroidsQ(emb, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2)

    // the partitioned index (the 100 TB layout), written once
    val idxDir = java.nio.file.Files.createTempDirectory("idxread_idx").toString
    val (_, writeWall, _, _) = metered {
      Similarity.ivfWriteIndexQ(emb, "vec_id", "embedding", 64, idxDir,
        nCells = nCells, iters = 4, trainMod = 2, centroids = Some(cents))
    }
    // the unpartitioned twin: SAME tagged rows, flat files
    val flatDir = java.nio.file.Files.createTempDirectory("idxread_flat").toString
    spark.read.parquet(s"$idxDir/vectors")
      .select("vec_id", "embedding", "_cell")
      .write.mode("overwrite").parquet(flatDir)

    // warm both plans once (codegen + centroid parse), then measure
    def prunedRun(): Long =
      Similarity.ivfTopKIndexedQ(spark, idxDir, q, "vec_id", "embedding",
        k = k, nProbe = nProbe).count()
    def flatRun(): Long = {
      // identical probe/score/rank against the flat layout — the _cell
      // restriction is a data filter the scan cannot prune by
      val centsArr = cents
      val probe = udf { (v: Seq[Long]) =>
        centsArr.indices.map { c =>
          var d = 0L; var i = 0; val row = centsArr(c)
          val m = math.min(row.length, v.length)
          while (i < m) { val t = row(i) - v(i); d += t * t; i += 1 }
          (d, c)
        }.sorted.take(nProbe).map(_._2)
      }
      val q0 = q.select(col("vec_id").as("query_id"),
          Similarity.quantizeVec(col("embedding"), 1048576.0).as("_qv"))
        .withColumn("_cell", explode(probe(col("_qv"))))
      val qRows = q0.collect()
      val probed = qRows.map(_.getInt(2)).distinct.sorted
      val qb = broadcast(spark.createDataFrame(
        java.util.Arrays.asList(qRows: _*), q0.schema))
      val c = spark.read.parquet(flatDir)
        .where(col("_cell").isin(probed.map(Integer.valueOf): _*))
        .select(col("vec_id"),
          Similarity.quantizeVec(col("embedding"), 1048576.0).as("_cv"), col("_cell"))
      val scored = c.join(qb, Seq("_cell"))
        .withColumn("dist2", aggregate(
          zip_with(col("_cv"), col("_qv"), (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, v) => acc + v))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("dist2"), col("vec_id"))
      scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k).count()
    }
    prunedRun(); flatRun()
    val (prunedRows, prunedWall, prunedBytes, prunedRecs) = metered(prunedRun())
    val (flatRows, flatWall, flatBytes, flatRecs) = metered(flatRun())
    require(prunedRows == flatRows, s"layouts disagree: $prunedRows vs $flatRows")

    // filesystem truth (task input metrics sample FS counters and
    // under-report short runs): bytes/files each layout OBLIGES a
    // reader to touch — the probed `_cell=` directories vs everything
    def walk(dirPath: String, pred: java.nio.file.Path => Boolean): (Long, Long) = {
      val root = java.nio.file.Paths.get(dirPath)
      var files = 0L; var bytes = 0L
      val it = java.nio.file.Files.walk(root)
      try it.forEach { f =>
        if (java.nio.file.Files.isRegularFile(f) &&
            f.getFileName.toString.endsWith(".parquet") && pred(f)) {
          files += 1; bytes += java.nio.file.Files.size(f)
        }
      } finally it.close()
      (files, bytes)
    }
    val probedSet = {
      val cents2 = cents
      val probe = probeLike(cents2, nProbe) _
      q.select(col("vec_id"),
          Similarity.quantizeVec(col("embedding"), 1048576.0).as("_qv"))
        .collect().flatMap(r => probe(r.getSeq[Long](1))).toSet
    }
    val (idxFiles, idxBytes) = walk(s"$idxDir/vectors", _ => true)
    val (prFiles, prBytes) = walk(s"$idxDir/vectors",
      f => probedSet.exists(c => f.toString.contains(s"_cell=$c/")))
    val (flFiles, flBytes) = walk(flatDir, _ => true)

    println(f"""{"idxreadprobe":"${ProbeJson.jstr(dir)}","n_vecs":$n,"n_cells":$nCells,"n_probe":$nProbe,"k":$k,"rows":$prunedRows,"write_wall":$writeWall%.3f,"pruned_wall":$prunedWall%.3f,"pruned_bytes":$prunedBytes,"pruned_records":$prunedRecs,"flat_wall":$flatWall%.3f,"flat_bytes":$flatBytes,"flat_records":$flatRecs,"idx_files":$idxFiles,"idx_bytes":$idxBytes,"probed_cells":${probedSet.size},"probed_files":$prFiles,"probed_bytes":$prBytes,"flat_files":$flFiles,"flat_layout_bytes":$flBytes}""")
    spark.stop()
  }
}
