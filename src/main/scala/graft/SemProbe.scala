package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SemDeDup scale probe (SCALING.md round 13): times
  * [[graft.ml.Similarity.semDedup]] over the gate's planted-twin corpus
  * at a scaled dir, with `nCells` passed in — the method's scale knob.
  * SemDeDup's within-cell candidate generation is O(Σ cell²), so cells
  * MUST grow with the corpus to hold per-cell size (the paper runs ~100k
  * clusters); a fixed cell count at 30× the data is a quadratic blowup
  * the maxCellSize fuse would truncate, not survive. Run with
  * nCells ∝ factor to draw the honest curve.
  *
  * Usage: runMain graft.SemProbe <dir> <nCells>
  */
object SemProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, nCellsS) = args.take(2)
    val nCells = nCellsS.toInt
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

    def corpus = {
      val emb = graft.core.Tables(spark, dir, "embeddings")
        .select("vec_id", "embedding").repartition(core.Tables.fanout(spark))
      val off = emb.agg(max("vec_id")).head().getLong(0) + 1
      emb.unionByName(emb.select((col("vec_id") + off).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i === 0, x * 1.05f + 0.01f).otherwise(x)).as("embedding")))
    }
    def run(): (Double, Long, Long) = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
      val t0 = System.nanoTime()
      val out = graft.ml.Similarity.semDedup(corpus, "vec_id", "embedding", 64,
        nCells = nCells, threshold = 0.95, iters = 4, trainMod = 2)
      val agg = out.agg(count(lit(1)), sum("keep")).head()
      ((System.nanoTime() - t0) / 1e9, agg.getLong(0), agg.getLong(1))
    }
    run() // codegen warmup at full size (trainMod sampling dominates cold cost)
    val (wall, n, kept) = run()
    println(f"""{"semprobe":"${ProbeJson.jstr(dir)}","n_cells":$nCells,"wall":$wall%.3f,"vectors":$n,"kept":$kept}""")
    spark.stop()
  }
}
