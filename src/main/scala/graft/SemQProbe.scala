package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Quantized-semdedup scale probe: times ivfCentroidsQ + semDedupQ over
  * the planted corpus at a dir, with the cell count as the axis — the
  * operator's scale rule is the float family's (PLANS round-13 seam):
  * within-cell pair volume is (n/nCells)²·nCells/2, so nCells MUST grow
  * with the corpus or the verify join goes quadratic; this probe
  * measures exactly that trade (fixed 16 cells vs corpus-scaled cells
  * at 10×/100×).
  *
  * Usage: runMain graft.SemQProbe <dir> <nCells> [threshold=4000000000]
  */
object SemQProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = args(1).toInt
    val threshold = args.lift(2).map(_.toLong).getOrElse(4000000000L)
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

    val emb = graft.core.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .repartition(graft.core.Tables.fanout(spark))
    val planted = emb.unionByName(emb.select((col("vec_id") + 100000000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(i === 0, x * 1.05f + 0.01f).otherwise(x)).as("embedding")))
    val n = planted.count()
    val t0 = System.nanoTime()
    val cents = graft.ml.Similarity.ivfCentroidsQ(planted, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2)
    val trainWall = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val out = graft.ml.Similarity.semDedupQ(planted, "vec_id", "embedding", 64,
      nCells = nCells, threshold = threshold, iters = 4, trainMod = 2,
      centroids = Some(cents))
    val kept = out.filter(col("keep") === 1L).count()
    val dedupWall = (System.nanoTime() - t1) / 1e9
    println(f"""{"semqprobe":"${ProbeJson.jstr(dir)}","n_vecs":$n,"n_cells":$nCells,"train_wall":$trainWall%.3f,"dedup_wall":$dedupWall%.3f,"kept":$kept}""")
    spark.stop()
  }
}
