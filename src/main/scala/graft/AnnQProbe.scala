package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Quantized-IVF retrieval scale probe (round 18 — the llm_ann_ivf_hq
  * follow-through): times ivfTopKQ end-to-end over a scaled dir with
  * the cell count and the assignment path (flat vs two-level) as the
  * axes. The retrieval path's scale term is corpus-side cell TAGGING —
  * O(nCells·dim) per row flat, O((nProbeCoarse+1)·√nCells·dim) with
  * the two-level probe — while the probe/score/rank tail is bounded by
  * the query count (broadcast) and the probed lists. nCells must grow
  * with the corpus to keep the inverted lists bounded (the semDedupQ
  * rule), which is exactly when the tagging term dominates and the
  * hier path pays off.
  *
  * `trainMode` probes the r19 TRAINING seam the same way: hier = the
  * two-level per-iteration assignment (the library default above the
  * threshold — the last flat O(nCells·dim)/row term removed), flat =
  * forced-exact training for the before/after receipt.
  *
  * Usage: runMain graft.AnnQProbe <dir> <nCells> [hier|flat] [k=5] [nProbe=4] [trainMode hier|flat]
  */
object AnnQProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nCells = args(1).toInt
    val mode = args.lift(2).getOrElse("hier")
    require(mode == "hier" || mode == "flat", s"mode hier|flat, got $mode")
    val k = args.lift(3).map(_.toInt).getOrElse(5)
    val nProbe = args.lift(4).map(_.toInt).getOrElse(4)
    val trainMode = args.lift(5).getOrElse("hier")
    require(trainMode == "hier" || trainMode == "flat",
      s"trainMode hier|flat, got $trainMode")
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
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 5)
    val hierFrom = if (mode == "hier") 0 else Int.MaxValue
    // train ONCE and inject (the SemQProbe convention): training is
    // identical in both modes, so splitting it out of the query wall
    // stops it diluting the flat-vs-hier tagging delta (r18 review)
    val trainFrom = if (trainMode == "hier") 0 else Int.MaxValue
    val t0c = System.nanoTime()
    val cents = Similarity.ivfCentroidsQ(emb, "vec_id", "embedding", 64,
      nCells = nCells, iters = 4, trainMod = 2, hierAssignFrom = trainFrom)
    val trainWall = (System.nanoTime() - t0c) / 1e9
    val t0 = System.nanoTime()
    val out = Similarity.ivfTopKQ(emb, "vec_id", "embedding", 64,
      q, "vec_id", "embedding", k = k, nCells = nCells, nProbe = nProbe,
      iters = 4, trainMod = 2, hierAssignFrom = hierFrom,
      centroids = Some(cents))
    val rows = out.count()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"annqprobe":"${ProbeJson.jstr(dir)}","n_vecs":$n,"n_cells":$nCells,"mode":"${ProbeJson.jstr(mode)}","train_mode":"${ProbeJson.jstr(trainMode)}","k":$k,"n_probe":$nProbe,"rows":$rows,"train_wall":$trainWall%.3f,"query_wall":$wall%.3f}""")
    spark.stop()
  }
}
