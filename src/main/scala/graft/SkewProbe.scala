package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Degenerate-corpus skew probe for the dup-span family (SCALING.md):
  * synthesizes a corpus where HALF the documents share one viral 15-token
  * window (the boilerplate shape the operator hunts — and the shape that
  * made the r11 window-function plan a one-task straggler), then times
  * dupSpans + dupSpanCut at the given document count. Run at increasing n
  * to draw the no-cliff curve; correctness of the same shape is pinned in
  * MlSpec ("degenerate corpus" spec).
  *
  * Usage: runMain graft.SkewProbe <nDocs>
  * Prints one JSON line {"skewprobe":n,"dup_spans":sec,"dup_cut":sec,...}.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // even docs: the viral 15-token window + a unique 5-token tail;
    // odd docs: 20 unique tokens. Everything derives from doc_id, so the
    // corpus generates distributed (no driver-side rows) and the viral
    // digest's occurrence count is exactly n/2.
    val viral = (1 to 15).map(i => s"b$i").mkString(" ")
    def tail(p: String, k: Int) = concat_ws(" ",
      (1 to k).map(j => concat(lit(p), col("id"), lit(s"x$j"))): _*)
    val gen = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, concat(lit(viral + " "), tail("u", 5)))
        .otherwise(tail("q", 20)).as("text"))
    // materialize as parquet (like the real gates' corpus scans) so the
    // timings measure the operator over a file scan, not the generator
    val dir = java.nio.file.Files.createTempDirectory("skewprobe").toString
    gen.write.mode("overwrite").parquet(dir)
    val docs = spark.read.parquet(dir)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    val tSpans = time(force(graft.ml.Dedup.dupSpans(docs, "doc_id", "text", w = 15)))
    val tCut = time(force(graft.ml.Dedup.dupSpanCut(docs, "doc_id", "text", w = 15)))
    // sanity: the viral window was actually flagged in every carrier
    val carriers = graft.ml.Dedup.dupSpans(docs, "doc_id", "text", w = 15)
      .select("doc_id").distinct().count()
    println(f"""{"skewprobe":$n,"dup_spans":$tSpans%.3f,"dup_cut":$tCut%.3f,"carriers":$carriers}""")
    require(carriers == (n + 1) / 2, s"expected ${(n + 1) / 2} carriers, got $carriers")
    spark.stop()
  }
}
