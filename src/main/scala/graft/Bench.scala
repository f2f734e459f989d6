package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}

/** Benchmark main: times the headline queries at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line (driver contract → BENCH_r{N}.json).
  *
  * Each query is forced to FULL evaluation with
  * `agg(bit_xor(xxhash64(struct(allCols))))` — a `.count()` would let
  * Catalyst prune projection-only work and time just the scan (bit_xor, not
  * sum: ANSI mode overflows on summed hashes). Failures are recorded in a
  * `failed` list and printed to stderr, never silently swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    graft.functions.Udfs.register(spark)

    /** Evaluate every output column of every row: hash each row, sum hashes. */
    def forceEval(name: String, dir: String): Unit = {
      val df = SparkEntry.queries(name)(spark, dir)
      df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*)))).collect()
    }

    // JVM+codegen warmup on the smallest SF so timings measure the plan,
    // not first-query classloading.
    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    names.foreach { n =>
      try forceEval(n, "/root/testdata/sf0.001")
      catch { case e: Throwable => System.err.println(s"[bench/warmup] $n: ${e.getMessage}") }
    }

    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      try forceEval(name, sfDir)
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[bench] FAILED $name: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val fl = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val note = "full-eval bit_xor(xxhash64(struct(*))) per query; round-1 timings " +
      "used count() which let Catalyst skip projection-only work"
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$fl,"note":"$note","sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
