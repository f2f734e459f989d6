package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Pins the `Tables.fanout` contract: no gate's RESULT may depend on the
  * scheduler width. Every distribution site derives its partition count
  * from `defaultParallelism` (local[4] here vs local[32] on the driver),
  * so this spec runs a representative sample of fanout-using gates both
  * ways — in-suite at local[4] and in a child JVM running `graft.Verify`
  * at local[32] (the driver's exact code path) — and asserts the
  * canonicalized results are identical. Sample covers one guest runtime,
  * one codec, four LLM rows (the partition-sensitive banded pair set,
  * the fanout-converted logprob, the iterative CC loop, the de-skewed
  * span cut), one connector, the re-planned proc_opensnowcat, and three
  * streaming rows (cross-trigger dedupe state; keyed
  * flatMapGroupsWithState + stream-static join; cross-batch digest
  * state feeding a batch compaction).
  */
class ParallelismInvarianceSpec extends SparkSpec {

  private val gates = Seq(
    "proc_javascript",     // guest runtime (fanout over one-file scan)
    "codec_proto_file",    // codec (per-row decode after narrow scan)
    "llm_unigram_logprob", // LLM row (fanout conversion, round 10)
    "llm_simhash_pairs",   // LLM row whose OUTPUT is a pair set from banding
    "src_kafka",           // connector (connFanout produce + partitioned consume)
    "proc_opensnowcat",    // placement-pinned single-parse plan
    "llm_dedup_resolve",   // iterative CC (round-11): loop must not depend on width
    "llm_dup_cut",         // de-skewed agg+join counts + anti-join rebuild (round-12)
    "stream_dedupe",       // streaming micro-batch state across trigger widths
    "stream_corpus_select", // keyed flatMapGroupsWithState + stream-static join
    "stream_dup_spans")    // cross-batch digest state + batch compaction (round-12)

  /** check.py's canonicalization: columns sorted by name, rows sorted,
    * values stringified. */
  private def canon(df: DataFrame): Vector[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .toVector.sorted
  }

  // One child JVM, all gates, driver parallelism. Test/fork := true makes
  // java.class.path the real test classpath, so the child sees the same
  // code; the --add-opens set the forked JVM was launched with is reused.
  private lazy val wideOut: String = {
    val out = java.nio.file.Files.createTempDirectory("par-inv").toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    import scala.jdk.CollectionConverters._
    val rtArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toList
    val passThrough = rtArgs.sliding(2).collect {
      case List("--add-opens", v) => List("--add-opens", v)
    }.flatten.toList ++ rtArgs.filter(_.startsWith("-Dspark."))
    val cmd = List(javaBin) ++ passThrough ++ List("-Xmx6g",
      "-cp", System.getProperty("java.class.path"),
      "graft.Verify", sf, out)
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_CPUS", "32")
    pb.environment().put("SPARK_GRAFT_ONLY", gates.mkString(","))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val rc = p.waitFor()
    assert(rc == 0, s"local[32] Verify child exited $rc:\n${log.takeRight(4000)}")
    gates.foreach { g =>
      assert(new java.io.File(s"$out/$g").isDirectory,
        s"local[32] child produced no output for $g:\n${log.takeRight(4000)}")
    }
    out
  }

  gates.foreach { g =>
    test(s"$g: result invariant under scheduler width (local[4] == local[32])") {
      val narrow = canon(SparkEntry.queries(g)(spark, sf))
      val wide = canon(spark.read.parquet(s"$wideOut/$g"))
      assert(narrow.nonEmpty, s"$g returned no rows at $sf — vacuous gate")
      if (narrow != wide) {
        val onlyNarrow = narrow.diff(wide).take(3)
        val onlyWide = wide.diff(narrow).take(3)
        fail(s"$g diverges with scheduler width: local[4] ${narrow.size} rows, " +
          s"local[32] ${wide.size} rows; only-in-narrow=$onlyNarrow only-in-wide=$onlyWide")
      }
    }
  }
}
