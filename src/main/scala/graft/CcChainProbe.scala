package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repro/probe for connectedComponents on HIGH-DIAMETER graphs (a
  * 300-link chain): the escalation path runs many rounds, and Catalyst's
  * size-only stats visitor multiplies join-child estimates — this main
  * pins whether the estimates stay bounded round over round.
  *
  * Usage: runMain graft.CcChainProbe <chainLen>
  */
object CcChainProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(300)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val rnd = new scala.util.Random(1234567L)
    val chain = (0 until 300).map(i => (i * 7L, i * 7L + 7))
    val star = (0 until 200).map(i => (10000L, 10000L + i + 1))
    val cycle = (0 until 100).map(i => (20000L + i, 20000L + (i + 1) % 100))
    val random = (0 until 500).map(_ => { val a = rnd.nextInt(5000).toLong
      val b = rnd.nextInt(5000).toLong; (math.min(a, b), math.max(a, b)) })
    val edgeSeq = (args.lift(1).getOrElse("chain") match {
      case "mix" => chain ++ star ++ cycle ++ random
      case "star" => star
      case "cycle" => cycle
      case "random" => random
      case "chainstar" => chain ++ star
      case "chaincycle" => chain ++ cycle
      case "chainrandom" => chain ++ random
      case _ => (0 until n).map(i => (i * 7L, i * 7L + 7))
    }).filter { case (a, b) => a != b }
    val edges = edgeSeq.toDF("id_a", "id_b")
    val nodes = edges.select(col("id_a").as("node"))
      .unionByName(edges.select(col("id_b").as("node"))).distinct()
    val t0 = System.nanoTime()
    val out = graft.ml.Dedup.connectedComponents(nodes, edges)
    val labels = out.select(countDistinct(col("label"))).head().getLong(0)
    println(f"""{"ccchain":$n,"components":$labels,"wall":${(System.nanoTime() - t0) / 1e9}%.3f}""")
    spark.stop()
  }
}
