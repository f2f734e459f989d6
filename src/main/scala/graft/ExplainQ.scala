/** Plan-audit tool: runs one SparkEntry query to completion and prints
  * its FINAL (post-AQE) executed plan — the pre-execution plan string
  * lies about codegen spans and join strategies while AQE is on.
  * Usage: runMain graft.ExplainQ <query> <sfDir>  (PLANS.md convention) */
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, struct, xxhash64}
object ExplainQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Udfs.register(spark)
    val df = SparkEntry.queries(args(0))(spark, args(1))
    val agg = df.agg(bit_xor(xxhash64(struct(df.columns.map(col): _*))))
    agg.collect()
    println("=== FINAL EXECUTED PLAN " + args(0))
    println(agg.queryExecution.executedPlan.toString.take(9000))
  }
}
