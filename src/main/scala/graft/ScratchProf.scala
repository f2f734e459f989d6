package graft
import org.apache.spark.sql.SparkSession
// temporary debugging main — deleted before commit
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Udfs.register(spark)
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("src_cosmosdb")(spark, "/root/testdata/sf0.01")
    println("rows=" + df.count() + f" in ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
