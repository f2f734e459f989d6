package graft
class TmpAnsiSpec extends SparkSpec {
  test("ansi value") {
    info("ANSI=" + spark.conf.get("spark.sql.ansi.enabled"))
    val r = spark.sql("select try_cast('abc' as double) d").collect()
    info("try_cast ok: " + r.mkString)
    val r2 = spark.range(1).selectExpr("cast('abc' as double) d")
    info("plain cast: " + (try r2.collect().mkString catch { case e: Exception => "THROWS " + e.getClass.getSimpleName }))
  }
}
