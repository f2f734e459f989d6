package graft

import graft.blob.{Bloblang, Interp}
import graft.functions.Codecs
import graft.operators.External
import org.apache.spark.sql.{Observation, Row}
import org.apache.spark.sql.functions._

/** Tests for observe-based metrics, the per-partition external-call
  * pattern, ascii85/z85, and interpreter long-tail methods. */
class ExternalSpec extends SparkSpec {
  import spark.implicits._

  test("metric processor attaches observed metrics to the existing plan") {
    val obs = Observation("m")
    val df = External.metric(obs, count(lit(1)).as("rows"), sum("n").as("total"))(
      Seq(1, 2, 3).toDF("n"))
    df.collect()
    assert(obs.get("rows") == 3L && obs.get("total") == 6L)
  }

  test("perPartitionLookup opens one client per partition and closes it") {
    val inits = spark.sparkContext.collectionAccumulator[String]("inits")
    val closes = spark.sparkContext.collectionAccumulator[String]("closes")
    val df = Seq(1, 2, 3, 4, 5, 6).toDF("n").repartition(2)
    val out = External.perPartitionLookup(df) { () =>
      inits.add("i"); new java.util.concurrent.atomic.AtomicLong()
    } { (client, row: Row) =>
      client.incrementAndGet(); row.getInt(0) * 10
    } { _ => closes.add("c") }
    assert(out.collect().sorted.toSeq == Seq(10, 20, 30, 40, 50, 60))
    assert(inits.value.size == 2, s"one client per partition, got ${inits.value.size}")
    assert(closes.value.size == 2, "clients closed on exhaustion")
  }

  test("jdbcSelect builds a pushdown subquery") {
    // no database in this environment: assert the option construction path
    // doesn't throw before load(); the subquery text is the contract
    val e = intercept[Exception] {
      External.jdbcSelect(spark, "jdbc:invalid://nope", "t",
        Seq("a", "b"), Some("a > 1"), Some(("a", 0L, 100L, 4))).collect()
    }
    assert(e != null) // driver resolution fails, as expected without a jar
  }

  test("ascii85 and z85 round-trip binary data") {
    val data = Array.range(0, 256).map(_.toByte)
    assert(Codecs.ascii85Decode(Codecs.ascii85Encode(data)).toSeq == data.toSeq)
    // odd-length tail + all-zero group (the 'z' shortcut)
    val odd = Array[Byte](0, 0, 0, 0, 1, 2, 3)
    assert(Codecs.ascii85Decode(Codecs.ascii85Encode(odd)).toSeq == odd.toSeq)
    val z85data = Array.range(0, 64).map(_.toByte) // multiple of 4
    assert(Codecs.z85Decode(Codecs.z85Encode(z85data)).toSeq == z85data.toSeq)
    // z85 spec vector: 0x86 0x4F 0xD2 0x6F 0xB5 0x59 0xF7 0x5B -> HelloWorld
    val spec = Array(0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B).map(_.toByte)
    assert(Codecs.z85Encode(spec) == "HelloWorld")
  }

  test("interpreter: collapse/squash/with/timestamps/compression") {
    def run(src: String, content: String): String =
      Interp.run(Bloblang.parse(src), content).get
    assert(run("root = this.collapse()", """{"a":{"b":1,"c":[1,2]}}""") ==
      """{"a.b":1,"a.c.0":1,"a.c.1":2}""")
    // squash follows merge collision rules: a collides -> [1,3]
    assert(run("root = this.squash()", """[{"a":1},{"b":2},{"a":3}]""") ==
      """{"a":[1,3],"b":2}""")
    assert(run("""root = this.with("a","c")""", """{"a":1,"b":2,"c":3}""") ==
      """{"a":1,"c":3}""")
    assert(run("""root.u = this.t.ts_parse("yyyy-MM-dd HH:mm:ss").ts_unix()""",
      """{"t":"2024-01-02 03:04:05"}""") == """{"u":1704164645}""")
    assert(run("""root.f = this.t.ts_strptime("%Y-%m-%d").ts_strftime("%d/%m/%Y")""",
      """{"t":"2024-01-02"}""") == """{"f":"02/01/2024"}""")
    assert(run("""root.rt = this.s.compress("zstd").decompress("zstd").string()""",
      """{"s":"hello hello hello"}""") == """{"rt":"hello hello hello"}""")
    assert(run("""root.a85 = this.s.encode("ascii85").decode("ascii85").string()""",
      """{"s":"data!"}""") == """{"a85":"data!"}""")
    assert(run("""root.y = this.y.parse_yaml()""",
      """{"y":"k: 1"}""") == """{"y":{"k":1}}""")
    assert(run("""root.m = this.format_msgpack().parse_msgpack()""",
      """{"k":5}""") == """{"m":{"k":5}}""")
  }

  test("Geo: binary-search lookup agrees with the broadcast range join") {
    val ranges = Seq((0L, 99L, "low"), (100L, 199L, "mid"), (500L, 999L, "high"))
    val df = Seq("0.0.0.5", "0.0.0.150", "0.0.2.200", "0.0.0.250").toDF("ip")
      .withColumn("ipl", graft.operators.Geo.ipToLong(col("ip")))
    val viaJoin = graft.operators.Geo.enrichJoin(df, col("ipl"),
        ranges.toDF("lo", "hi", "geo"), "lo", "hi")
      .select("ip", "geo").as[(String, String)].collect().toMap
    val look = graft.operators.Geo.lookupExpr(spark, ranges)
    val viaLookup = df.select(col("ip"), look(col("ipl"))).as[(String, String)].collect().toMap
    assert(viaJoin == viaLookup)
    assert(viaJoin("0.0.0.5") == "low" && viaJoin("0.0.2.200") == "high")
    assert(viaJoin("0.0.0.250") == null)
    intercept[IllegalArgumentException] {
      graft.operators.Geo.lookupExpr(spark, Seq((0L, 50L, "a"), (40L, 99L, "b")))
    }
  }

  test("interpreter: hostname/file/fake functions") {
    def run(src: String, content: String): String =
      Interp.run(Bloblang.parse(src), content).get
    val tmp = java.nio.file.Files.createTempFile("blob", ".txt")
    java.nio.file.Files.writeString(tmp, "from-file")
    assert(run(s"""root.f = file("${tmp}")""", "{}") == """{"f":"from-file"}""")
    assert(run("""root.h = hostname().length() > 0""", "{}") == """{"h":true}""")
    val fake = run("""root.n = fake("name")""", "{}")
    assert(fake.matches("""\{"n":"[A-Za-z]+ [A-Za-z]+"\}"""), fake)
    val email = run("""root.e = fake("email")""", "{}")
    assert(email.contains("@example.com"))
  }

  test("interpreter: diff/patch round-trip and json_path") {
    def run(src: String, content: String): String =
      Interp.run(Bloblang.parse(src), content).get
    // old.patch(new.diff(old)) == new, across nested add/remove/replace
    val src = """
      let d = this.next.diff(this.prev)
      root.patched = this.prev.patch($d)
      root.same = this.prev.patch($d) == this.next
    """
    val content =
      """{"prev":{"a":1,"b":{"c":[1,2,3],"d":"x"},"gone":true},
         "next":{"a":2,"b":{"c":[1,9],"d":"x"},"new":[1]}}""".replaceAll("\n\\s*", "")
    val out = run(src, content)
    assert(out.contains(""""same":true"""), out)
    assert(run("""root.v = this.json_path("$.a.b[1]")""", """{"a":{"b":[5,6,7]}}""") ==
      """{"v":6}""")
  }

  test("rate limiter paces permits; rateLimitedLookup keeps one client per partition") {
    val rl = new External.RateLimiter(100.0) // 10ms interval
    val t0 = System.nanoTime()
    (1 to 6).foreach(_ => rl.acquire())
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(elapsedMs >= 45.0, s"6 permits at 100/s took ${elapsedMs}ms; expected >=50ms pacing")

    val inits = spark.sparkContext.longAccumulator("inits")
    val out = External.rateLimitedLookup(
        (1 to 8).toDF("n").repartition(2), 1e6)(
        () => { inits.add(1); "client" })(
        (c, r) => r.getInt(0) * 2)(
        _ => ())
      .collect().sorted
    assert(out.toSeq == Seq(2, 4, 6, 8, 10, 12, 14, 16))
    assert(inits.value == 2) // one client+bucket per partition, not per row
  }

  test("sleep processor paces per partition and passes rows through untouched") {
    import graft.operators.External
    val df = (1 to 6).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(2)
    val t0 = System.nanoTime()
    val out = External.sleepRows(df, 30L).as[(Long, String)].collect().sorted.toSeq
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out == (1 to 6).map(i => (i.toLong, s"v$i")))
    // 6 rows over 2 partitions at 30ms each: >= (3-1)*30 per partition
    // (first permit free), parallel partitions don't stack
    assert(elapsedMs >= 55.0, s"sleep did not pace: ${elapsedMs}ms")
  }

  test("geoip range join: broadcast hash join twin, no UDF, misses keep rows") {
    import graft.functions.Mmdb
    val db = Mmdb.cityFixturePath
    val facts = Seq(
      (1L, "10.1.0.1"),     // Alpha (/9)
      (2L, "10.42.7.7"),    // Gamma (nested /16 wins)
      (3L, "10.200.0.1"),   // Beta
      (4L, "203.0.113.9"))  // miss: kept with null data
      .toDF("id", "ip")
    val out = Mmdb.geoipRangeJoin(facts, Mmdb.ipv4ToLong(col("ip")), spark, db)
      .select(col("id"), get_json_object(col("data"), "$.city.names.en").as("city"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "Alpha", 2L -> "Gamma", 3L -> "Beta", 4L -> null))
    // the plan is a broadcast HASH join (bucket key + range residual) with
    // zero UDFs — the compiled twin of the interpreter's per-row tree walk
    val plan = Mmdb.geoipRangeJoin(facts, Mmdb.ipv4ToLong(col("ip")), spark, db)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"not a broadcast hash join:\n$plan")
    assert(!plan.contains("NestedLoop"), s"nested-loop range scan crept in:\n$plan")
    assert(!plan.contains("UDF"), s"UDF in the compiled twin:\n$plan")
  }
}
