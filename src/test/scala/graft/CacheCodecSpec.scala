package graft

import graft.core.{Msg, Processor}
import graft.functions.Codecs
import graft.operators.{Caches, Grok, Processors}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unit tests for the cache/state family, grok, json_schema, and codec
  * seams added in round 2 (edge cases the oracle queries don't reach). */
class CacheCodecSpec extends SparkSpec {
  import spark.implicits._

  test("KvCache.enrich leaves missing keys null; getExpr looks up broadcast map") {
    val kv = Seq(("a", "1"), ("b", "2")).toDF("k", "v")
    val cache = Caches.KvCache(kv, "k", "v")
    val df = Seq("a", "zz", "b").toDF("key")
    val got = cache.enrich(df, col("key"), "hit")
      .select("key", "hit").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "1", "zz" -> null, "b" -> "2"))
    val get = cache.getExpr(spark)
    val got2 = df.select(get(col("key"))).as[String].collect()
    assert(got2.toSeq == Seq("1", null, "2"))
  }

  test("getExpr rejects caches above the bounded-size guard") {
    val big = spark.range(0, 50).select(
      col("id").cast("string").as("k"), col("id").cast("string").as("v"))
    intercept[IllegalArgumentException](
      Caches.KvCache(big, "k", "v").getExpr(spark, maxRows = 10))
  }

  test("buildLastWins / buildFirstWins pick deterministic winners") {
    val df = Seq(("k", "v1", 1L), ("k", "v2", 2L), ("j", "x", 5L)).toDF("key", "value", "ord")
    val last = Caches.buildLastWins(df, col("key"), col("value"), col("ord"))
      .kv.as[(String, String)].collect().toMap
    val first = Caches.buildFirstWins(df, col("key"), col("value"), col("ord"))
      .kv.as[(String, String)].collect().toMap
    assert(last == Map("k" -> "v2", "j" -> "x"))
    assert(first == Map("k" -> "v1", "j" -> "x"))
  }

  test("cached runs child once per distinct key") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val df = Seq(1, 1, 2, 2, 2, 3).toDF("n")
    val out = Caches.cached(
      keyExpr = col("n"),
      childOfKeys = { keys =>
        calls.incrementAndGet()
        keys.withColumn("sq", col("key") * col("key"))
      },
      resultCols = Seq("sq"))(df)
    assert(out.select("n", "sq").as[(Int, Int)].collect().toSet ==
      Set((1, 1), (2, 4), (3, 9)))
    assert(calls.get() == 1, "child plan must be constructed once")
  }

  test("retry clears errors that heal and keeps errors that persist") {
    val df = Seq((1L, "always"), (2L, "once"), (3L, "never")).toDF("id", "mode")
      .withColumn(Msg.ErrorCol, lit(null).cast(StringType))
    val child = Processor("flaky") { d =>
      Msg.markError(d,
        col("mode") === "always" || (col("mode") === "once" && col("_attempt") === 1),
        lit("boom"))
    }
    val out = Caches.retry(child, maxAttempts = 3)(df)
    val errs = out.select("id", Msg.ErrorCol).as[(Long, String)].collect().toMap
    assert(errs(1L) == "boom")
    assert(errs(2L) == null)
    assert(errs(3L) == null)
  }

  test("grok compiles patterns, rejects unknown ones, extracts named fields") {
    val (re, names) = Grok.compile("%{WORD:w} %{INT}:%{NUMBER:n}")
    assert(names == Seq("w", "n"))
    assert("abc 42:3.14".matches(re))
    intercept[IllegalArgumentException] { Grok.compile("%{NOPE:x}") }
    val df = Seq("hello 42:3.14").toDF("line")
    val got = Grok.processor(col("line"), "%{WORD:w} %{INT}:%{NUMBER:n}")(df)
      .select("w", "n").as[(String, String)].collect().head
    assert(got == ("hello", "3.14"))
  }

  test("parse_log syslog subset extracts fields") {
    val df = Seq("Jan  2 03:04:05 host1 sshd[123]: accepted connection").toDF("line")
    val out = Grok.parseSyslog(col("line")).foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
    val r = out.select("log_host", "log_prog", "log_pid", "log_msg").collect().head
    assert(r.toSeq == Seq("host1", "sshd", "123", "accepted connection"))
  }

  test("json_schema validates types and missing fields into the error facet") {
    val df = Seq(
      """{"k":1,"s":"x","b":true}""",
      """{"k":"no","s":"x","b":true}""",
      """{"s":"x","b":true}""",
      """{"k":2,"s":"x","b":"maybe"}""").toDF("content")
      .withColumn(Msg.ErrorCol, lit(null).cast(StringType))
    val out = Processors.jsonSchema(col("content"),
      Seq("k" -> "integer", "s" -> "string", "b" -> "boolean"))(df)
    val errs = out.select(Msg.ErrorCol).as[String].collect()
    assert(errs(0) == null)
    assert(errs(1) != null && errs(1).contains("k"))
    assert(errs(2) != null)
    assert(errs(3) != null && errs(3).contains("b"))
  }

  test("markErrorLabeled records the failing component; first label wins") {
    val df = Seq((1, 5.0), (2, 50.0)).toDF("id", "v")
      .withColumn(Msg.ErrorCol, lit(null).cast(StringType))
    val out = Msg.markErrorLabeled(
      Msg.markErrorLabeled(df, col("v") < 10, lit("too small"), "bounds_check"),
      col("v") < 100, lit("also bad"), "second")
    val r = out.orderBy("id").select(Msg.ErrorCol, Msg.ErrorLabelCol)
      .as[(String, String)].collect()
    assert(r(0) == (("too small", "bounds_check"))) // first error + label kept
    assert(r(1) == (("also bad", "second")))
  }

  test("sequenceShardedJoin collision strategies: replace, keep, array") {
    val a = Seq((1L, "a1", 10), (2L, "a2", 20)).toDF("id", "name", "n")
    val b = Seq((2L, 200), (3L, 300)).toDF("id", "n")
    def byId(strategy: String) =
      graft.conn.Sources.sequenceShardedJoin(Seq(a, b), "id", strategy)
        .collect().map(r => r.getAs[String]("id") -> r).toMap
    val rep = byId("replace")
    assert(rep("2").getAs[Int]("n") == 200 && rep("1").getAs[Int]("n") == 10)
    assert(rep("3").getAs[String]("name") == null)
    val keep = byId("keep")
    assert(keep("2").getAs[Int]("n") == 20 && keep("3").getAs[Int]("n") == 300)
    val arr = byId("array")
    assert(arr("2").getAs[scala.collection.Seq[Int]]("n").toSeq == Seq(20, 200))
  }

  test("avro codec: json round-trip, deterministic bytes, schema cache") {
    import graft.functions.Formats
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"id","type":"long"},{"name":"s","type":"string"},{"name":"d","type":"double"}]}"""
    val doc = """{"id":150,"s":"héllo","d":-2.5e-3}"""
    val bytes = Formats.avroFromJson(doc, schema)
    // zigzag varint: 150 -> 300 -> 2 bytes; "héllo" utf8 = 6 bytes + 1 len; double = 8
    assert(bytes.length == 2 + 7 + 8)
    val back = Formats.avroToJson(bytes, schema)
    assert(back == """{"id":150,"s":"héllo","d":-0.0025}""")
    assert(Formats.avroFromJson(doc, schema).toSeq == bytes.toSeq) // deterministic
  }

  test("protobuf wire codec: round-trip, omitted nulls, unknown fields skipped") {
    import graft.functions.Formats
    val desc = Formats.protoDescriptor("1:int64:id,2:string:s,3:double:d")
    val bytes = Formats.protoFromJson("""{"id":300,"s":"ab","d":1.5}""", desc)
    // tag+varint(300)=1+2, tag+len+2, tag+8
    assert(bytes.length == 3 + 4 + 9)
    // marshalJson emits keys sorted (Go map marshal order)
    assert(Formats.protoToJson(bytes, desc) == """{"d":1.5,"id":300,"s":"ab"}""")
    // null/absent fields are omitted on the wire and absent after decode
    val sparse = Formats.protoFromJson("""{"id":1}""", desc)
    assert(sparse.length == 2 && Formats.protoToJson(sparse, desc) == """{"id":1}""")
    // decoding with a narrower descriptor skips unknown field numbers
    val narrow = Formats.protoDescriptor("2:string:s")
    assert(Formats.protoToJson(bytes, narrow) == """{"s":"ab"}""")
  }

  test("schema registry framing: magic byte + BE id round-trip; malformed frames throw") {
    import graft.functions.Formats
    val schema = """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}"""
    val framed = Formats.schemaRegistryEncode("""{"x":7}""", 1234567, schema)
    assert(framed(0) == 0.toByte)
    val (id, payload) = Formats.schemaRegistryUnframe(framed)
    assert(id == 1234567 && payload.toSeq == Formats.avroFromJson("""{"x":7}""", schema).toSeq)
    assert(Formats.schemaRegistryDecode(framed, Map(1234567 -> schema)) == """{"x":7}""")
    intercept[IllegalArgumentException](
      Formats.schemaRegistryDecode(framed, Map(1 -> schema))) // unknown id
    intercept[IllegalArgumentException](
      Formats.schemaRegistryUnframe("nope".getBytes)) // no magic byte
  }

  test("compression codecs round-trip unicode and empty payloads") {
    for (codec <- Seq(
        (Codecs.zlibCompress, Codecs.zlibDecompress),
        (Codecs.bzip2Compress, Codecs.bzip2Decompress),
        (Codecs.zstdCompress, Codecs.zstdDecompress),
        (Codecs.lz4Compress, Codecs.lz4Decompress),
        (Codecs.snappyCompress, Codecs.snappyDecompress),
        (Codecs.flateCompress, Codecs.flateDecompress))) {
      for (s <- Seq("", "héllo wörld ∑ 中文", "a" * 10000)) {
        val rt = new String(codec._2(codec._1(s.getBytes("UTF-8"))), "UTF-8")
        assert(rt == s)
      }
      assert(codec._1(null) == null && codec._2(null) == null)
    }
  }

  test("truncated deflate input fails loudly instead of spinning") {
    val full = Codecs.zlibCompress("a healthy payload that compresses".getBytes("UTF-8"))
    intercept[java.util.zip.ZipException](Codecs.zlibDecompress(full.dropRight(6)))
    val raw = Codecs.flateCompress("another payload".getBytes("UTF-8"))
    intercept[java.util.zip.ZipException](Codecs.flateDecompress(raw.dropRight(4)))
  }

  test("zlib stream demanding a preset dictionary fails loudly (FDICT)") {
    // Hand-build a zlib header with FDICT set (RFC 1950): CMF=0x78,
    // FLG chosen so FDICT bit 5 is set and (CMF*256+FLG) % 31 == 0,
    // followed by a 4-byte DICTID. inflate() then returns 0 with
    // needsDictionary() true — previously an infinite loop.
    val cmf = 0x78
    val flgBase = 0x20 // FDICT
    val flg = flgBase + (31 - (cmf * 256 + flgBase) % 31) % 31
    val evil = Array[Byte](cmf.toByte, flg.toByte, 1, 2, 3, 4, 0, 0, 0, 0)
    val ex = intercept[java.util.zip.ZipException](Codecs.zlibDecompress(evil))
    assert(ex.getMessage.contains("preset dictionary"))
  }

  test("msgpack round-trips nested JSON values") {
    val cases = Seq(
      """{"a":1,"b":"two","c":[1,2.5,null,true],"d":{"e":"f"}}""",
      """[1,-5,127,-32,1000000,"x"]""",
      """{"neg":-123456789012,"big":123456789012345}""",
      """"just a string"""",
      "null")
    for (c <- cases) {
      val rt = Codecs.msgpackToJson(Codecs.jsonToMsgpack(c))
      // canonical compare: parse both with Spark's JSON reader
      val a = spark.read.json(Seq(c).toDS).collect()
      val b = spark.read.json(Seq(rt).toDS).collect()
      assert(a.sameElements(b), s"$c -> $rt")
    }
  }

  test("yaml parses scalars, lists and nested maps to JSON") {
    val y = "name: test doc\nn: 42\nlist:\n  - 1\n  - two\nnested:\n  k: v"
    val j = Codecs.yamlToJson(y)
    val df = Seq(j).toDF("j")
    assert(df.select(get_json_object(col("j"), "$.name")).as[String].head() == "test doc")
    assert(df.select(get_json_object(col("j"), "$.n")).as[String].head() == "42")
    assert(df.select(get_json_object(col("j"), "$.list[1]")).as[String].head() == "two")
    assert(df.select(get_json_object(col("j"), "$.nested.k")).as[String].head() == "v")
  }

  test("switchExpr applies first matching case and default, single scan") {
    val df = Seq(1, 5, 50, 500).toDF("n")
    val out = Processors.switchExpr(Seq(
      (col("n") >= 100) -> Seq("cls" -> lit("big"), "x10" -> (col("n") * 10)),
      (col("n") >= 10) -> Seq("cls" -> lit("mid"))),
      default = Seq("cls" -> lit("small")))(df)
    val got = out.select("n", "cls").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "small", 5 -> "small", 50 -> "mid", 500 -> "big"))
    // x10 only assigned by the first case; elsewhere null (no default given)
    val x = out.select("n", "x10").as[(Int, java.lang.Integer)].collect().toMap
    assert(x(500) == 5000 && x(50) == null)
  }
}
