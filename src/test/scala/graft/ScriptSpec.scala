package graft

import org.apache.spark.sql.functions._

import graft.operators.Script

/** `java` user-code processor — janino-compiled blocks with the
  * reference's `bento.v0_msg_*` message surface
  * (impl/javascript/functions.go:147-254).
  */
class ScriptSpec extends SparkSpec {
  import spark.implicits._

  private def envelope(jsons: Seq[String]) =
    graft.core.Msg.envelope(
      jsons.toDF("j").select(col("j")), Seq("j"))
      .withColumn(graft.core.Msg.ContentCol,
        get_json_object(col(graft.core.Msg.ContentCol), "$.j"))

  test("structured mutation: as_structured/set_structured round-trip") {
    val env = graft.core.Msg.envelope(
      Seq((1L, 10.0), (2L, 250.0)).toDF("id", "v"))
    val out = Script.processor(
      """java.util.Map root = (java.util.Map) msg.asStructured();
        |long id = ((Number) root.get("id")).longValue();
        |double v = ((Number) root.get("v")).doubleValue();
        |java.util.Map r = new java.util.LinkedHashMap();
        |r.put("id", Long.valueOf(id * 3));
        |r.put("grade", v > 100 ? "hi" : "lo");
        |msg.setStructured(r);
        |""".stripMargin)(env)
    val got = out.select(
        get_json_object(col("content"), "$.id").cast("long"),
        get_json_object(col("content"), "$.grade"))
      .as[(Long, String)].collect().toSet
    assert(got == Set((3L, "lo"), (6L, "hi")))
    assert(out.filter(graft.core.Msg.errored).count() == 0)
  }

  test("string + metadata surface: set_string, set_meta, exists/get_meta") {
    val env = graft.core.Msg.envelope(Seq(Tuple1("x")).toDF("a"))
    val out = Script.processor(
      """String s = msg.asString();
        |msg.setMeta("len", String.valueOf(s.length()));
        |if (!msg.existsMeta("absent")) msg.setString("L:" + msg.getMeta("len"));
        |""".stripMargin)(env)
    val row = out.select(col("content"), col("meta")("len")).as[(String, String)].head()
    assert(row == (("L:9", "9"))) // {"a":"x"} is 9 chars
  }

  test("exceptions land in the error facet; content survives") {
    val env = graft.core.Msg.envelope(Seq(Tuple1(1L)).toDF("k"))
    val out = Script.processor(
      """if (true) throw new RuntimeException("boom");
        |""".stripMargin)(env)
    val r = out.select(col("content"), col(graft.core.Msg.ErrorCol)).as[(String, String)].head()
    assert(r._1 == """{"k":1}""", "failed message keeps its content")
    assert(r._2 != null && r._2.contains("boom"))
  }

  test("as_structured on non-JSON throws -> errored, like the reference") {
    val env = envelope(Seq("\"notanobject")) // malformed JSON text content
    intercept[Exception](graft.blob.Interp.parseJsonTyped("\"notanobject"))
    val out = Script.processor("msg.asStructured();")(env)
    assert(out.filter(graft.core.Msg.errored).count() == 1)
  }

  test("fetch: synchronous HTTP from user code (v0_fetch)") {
    val in = new graft.operators.HttpServerInput(timeoutSec = 30)
    val port = in.start()
    val env = graft.core.Msg.envelope(Seq(Tuple1(7L)).toDF("k"))
    // run serve() concurrently: it blocks until `expected` arrive
    val served = new java.util.concurrent.CompletableFuture[Long]()
    val t = new Thread(() => served.complete(
      in.serve(spark, b => b.withColumn("response", concat(lit("pong:"), col("content"))),
        expected = 1).count()))
    t.setDaemon(true); t.start()
    val out = Script.processor(
      s"""java.util.Map r = msg.fetch("http://127.0.0.1:$port/post", "POST", "ping");
         |msg.setString(String.valueOf(r.get("status")) + "/" + r.get("body"));
         |""".stripMargin)(env)
    val got = out.select(col("content")).as[String].head()
    in.stop()
    assert(got == "200/pong:ping")
    assert(served.get(10, java.util.concurrent.TimeUnit.SECONDS) == 1L)
  }

  test("code block compiles once per JVM (pooled, like the reference's VMs)") {
    val src = "msg.setString(\"z\");"
    assert(Script.compiled(src) eq Script.compiled(src))
  }

  test("driver-side fail-fast on syntax errors") {
    intercept[Exception](Script.processor("this is not java ;;;"))
  }
}
