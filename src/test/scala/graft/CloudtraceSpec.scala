package graft

import graft.conn.{Cloudtrace, Otlp}
import org.scalatest.funsuite.AnyFunSuite

/** gcp_cloudtrace contract (tracer_cloudtrace.go): v2 batchWrite span
  * encoding, Bearer auth, resource tags, ratio sampling. */
class CloudtraceSpec extends AnyFunSuite {

  private def span(tid: String, sid: String, parent: String, name: String,
                   attrs: Map[String, Any] = Map.empty) =
    Otlp.Span(tid, sid, parent, name, 1700000000000000000L, 1700000000500000000L, attrs)

  test("batchWrite round-trips names, times, parents, typed attributes and tags") {
    val srv = new Cloudtrace.MiniCloudTrace("tkn").start()
    try {
      val exp = new Cloudtrace.Exporter(srv.endpoint, "p1", "tkn",
        tags = Map("env" -> "test"))
      try {
        val tid = "a" * 32
        assert(exp.export(Seq(
          span(tid, "b" * 16, "", "root", Map("n" -> 7L)),
          span(tid, "c" * 16, "b" * 16, "child", Map("kind" -> "x", "ok" -> true)))) == 2)
      } finally exp.close()
      val got = srv.spans
      assert(got.map(_._1).toSet == Set("p1"))
      val root = got.map(_._2).find(_.displayName == "root").get
      assert(root.traceId == "a" * 32 && root.spanId == "b" * 16 && root.parentSpanId == "")
      assert(root.startTime == "2023-11-14T22:13:20Z")
      assert(root.attributes("n") == 7L && root.attributes("env") == "test")
      val child = got.map(_._2).find(_.displayName == "child").get
      assert(child.parentSpanId == "b" * 16)
      assert(child.attributes("kind") == "x" && child.attributes("ok") == true)
    } finally srv.stop()
  }

  test("wrong bearer token is rejected; sampling drops whole traces by id ratio") {
    val srv = new Cloudtrace.MiniCloudTrace("right").start()
    try {
      val bad = new Cloudtrace.Exporter(srv.endpoint, "p", "wrong")
      try intercept[IllegalArgumentException](
        bad.export(Seq(span("a" * 32, "b" * 16, "", "x"))))
      finally bad.close()

      // ratio arithmetic: 63 bits of TraceID[8:16] (the LOWER half) vs
      // ratio * 2^63 — ids whose halves disagree pin the byte range
      assert(Cloudtrace.sampled("0" * 32, 0.5), "low id samples at 0.5")
      assert(!Cloudtrace.sampled("f" * 32, 0.5), "high id drops at 0.5")
      assert(Cloudtrace.sampled("f" * 32, 1.0) && !Cloudtrace.sampled("0" * 32, 0.0))
      assert(Cloudtrace.sampled("f" * 16 + "0" * 16, 0.5),
        "verdict keys on the LOWER 8 bytes (upper-high/lower-low samples)")
      assert(!Cloudtrace.sampled("0" * 16 + "f" * 16, 0.5),
        "upper-low/lower-high drops — the OTel TraceIDRatioBased convention")

      val exp = new Cloudtrace.Exporter(srv.endpoint, "p", "right", samplingRatio = 0.5)
      try {
        // one low trace (sampled) + one high trace (dropped), a span each
        assert(exp.export(Seq(
          span("0123" + "0" * 28, "1" * 16, "", "kept"),
          span("ffff" + "f" * 28, "2" * 16, "", "dropped"))) == 1)
      } finally exp.close()
      assert(srv.spans.map(_._2.displayName) == Vector("kept"))
    } finally srv.stop()
  }
}
