package graft

import graft.conn.Otlp
import org.scalatest.funsuite.AnyFunSuite

/** OTLP trace export over the public opentelemetry-proto schema:
  * protobuf round-trip with fixed64 nano timestamps, parent/child
  * linkage on one trace id, typed attributes, the /v1/traces endpoint
  * with content-type enforcement. */
class OtlpSpec extends AnyFunSuite {

  test("TracesData protobuf round-trips spans with typed attributes and fixed64 nanos") {
    val spans = Seq(
      Otlp.Span("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331", "",
        "pipeline", 1700000000000000001L, 1700000000000000900L,
        Map("component" -> "input", "count" -> 42L, "ok" -> true, "ratio" -> 0.5)),
      Otlp.Span("0af7651916cd43dd8448eb211c80319c", "00f067aa0ba902b7", "b7ad6b7169203331",
        "process", 1700000000000000100L, 1700000000000000200L, Map("stage" -> "map")))
    val (service, back) = Otlp.decodeTraces(Otlp.encodeTraces("graft-engine", spans))
    assert(service == "graft-engine")
    assert(back.size == 2)
    assert(back.head.traceId == "0af7651916cd43dd8448eb211c80319c")
    assert(back.head.startNano == 1700000000000000001L, "fixed64 precision survives")
    assert(back.head.attributes == Map("component" -> "input", "count" -> 42L,
      "ok" -> true, "ratio" -> 0.5))
    assert(back(1).parentSpanId == "b7ad6b7169203331", "child links to the parent span")
  }

  test("tracer exports batched parent/child spans to the collector; ids are consistent") {
    val col = new Otlp.MiniCollector().start()
    val tracer = new Otlp.Tracer(col.endpoint, "graft")
    try {
      val root = tracer.startTrace("batch", Map("n" -> 2L))
      val c1 = root.startChild("stage", Map("i" -> 1L))
      c1.end()
      val c2 = root.startChild("stage", Map("i" -> 2L))
      c2.end()
      root.end(Map("done" -> true))
      tracer.flush()
      val spans = col.spans.map(_._2)
      assert(spans.size == 3)
      val rootSpan = spans.find(_.name == "batch").get
      assert(rootSpan.parentSpanId.isEmpty && rootSpan.attributes("done") == true)
      val children = spans.filter(_.name == "stage")
      assert(children.size == 2)
      assert(children.forall(_.traceId == rootSpan.traceId), "one trace id across the tree")
      assert(children.forall(_.parentSpanId == rootSpan.spanId), "children link to the root")
      assert(children.map(_.spanId).distinct.size == 2)
      assert(col.spans.forall(_._1 == "graft"), "service.name resource attribute")
    } finally { tracer.close(); col.stop() }
  }

  test("collector enforces the protobuf content type") {
    val col = new Otlp.MiniCollector().start()
    val http = new graft.conn.Aws.Http
    try {
      val r = http.request("POST", s"${col.endpoint}/v1/traces",
        Seq("content-type" -> "application/json"), "{}".getBytes("UTF-8"))
      assert(r.status == 415)
    } finally col.stop()
  }
}
