package graft

import graft.conn.{Jaeger, Otlp}
import org.scalatest.funsuite.AnyFunSuite

/** jaeger tracer (tracer_jaeger.go): the thrift-compact agent datagram
  * and thrift-binary collector POST surfaces, const-sampler ratio
  * arithmetic, collector-overrides-agent precedence, datagram splitting. */
class JaegerSpec extends AnyFunSuite {

  private def span(tid: String, sid: String, parent: String, name: String,
                   attrs: Map[String, Any] = Map.empty) =
    Otlp.Span(tid, sid, parent, name,
      1700000000000000000L, 1700000000500000000L, attrs)

  test("agent surface: compact emitBatch round-trips ids, times and typed tags") {
    val agent = new Jaeger.MiniJaegerAgent().start()
    try {
      val exp = new Jaeger.Exporter(agentAddress = agent.address,
        serviceName = "svc-a", tags = Map("env" -> "test"))
      try {
        val root = span("0123456789abcdef" + "fedcba9876543210", "1" * 16, "", "root",
          Map("s" -> "x", "n" -> 42L, "d" -> 1.5, "b" -> true))
        val child = span(root.traceId, "2" * 16, root.spanId, "child")
        assert(exp.export(Seq(root, child)) == 2)
      } finally exp.close()
      val deadline = System.currentTimeMillis() + 5000
      while (agent.spans.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      val got = agent.spans
      assert(got.map(_._1).toSet == Set("svc-a"))
      val byName = got.map(_._2).map(s => s.name -> s).toMap
      val r = byName("root")
      assert(r.traceId == "0123456789abcdef" + "fedcba9876543210")
      assert(r.spanId == "1" * 16 && r.parentSpanId == "")
      assert(r.startNano == 1700000000000000000L && r.endNano == 1700000000500000000L)
      assert(r.attributes == Map("s" -> "x", "n" -> 42L, "d" -> 1.5, "b" -> true))
      assert(byName("child").parentSpanId == r.spanId)
    } finally agent.stop()
  }

  test("agent survives a malformed datagram; later batches still received") {
    val agent = new Jaeger.MiniJaegerAgent().start()
    try {
      // garbage packet: must not kill the receiver thread
      val sock = new java.net.DatagramSocket()
      try {
        val junk = Array.fill[Byte](64)(0x7f)
        val Array(host, port) = agent.address.split(":")
        sock.send(new java.net.DatagramPacket(junk, junk.length,
          java.net.InetAddress.getByName(host), port.toInt))
      } finally sock.close()
      val exp = new Jaeger.Exporter(agentAddress = agent.address, serviceName = "svc-r")
      try assert(exp.export(Seq(span("ab" * 16, "3" * 16, "", "after-junk"))) == 1)
      finally exp.close()
      val deadline = System.currentTimeMillis() + 5000
      while (agent.spans.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(agent.spans.map(_._2.name) == Vector("after-junk"),
        "receiver thread alive after the bad packet")
    } finally agent.stop()
  }

  test("collector surface: binary Batch POST; collector_url OVERRIDES agent_address") {
    val agent = new Jaeger.MiniJaegerAgent().start()
    val coll = new Jaeger.MiniJaegerCollector().start()
    try {
      val exp = new Jaeger.Exporter(agentAddress = agent.address,
        collectorUrl = coll.url, serviceName = "svc-b")
      try assert(exp.export(Seq(span("ab" * 16, "cd" * 8, "", "only"))) == 1)
      finally exp.close()
      assert(coll.spans.map(_._2.name) == Vector("only"),
        "collector receives when both endpoints are configured")
      assert(coll.spans.head._1 == "svc-b")
      Thread.sleep(100)
      assert(agent.spans.isEmpty, "agent got nothing — collector_url wins")
    } finally { coll.stop(); agent.stop() }
  }

  test("const sampler drops whole traces by id ratio (lower 8 bytes, OTel arithmetic)") {
    val coll = new Jaeger.MiniJaegerCollector().start()
    try {
      val exp = new Jaeger.Exporter(collectorUrl = coll.url, samplerParam = 0.5)
      try {
        // halves disagree on purpose: verdict must key on the LOWER half
        assert(exp.export(Seq(
          span("f" * 16 + "0" * 16, "1" * 16, "", "kept"),
          span("0" * 16 + "f" * 16, "2" * 16, "", "dropped"))) == 1)
      } finally exp.close()
      assert(coll.spans.map(_._2.name) == Vector("kept"))
    } finally coll.stop()
  }

  test("oversized agent batches split into multiple datagrams on span boundaries") {
    val agent = new Jaeger.MiniJaegerAgent().start()
    try {
      val exp = new Jaeger.Exporter(agentAddress = agent.address)
      try {
        // ~1 KB of tag payload per span x 200 spans ≈ 200 KB > 65000
        val spans = (1 to 200).map(i =>
          span("ab" * 16, f"$i%016x", "", s"s$i", Map("pad" -> ("x" * 1000))))
        assert(exp.export(spans) == 200)
      } finally exp.close()
      val deadline = System.currentTimeMillis() + 5000
      while (agent.spans.size < 200 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(agent.spans.map(_._2.name).toSet == (1 to 200).map(i => s"s$i").toSet,
        "every span arrives across the split datagrams")
    } finally agent.stop()
  }
}
