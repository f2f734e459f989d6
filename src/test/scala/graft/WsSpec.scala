package graft

import graft.conn.Ws

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** RFC 6455 connector (impl/io/input_websocket.go, output_websocket.go):
  * handshake token, framing round-trips, the JDK-client input path and the
  * output round-trip against the from-scratch server.
  */
class WsSpec extends SparkSpec {

  test("Sec-WebSocket-Accept matches the RFC 6455 §1.3 worked example") {
    // the spec's own sample key/accept pair
    assert(Ws.acceptKey("dGhlIHNhbXBsZSBub25jZQ==") ==
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("frame write/read round-trips across the three length encodings") {
    for (n <- Seq(0, 1, 125, 126, 300, 65535, 65536, 70000)) {
      val payload = Array.tabulate[Byte](n)(i => (i % 251).toByte)
      val bos = new ByteArrayOutputStream()
      Ws.writeFrame(bos, 1, payload)
      val got = Ws.readFrame(new ByteArrayInputStream(bos.toByteArray)).get
      assert(got.opcode == 1 && got.fin)
      assert(java.util.Arrays.equals(got.payload, payload), s"len $n")
    }
  }

  test("masked client frames unmask correctly") {
    // hand-build a masked text frame: "hi" with mask key 0x01020304
    val mask = Array[Byte](1, 2, 3, 4)
    val raw = "hi".getBytes(UTF_8).zipWithIndex
      .map { case (b, i) => (b ^ mask(i % 4)).toByte }
    val frame = Array[Byte](0x81.toByte, (0x80 | 2).toByte) ++ mask ++ raw
    val got = Ws.readFrame(new ByteArrayInputStream(frame)).get
    assert(new String(got.payload, UTF_8) == "hi")
  }

  test("input: JDK client receives all server frames after open_messages") {
    val lines = (0 until 300).map(i => s"msg-$i")
    val server = new Ws.Server(lines, expectOpen = Seq("hello", "world")).start()
    val got = try Ws.receive(server.url, Seq("hello", "world"), lines.length)
      finally server.stop()
    assert(got == lines)
  }

  test("output: client-sent rows arrive server-side intact") {
    val server = new Ws.Server(Nil, expectOpen = Seq("open"), collectFrom = true).start()
    val lines = (0 until 200).map(i => s"out-$i-" + ("x" * (i % 40)))
    Ws.send(server.url, Seq("open"), lines)
    val got = (0 until 200).map(_ => server.received.poll(10, java.util.concurrent.TimeUnit.SECONDS))
    server.stop()
    assert(got == lines)
  }
}
