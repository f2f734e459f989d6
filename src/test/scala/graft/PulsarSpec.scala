package graft

import java.io.{ByteArrayInputStream, DataInputStream}
import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Aws.Json
import graft.conn.Pulsar
import org.scalatest.funsuite.AnyFunSuite

/** Pulsar binary framing (protobuf BaseCommand over the in-repo proto
  * compiler, CRC32C payload trailer) and the command flow over
  * MiniPulsar: acked produce, flow-controlled shared-subscription
  * consume, key/properties metadata. */
class PulsarSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)
  private def read(bytes: Array[Byte]) =
    Pulsar.readPulsarFrame(new DataInputStream(new ByteArrayInputStream(bytes)))

  test("simple frame round-trips BaseCommand through the dynamic proto codec") {
    val f = read(Pulsar.simpleFrame(Json.obj("type" -> 2L,
      "connect" -> Json.obj("clientVersion" -> "graft", "protocolVersion" -> 19L))))
    assert(f.meta.isEmpty && f.payload.isEmpty)
    assert(Json.render(f.cmd).contains("\"clientVersion\":\"graft\""))
  }

  test("payload frame carries metadata + payload under a verified CRC32C; corruption rejected") {
    val frame = Pulsar.payloadFrame(
      Json.obj("type" -> 6L, "send" -> Json.obj("producerId" -> 1L, "sequenceId" -> 1L)),
      Json.obj("producerName" -> "p", "sequenceId" -> 1L, "publishTime" -> 123L,
        "partitionKey" -> "k1"),
      b("payload-bytes"))
    val f = read(frame)
    assert(new String(f.payload, UTF_8) == "payload-bytes")
    assert(f.meta.exists(m => Json.strOpt(m, "partitionKey").contains("k1")))
    val corrupted = frame.clone()
    corrupted(corrupted.length - 1) = (corrupted.last ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](read(corrupted))
    assert(e.getMessage.contains("CRC32C"))
  }

  private def withPulsar[T](f: (Pulsar.MiniPulsar, String) => T): T = {
    val srv = new Pulsar.MiniPulsar().start()
    try f(srv, srv.address) finally srv.stop()
  }

  test("acked produce returns monotone entry ids; consumer receives in order with key + properties") {
    withPulsar { (srv, addr) =>
      val cons = new Pulsar.Consumer(addr, "t1", "subA")
      val prod = new Pulsar.Producer(addr, "t1")
      try {
        cons.flow(100)
        val ids = (1 to 5).map(i => prod.send(b(s"m$i"), key = s"k$i", properties = Map("n" -> i.toString)))
        assert(ids == (1L to 5L))
        assert(srv.topicLen("t1") == 5)
        val got = (1 to 5).flatMap(_ => cons.receive())
        assert(got.map(g => new String(g.payload, UTF_8)) == (1 to 5).map(i => s"m$i"))
        assert(got.map(_.partitionKey) == (1 to 5).map(i => s"k$i"))
        assert(got.map(_.properties("n")) == (1 to 5).map(_.toString))
        got.foreach(g => cons.ack(g.entryId))
      } finally { prod.close(); cons.close() }
    }
  }

  test("flow control: deliveries stop when permits run out and resume on the next FLOW") {
    withPulsar { (_, addr) =>
      val cons = new Pulsar.Consumer(addr, "t2", "s")
      val prod = new Pulsar.Producer(addr, "t2")
      try {
        cons.flow(2)
        (1 to 5).foreach(i => prod.send(b(s"m$i")))
        assert(cons.receive().isDefined && cons.receive().isDefined)
        assert(cons.receive(timeoutMs = 300).isEmpty, "no permits left, no delivery")
        cons.flow(10)
        assert((1 to 3).flatMap(_ => cons.receive()).size == 3)
      } finally { prod.close(); cons.close() }
    }
  }

  test("messages published before the subscription exist are replayed from the start") {
    withPulsar { (_, addr) =>
      val prod = new Pulsar.Producer(addr, "t3")
      try {
        prod.send(b("early"))
        val cons = new Pulsar.Consumer(addr, "t3", "late-sub")
        try {
          cons.flow(10)
          assert(cons.receive().map(g => new String(g.payload, UTF_8)).contains("early"))
        } finally cons.close()
      } finally prod.close()
    }
  }

  test("shared subscription round-robins one cursor across two consumers") {
    withPulsar { (_, addr) =>
      val c1 = new Pulsar.Consumer(addr, "t4", "shared")
      val c2 = new Pulsar.Consumer(addr, "t4", "shared")
      val prod = new Pulsar.Producer(addr, "t4")
      try {
        c1.flow(100); c2.flow(100)
        (1 to 6).foreach(i => prod.send(b(s"m$i")))
        val g1 = Iterator.continually(c1.receive(500)).takeWhile(_.isDefined).flatten.toVector
        val g2 = Iterator.continually(c2.receive(500)).takeWhile(_.isDefined).flatten.toVector
        assert(g1.nonEmpty && g2.nonEmpty, "both consumers share the load")
        assert((g1 ++ g2).map(_.entryId).sorted == (1L to 6L), "each message delivered exactly once")
      } finally { prod.close(); c1.close(); c2.close() }
    }
  }

  test("terminated topic signals REACHED_END_OF_TOPIC after the backlog, incl. late subscribers") {
    withPulsar { (srv, addr) =>
      val prod = new Pulsar.Producer(addr, "t5")
      val c1 = new Pulsar.Consumer(addr, "t5", "shared")
      try {
        (1 to 4).foreach(i => prod.send(b(s"m$i")))
        srv.terminate("t5")
        c1.flow(100)
        // every staged message is delivered BEFORE the end-of-topic signal
        val g1 = Iterator.continually(c1.receive(2000)).takeWhile(_.isDefined).flatten.toVector
        assert(g1.map(_.entryId) == (1L to 4L), "full backlog precedes the end signal")
        assert(c1.endOfTopic, "drain ended by REACHED_END_OF_TOPIC, not a timeout")
        // a subscriber attaching after termination (with nothing left to
        // consume) is notified as soon as it grants permits
        val c2 = new Pulsar.Consumer(addr, "t5", "shared")
        try {
          c2.flow(100)
          assert(c2.receive(2000).isEmpty && c2.endOfTopic, "late subscriber notified")
        } finally c2.close()
      } finally { prod.close(); c1.close() }
    }
  }
}
