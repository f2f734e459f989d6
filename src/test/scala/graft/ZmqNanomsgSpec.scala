package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Nanomsg, Zmq}
import org.scalatest.funsuite.AnyFunSuite

/** ZMTP 3.0 framing (greeting, READY metadata, socket-type
  * compatibility, short/long/multipart frames, XPUB subscription
  * forwarding) and the nanomsg SP TCP mapping (connection header,
  * length-prefixed messages, receiver-side SUB filtering). */
class ZmqNanomsgSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  // ----------------------------------------------------------------- zmq
  test("zmq push/pull: fan-in from concurrent pushers, multipart preserved") {
    val srv = new Zmq.PullServer().start()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val c = new Zmq.PushClient("127.0.0.1", srv.port)
        try (0 until 25).foreach(i => c.send(b(s"k$t"), b(s"v${t * 100 + i}")))
        finally c.close()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val got = (1 to 100).flatMap(_ => srv.receive())
    assert(got.size == 100)
    assert(got.forall(_.size == 2), "two-part messages stay intact")
    assert(got.map(p => new String(p(1), UTF_8)).toSet.size == 100)
    assert(srv.receive(timeoutMs = 200).isEmpty)
    srv.stop()
  }

  test("zmq long frames (>255 bytes) use the 8-byte size path") {
    val srv = new Zmq.PullServer().start()
    val c = new Zmq.PushClient("127.0.0.1", srv.port)
    try {
      val big = Array.tabulate[Byte](70000)(i => (i % 251).toByte)
      c.send(big)
      assert(srv.receive().get.head.toSeq == big.toSeq)
    } finally { c.close(); srv.stop() }
  }

  test("zmq pub/sub: upstream subscriptions filter publisher-side by prefix") {
    val srv = new Zmq.PubServer().start()
    val subA = new Zmq.SubClient("127.0.0.1", srv.port, Seq("alerts."))
    val subAll = new Zmq.SubClient("127.0.0.1", srv.port, Seq(""))
    try {
      // wait for the SUBSCRIPTIONS, not the connections: a peer counts as
      // a subscriber at handshake, before its SUBSCRIBE frame is processed
      // (the slow-joiner window) — publishing in that window is correctly
      // filtered away and made this test flaky under load
      val deadline = System.currentTimeMillis() + 3000
      while (srv.subscriptionCount < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      srv.publish(b("alerts.disk"), b("full"))
      srv.publish(b("logs.app"), b("line"))
      assert(subA.receive().map(_._1).contains("alerts.disk"))
      assert(subA.receive(timeoutMs = 300).isEmpty, "non-matching topic filtered at the publisher")
      assert(subAll.receive().map(_._1).contains("alerts.disk"))
      assert(subAll.receive().map(_._1).contains("logs.app"))
    } finally { subA.close(); subAll.close(); srv.stop() }
  }

  test("zmq rejects incompatible socket types at the READY handshake") {
    val srv = new Zmq.PullServer().start()
    try {
      // a SUB connecting to a PULL must fail compatibility
      val e = intercept[Exception](new Zmq.SubClient("127.0.0.1", srv.port, Seq("")))
      assert(e.getMessage.contains("incompatible") || e.getMessage.contains("Connection"))
    } finally srv.stop()
  }

  // ------------------------------------------------------------- nanomsg
  test("nanomsg push/pull: SP header validated, concurrent fan-in, binary safe") {
    val srv = new Nanomsg.PullServer().start()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val c = new Nanomsg.PushClient("127.0.0.1", srv.port)
        try (0 until 25).foreach(i => c.send(b(s"m${t * 100 + i}")))
        finally c.close()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val got = (1 to 100).flatMap(_ => srv.receive()).map(new String(_, UTF_8))
    assert(got.toSet.size == 100)
    srv.stop()
  }

  test("nanomsg pub/sub: broadcast to all, prefix filtering at the SUBSCRIBER") {
    val srv = new Nanomsg.PubServer().start()
    val subA = new Nanomsg.SubClient("127.0.0.1", srv.port, Seq("evt."))
    val subAll = new Nanomsg.SubClient("127.0.0.1", srv.port, Seq(""))
    try {
      val deadline = System.currentTimeMillis() + 3000
      while (srv.subscriberCount < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      srv.publish(b("evt.a payload1"))
      srv.publish(b("other payload2"))
      assert(subA.receive().map(new String(_, UTF_8)).contains("evt.a payload1"))
      assert(subA.receive(timeoutMs = 300).isEmpty, "filtered receiver-side")
      assert(subAll.receive().map(new String(_, UTF_8)).contains("evt.a payload1"))
      assert(subAll.receive().map(new String(_, UTF_8)).contains("other payload2"))
    } finally { subA.close(); subAll.close(); srv.stop() }
  }

  test("nanomsg rejects a protocol-mismatched peer") {
    val srv = new Nanomsg.PullServer().start()
    try {
      val e = intercept[Exception](new Nanomsg.SubClient("127.0.0.1", srv.port, Seq("")))
      assert(e.getMessage.contains("incompatible") || e.getMessage.contains("Connection"))
    } finally srv.stop()
  }
}
