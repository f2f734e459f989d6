package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{JetStream, Nats}
import org.scalatest.funsuite.AnyFunSuite

/** JetStream subject-space API over core NATS: stream capture with
  * PubAcks, durable pull consumers, ack/redelivery under ack_wait, and
  * batch fetch expiry. */
class JetStreamSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withJs[T](ackWaitMs: Long = 30000)(f: (JetStream.MiniJetStream, JetStream.JsClient) => T): T = {
    val srv = new Nats.MiniNats().start()
    val js = new JetStream.MiniJetStream(srv.url, ackWaitMs).start()
    val c = new JetStream.JsClient(srv.url)
    try f(js, c) finally { c.close(); js.stop(); srv.stop() }
  }

  test("stream create + acked publish returns monotone PubAck seqs; stream captures traffic") {
    withJs() { (js, c) =>
      c.addStream("ORDERS", Seq("orders.*"))
      val acks = (1 to 5).map(i => c.publish(s"orders.${i % 2}", b(s"o$i")))
      assert(acks.map(_.stream).distinct == Seq("ORDERS"))
      assert(acks.map(_.seq) == (1L to 5L))
      assert(js.streamLen("ORDERS") == 5)
    }
  }

  test("durable pull consumer: fetch batches in order, ack removes, unfetched remain") {
    withJs() { (_, c) =>
      c.addStream("S", Seq("s.>"))
      c.addDurable("S", "workers")
      (1 to 7).foreach(i => c.publish(s"s.$i", b(s"m$i")))
      val first = c.fetch("S", "workers", batch = 3)
      assert(first.map(m => new String(m.payload, UTF_8)) == Seq("m1", "m2", "m3"))
      assert(first.map(_.streamSeq) == Seq(1L, 2L, 3L))
      assert(first.forall(_.delivery == 1L))
      first.foreach(c.ack)
      val rest = c.fetch("S", "workers", batch = 10, maxWaitMs = 500)
      assert(rest.map(_.streamSeq) == Seq(4L, 5L, 6L, 7L))
      rest.foreach(c.ack)
      assert(c.fetch("S", "workers", batch = 1, maxWaitMs = 300).isEmpty)
    }
  }

  test("unacked messages redeliver after ack_wait with delivery bumped; in-flight ones don't") {
    withJs(ackWaitMs = 400) { (_, c) =>
      c.addStream("R", Seq("r"))
      c.addDurable("R", "d")
      c.publish("r", b("once"))
      val first = c.fetch("R", "d", batch = 1)
      assert(first.size == 1 && first.head.delivery == 1L)
      assert(c.fetch("R", "d", batch = 1, maxWaitMs = 200).isEmpty, "lease holds it")
      Thread.sleep(400)
      val again = c.fetch("R", "d", batch = 1)
      assert(again.size == 1 && again.head.delivery == 2L)
      c.ack(again.head)
      Thread.sleep(450)
      assert(c.fetch("R", "d", batch = 1, maxWaitMs = 200).isEmpty, "acked message never redelivers")
    }
  }

  test("two durables on one stream each see the full stream (fan-out by consumer)") {
    withJs() { (_, c) =>
      c.addStream("F", Seq("f"))
      c.addDurable("F", "a"); c.addDurable("F", "b")
      (1 to 3).foreach(i => c.publish("f", b(s"x$i")))
      val ga = c.fetch("F", "a", batch = 10, maxWaitMs = 500)
      val gb = c.fetch("F", "b", batch = 10, maxWaitMs = 500)
      assert(ga.map(_.streamSeq) == Seq(1L, 2L, 3L))
      assert(gb.map(_.streamSeq) == Seq(1L, 2L, 3L))
    }
  }

  test("consumer create on a missing stream errors; binary payloads survive") {
    withJs() { (_, c) =>
      val e = intercept[IllegalArgumentException](c.addDurable("NOPE", "d"))
      assert(e.getMessage.contains("stream not found"))
      c.addStream("B", Seq("bin"))
      c.addDurable("B", "d")
      val data = Array.tabulate[Byte](200)(_.toByte)
      c.publish("bin", data)
      assert(c.fetch("B", "d", batch = 1).head.payload.toSeq == data.toSeq)
    }
  }
}
