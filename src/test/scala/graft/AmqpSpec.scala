package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Amqp
import org.scalatest.funsuite.AnyFunSuite

/** AMQP 0-9-1: frame codec vectors, connection negotiation, queue
  * publish/consume/ack lifecycle, at-least-once redelivery. */
class AmqpSpec extends AnyFunSuite {

  test("frame codec: method frame round-trips with end octet") {
    val payload = Amqp.method(60, 40, _.short(0).shortstr("").shortstr("q1").octet(0))
    val bo = new java.io.ByteArrayOutputStream()
    Amqp.writeFrame(bo, Amqp.Frame(Amqp.FrameMethod, 1, payload))
    val raw = bo.toByteArray
    assert(raw(0) == 1, "frame type METHOD")
    assert(((raw(1) & 0xff) << 8 | (raw(2) & 0xff)) == 1, "channel 1")
    assert((raw.last & 0xff) == 0xCE, "frame-end octet")
    val back = Amqp.readFrame(new java.io.ByteArrayInputStream(raw))
    assert(back.ftype == Amqp.FrameMethod && back.channel == 1)
    assert(back.payload.toSeq == payload.toSeq)
    // payload layout: class 60, method 40, reserved short, "" exchange,
    // "q1" routing key
    val r = new Amqp.R(back.payload)
    assert(r.short() == 60 && r.short() == 40)
    assert(r.short() == 0 && r.shortstr() == "" && r.shortstr() == "q1")
  }

  test("content header carries class 60, weight 0, body size, no properties") {
    val h = new Amqp.R(Amqp.contentHeader(12345L))
    assert(h.short() == 60 && h.short() == 0)
    assert(h.longlong() == 12345L && h.short() == 0)
  }

  private def withBroker[T](f: Amqp.MiniAmqp => T): T = {
    val b = new Amqp.MiniAmqp().start()
    try f(b) finally b.stop()
  }

  test("negotiate, declare, publish, consume, ack round-trip with binary body") {
    withBroker { b =>
      val pub = new Amqp.Client(b.url)
      val con = new Amqp.Client(b.url)
      try {
        pub.declareQueue("jobs")
        val blob = Array[Byte](0, -1, 13, 10, 0xCE.toByte) // frame-end byte inside
        pub.publish("jobs", blob)
        pub.publish("jobs", "second".getBytes(UTF_8))
        con.consume("jobs")
        val d1 = con.nextDelivery()
        assert(d1.routingKey == "jobs" && d1.body.toSeq == blob.toSeq)
        con.ack(d1.deliveryTag)
        val d2 = con.nextDelivery()
        assert(new String(d2.body, UTF_8) == "second")
        con.ack(d2.deliveryTag)
      } finally { pub.close(); con.close() }
    }
  }

  test("consumer attached before publish receives pushed deliveries") {
    withBroker { b =>
      val con = new Amqp.Client(b.url)
      val pub = new Amqp.Client(b.url)
      try {
        con.declareQueue("live")
        con.consume("live")
        (1 to 5).foreach(i => pub.publish("live", s"m$i".getBytes(UTF_8)))
        val got = (1 to 5).map { _ =>
          val d = con.nextDelivery(); con.ack(d.deliveryTag)
          new String(d.body, UTF_8)
        }
        assert(got == Seq("m1", "m2", "m3", "m4", "m5"), "FIFO in publish order")
      } finally { con.close(); pub.close() }
    }
  }

  test("at-least-once: unacked deliveries requeue when the consumer dies") {
    withBroker { b =>
      val pub = new Amqp.Client(b.url)
      try {
        pub.declareQueue("work")
        (1 to 3).foreach(i => pub.publish("work", s"w$i".getBytes(UTF_8)))
        val con1 = new Amqp.Client(b.url)
        con1.consume("work")
        val d1 = con1.nextDelivery()
        assert(new String(d1.body, UTF_8) == "w1")
        con1.ack(d1.deliveryTag)
        val d2 = con1.nextDelivery() // received but NOT acked
        assert(new String(d2.body, UTF_8) == "w2")
        con1.close() // dies with w2 (and possibly w3) in flight
        Thread.sleep(100)
        val con2 = new Amqp.Client(b.url)
        try {
          con2.consume("work")
          val redelivered = (1 to 2).map { _ =>
            val d = con2.nextDelivery(); con2.ack(d.deliveryTag)
            new String(d.body, UTF_8)
          }.toSet
          assert(redelivered == Set("w2", "w3"), "unacked messages redelivered")
        } finally con2.close()
      } finally pub.close()
    }
  }

  test("multi-frame body reassembles across body frames") {
    withBroker { b =>
      val pub = new Amqp.Client(b.url)
      val con = new Amqp.Client(b.url)
      try {
        pub.declareQueue("big")
        val body = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
        pub.publish("big", body)
        con.consume("big")
        val d = con.nextDelivery()
        assert(d.body.length == body.length && d.body.toSeq == body.toSeq)
        con.ack(d.deliveryTag)
      } finally { pub.close(); con.close() }
    }
  }
}
