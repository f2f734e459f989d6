package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Mqtt
import org.scalatest.funsuite.AnyFunSuite

/** MQTT 3.1.1: remaining-length varint vectors from the spec, topic
  * filter matching (§4.7), broker round-trips for QoS 0/1, retained
  * messages, wildcard subscriptions. */
class MqttSpec extends AnyFunSuite {

  test("remaining-length varint: spec boundary vectors round-trip") {
    // §2.2.3 table: 0→00, 127→7F, 128→80 01, 16383→FF 7F, 16384→80 80 01,
    // 268435455 → FF FF FF 7F
    val vectors = Seq(
      0 -> Seq(0x00), 127 -> Seq(0x7f), 128 -> Seq(0x80, 0x01),
      16383 -> Seq(0xff, 0x7f), 16384 -> Seq(0x80, 0x80, 0x01),
      268435455 -> Seq(0xff, 0xff, 0xff, 0x7f))
    vectors.foreach { case (n, bytes) =>
      val bo = new ByteArrayOutputStream()
      Mqtt.writeRemainingLength(bo, n)
      assert(bo.toByteArray.map(_ & 0xff).toSeq == bytes, s"encode $n")
      assert(Mqtt.readRemainingLength(
        new ByteArrayInputStream(bo.toByteArray)) == n, s"decode $n")
    }
  }

  test("topic filter matching follows spec 4.7") {
    assert(Mqtt.topicMatches("sport/tennis/player1", "sport/tennis/player1"))
    assert(Mqtt.topicMatches("sport/tennis/player1/#", "sport/tennis/player1"))
    assert(Mqtt.topicMatches("sport/tennis/player1/#", "sport/tennis/player1/ranking"))
    assert(Mqtt.topicMatches("sport/tennis/+", "sport/tennis/player1"))
    assert(!Mqtt.topicMatches("sport/tennis/+", "sport/tennis/player1/ranking"))
    assert(Mqtt.topicMatches("#", "a/b/c"))
    assert(Mqtt.topicMatches("+/+", "a/b"))
    assert(!Mqtt.topicMatches("+", "a/b"))
    assert(Mqtt.topicMatches("sport/+/player1", "sport/tennis/player1"))
  }

  private def withBroker[T](f: Mqtt.MiniMqtt => T): T = {
    val b = new Mqtt.MiniMqtt().start()
    try f(b) finally b.stop()
  }

  test("QoS1 publish → subscriber delivery with PUBACK both directions") {
    withBroker { b =>
      val sub = new Mqtt.Client(b.url, "sub1")
      val pub = new Mqtt.Client(b.url, "pub1")
      try {
        sub.subscribe(Seq(("data/items", 1)))
        val blob = Array[Byte](0, 13, 10, -1, 65)
        pub.publish("data/items", blob, qos = 1)
        val m = sub.nextPublish()
        assert(m.topic == "data/items" && m.qos == 1 && !m.retained)
        assert(m.payload.toSeq == blob.toSeq)
      } finally { sub.disconnect(); pub.disconnect() }
    }
  }

  test("QoS0 publish delivered at subscriber's granted QoS floor") {
    withBroker { b =>
      val sub = new Mqtt.Client(b.url, "sub2")
      val pub = new Mqtt.Client(b.url, "pub2")
      try {
        sub.subscribe(Seq(("t/a", 1)))
        pub.publish("t/a", "x".getBytes(UTF_8), qos = 0)
        val m = sub.nextPublish()
        assert(m.qos == 0, "delivery qos = min(pub 0, granted 1)")
      } finally { sub.disconnect(); pub.disconnect() }
    }
  }

  test("wildcard subscription filters topics") {
    withBroker { b =>
      val sub = new Mqtt.Client(b.url, "sub3")
      val pub = new Mqtt.Client(b.url, "pub3")
      try {
        sub.subscribe(Seq(("ev/+/click", 1)))
        pub.publish("ev/web/click", "a".getBytes(UTF_8))
        pub.publish("ev/web/view", "miss".getBytes(UTF_8))
        pub.publish("ev/app/click", "b".getBytes(UTF_8))
        assert(new String(sub.nextPublish().payload, UTF_8) == "a")
        assert(new String(sub.nextPublish().payload, UTF_8) == "b")
      } finally { sub.disconnect(); pub.disconnect() }
    }
  }

  test("retained message replays to late subscriber with retain flag; empty clears") {
    withBroker { b =>
      val pub = new Mqtt.Client(b.url, "pub4")
      try {
        pub.publish("status/dev1", "online".getBytes(UTF_8), qos = 1, retain = true)
        val late = new Mqtt.Client(b.url, "sub4")
        try {
          late.subscribe(Seq(("status/#", 1)))
          val m = late.nextPublish()
          assert(new String(m.payload, UTF_8) == "online" && m.retained)
        } finally late.disconnect()
        pub.publish("status/dev1", Array.emptyByteArray, qos = 1, retain = true)
        val after = new Mqtt.Client(b.url, "sub5")
        try {
          after.subscribe(Seq(("status/#", 1)))
          // nothing retained now: publish a live marker and ensure it is
          // the FIRST thing delivered (no retained replay preceded it)
          pub.publish("status/dev1", "live".getBytes(UTF_8), qos = 1)
          assert(new String(after.nextPublish().payload, UTF_8) == "live")
        } finally after.disconnect()
      } finally pub.disconnect()
    }
  }
}
