package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

import graft.conn.Kafka
import org.scalatest.funsuite.AnyFunSuite

/** Kafka v0 wire protocol: MessageSet codec vectors, produce/fetch/
  * metadata round-trips, partition isolation, offset cursors, CRC
  * rejection. */
class KafkaSpec extends AnyFunSuite {

  test("MessageSet v0 layout is byte-exact per the spec") {
    val set = Kafka.messageSetBytes(7L, Seq((null, "hi".getBytes(UTF_8))))
    // offset(8) size(4) crc(4) magic(1) attrs(1) keylen(4=-1) vallen(4) "hi"
    assert(set.length == 8 + 4 + 4 + 1 + 1 + 4 + 4 + 2)
    val bb = java.nio.ByteBuffer.wrap(set)
    assert(bb.getLong == 7L, "offset")
    assert(bb.getInt == set.length - 12, "message size")
    val crcStored = bb.getInt
    assert(bb.get == 0.toByte, "magic 0")
    assert(bb.get == 0.toByte, "attributes")
    assert(bb.getInt == -1, "null key length")
    assert(bb.getInt == 2, "value length")
    // CRC over magic..value, independently recomputed
    val crc = new CRC32()
    crc.update(set, 16, set.length - 16)
    assert(crc.getValue.toInt == crcStored, "CRC32 over magic..value")
    val parsed = Kafka.readMessageSet(set)
    assert(parsed.length == 1 && parsed.head.offset == 7L)
    assert(parsed.head.key == null)
    assert(new String(parsed.head.value, UTF_8) == "hi")
  }

  test("corrupted message fails CRC loudly; truncated tail is tolerated") {
    val set = Kafka.messageSetBytes(0L, Seq(
      ("k".getBytes(UTF_8), "value-one".getBytes(UTF_8)),
      ("k2".getBytes(UTF_8), "value-two".getBytes(UTF_8))))
    val corrupt = set.clone()
    corrupt(set.length - 1) = (corrupt(set.length - 1) ^ 0x1).toByte
    val e = intercept[java.io.IOException](Kafka.readMessageSet(corrupt))
    assert(e.getMessage.contains("CRC"))
    // truncation mid-message (maxBytes semantics): parse the whole prefix
    val truncated = java.util.Arrays.copyOf(set, set.length - 5)
    val partial = Kafka.readMessageSet(truncated)
    assert(partial.length == 1, "whole messages before the cut survive")
  }

  private def withBroker[T](f: Kafka.MiniKafka => T): T = {
    val b = new Kafka.MiniKafka(numPartitions = 3).start()
    try f(b) finally b.stop()
  }

  test("metadata advertises the broker and auto-created partition layout") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        val m = c.metadata("orders")
        assert(m.topic == "orders")
        assert(m.partitions.map(_.partition) == Vector(0, 1, 2))
        assert(m.partitions.forall(_.leader == 0))
      } finally c.close()
    }
  }

  test("produce assigns sequential offsets; fetch returns them with high watermark") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        val base1 = c.produce("t", 0, Seq((null, "a".getBytes(UTF_8)), (null, "b".getBytes(UTF_8))))
        val base2 = c.produce("t", 0, Seq((null, "c".getBytes(UTF_8))))
        assert(base1 == 0L && base2 == 2L, "offsets are the partition log positions")
        val (msgs, hw) = c.fetch("t", 0, 0L)
        assert(hw == 3L)
        assert(msgs.map(m => new String(m.value, UTF_8)) == Vector("a", "b", "c"))
        assert(msgs.map(_.offset) == Vector(0L, 1L, 2L))
        // cursor resumption from a mid-log offset
        val (tail, _) = c.fetch("t", 0, 1L)
        assert(tail.map(m => new String(m.value, UTF_8)) == Vector("b", "c"))
        // empty fetch at the high watermark
        val (none, hw2) = c.fetch("t", 0, 3L)
        assert(none.isEmpty && hw2 == 3L)
      } finally c.close()
    }
  }

  test("partitions are independent ordered logs") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        c.produce("p", 0, Seq((null, "p0-a".getBytes(UTF_8))))
        c.produce("p", 1, Seq((null, "p1-a".getBytes(UTF_8)), (null, "p1-b".getBytes(UTF_8))))
        val (m0, hw0) = c.fetch("p", 0, 0L)
        val (m1, hw1) = c.fetch("p", 1, 0L)
        assert(hw0 == 1L && hw1 == 2L)
        assert(m0.map(m => new String(m.value, UTF_8)) == Vector("p0-a"))
        assert(m1.map(m => new String(m.value, UTF_8)) == Vector("p1-a", "p1-b"))
      } finally c.close()
    }
  }

  test("fetch maxBytes trims whole messages, never splits") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        val big = Array.fill[Byte](1000)('x')
        (1 to 5).foreach(_ => c.produce("big", 0, Seq((null, big))))
        val (msgs, hw) = c.fetch("big", 0, 0L, maxBytes = 2100)
        assert(hw == 5L)
        assert(msgs.length == 2, "two whole 1KB messages fit in 2100 bytes")
        val (rest, _) = c.fetch("big", 0, msgs.last.offset + 1, maxBytes = 1 << 20)
        assert(rest.length == 3)
      } finally c.close()
    }
  }

  test("keys round-trip binary-safe") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        val key = Array[Byte](0, -1, 13, 10)
        c.produce("k", 2, Seq((key, "v".getBytes(UTF_8))))
        val (msgs, _) = c.fetch("k", 2, 0L)
        assert(msgs.head.key.toSeq == key.toSeq)
      } finally c.close()
    }
  }
}
