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

  // ===================================================== record batch v2

  test("zigzag varints encode per the protobuf wire format") {
    def enc(v: Long): Seq[Byte] = new Kafka.W().varint(v).result.toSeq
    assert(enc(0L) == Seq[Byte](0x00))
    assert(enc(-1L) == Seq[Byte](0x01))
    assert(enc(1L) == Seq[Byte](0x02))
    assert(enc(-2L) == Seq[Byte](0x03))
    assert(enc(150L) == Seq(0xac.toByte, 0x02.toByte)) // zigzag(150)=300=0b10_0101100
    for (v <- Seq(0L, 5L, -5L, 127L, 128L, 300L, -300L, Int.MaxValue.toLong, Long.MinValue)) {
      val r = new Kafka.R(new Kafka.W().varint(v).result)
      assert(r.varint() == v, s"varint round-trip $v")
    }
  }

  test("record batch v2 layout is byte-exact per the spec") {
    val m = Kafka.Msg(0L, "k".getBytes(UTF_8), "hello".getBytes(UTF_8),
      timestamp = 1000L, headers = Seq(("h1", "x".getBytes(UTF_8))))
    val batch = Kafka.recordBatchBytes(5L, Seq(m))
    // record body: attrs(1) tsDelta(1:00) offDelta(1:00) keyLen(1:02) 'k'
    //   valLen(1:0a) "hello" hdrCount(1:02) hKeyLen(1:04) "h1" hValLen(1:02) 'x'
    //   = 17 bytes; length varint zigzag(17)=34=0x22 -> record = 18 bytes
    // crc'd region: attrs(2) lastOffsetDelta(4) baseTs(8) maxTs(8)
    //   producerId(8) epoch(2) baseSeq(4) count(4) + records(18) = 58
    // batch: baseOffset(8) batchLength(4) + pLE(4) magic(1) crc(4) + 58 = 79
    assert(batch.length == 79, s"batch length ${batch.length}")
    val bb = java.nio.ByteBuffer.wrap(batch)
    assert(bb.getLong == 5L, "baseOffset")
    assert(bb.getInt == 67, "batchLength = bytes after the length field")
    assert(bb.getInt == -1, "partitionLeaderEpoch")
    assert(bb.get == 2.toByte, "magic 2")
    val crcStored = bb.getInt
    // CRC32C (Castagnoli, NOT CRC32) over attributes..end, independently
    val crc = new java.util.zip.CRC32C()
    crc.update(batch, 21, batch.length - 21)
    assert(crc.getValue.toInt == crcStored, "CRC32C over attributes..end")
    assert(bb.getShort == 0, "batch attributes: uncompressed")
    assert(bb.getInt == 0, "lastOffsetDelta")
    assert(bb.getLong == 1000L, "baseTimestamp")
    assert(bb.getLong == 1000L, "maxTimestamp")
    assert(bb.getLong == -1L, "producerId")
    assert(bb.getShort == -1, "producerEpoch")
    assert(bb.getInt == -1, "baseSequence")
    assert(bb.getInt == 1, "record count")
    assert(bb.get == 0x22.toByte, "record length varint zigzag(17)")
    assert(bb.get == 0.toByte, "record attributes")
    assert(bb.get == 0x00.toByte, "timestampDelta varint 0")
    assert(bb.get == 0x00.toByte, "offsetDelta varint 0")
    assert(bb.get == 0x02.toByte, "keyLen varint zigzag(1)")
    assert(bb.get == 'k'.toByte)
    assert(bb.get == 0x0a.toByte, "valueLen varint zigzag(5)")
    // round-trip
    val parsed = Kafka.readRecordBatch(batch)
    assert(parsed.length == 1)
    assert(parsed.head.offset == 5L)
    assert(parsed.head.timestamp == 1000L)
    assert(new String(parsed.head.value, UTF_8) == "hello")
    assert(parsed.head.headers.map { case (k, v) => (k, new String(v, UTF_8)) } ==
      Seq(("h1", "x")))
  }

  test("corrupted record batch fails CRC32C loudly; concatenated batches parse") {
    val b1 = Kafka.recordBatchBytes(0L, Seq(
      Kafka.Msg(0L, null, "one".getBytes(UTF_8), timestamp = 10L),
      Kafka.Msg(0L, null, "two".getBytes(UTF_8), timestamp = 20L)))
    val b2 = Kafka.recordBatchBytes(2L, Seq(
      Kafka.Msg(0L, null, "three".getBytes(UTF_8), timestamp = 30L)))
    val corrupt = b1.clone()
    corrupt(b1.length - 1) = (corrupt(b1.length - 1) ^ 0x1).toByte
    val e = intercept[java.io.IOException](Kafka.readRecordBatch(corrupt))
    assert(e.getMessage.contains("CRC32C"))
    // a fetch's records field can hold several batches back to back
    val all = Kafka.readRecordBatches(b1 ++ b2)
    assert(all.map(m => new String(m.value, UTF_8)) == Vector("one", "two", "three"))
    assert(all.map(_.offset) == Vector(0L, 1L, 2L))
    assert(all.map(_.timestamp) == Vector(10L, 20L, 30L))
    // truncated tail (maxBytes semantics) keeps whole batches
    val truncated = java.util.Arrays.copyOf(b1 ++ b2, b1.length + 5)
    assert(Kafka.readRecordBatches(truncated).length == 2)
  }

  test("negotiated v2: headers and timestamps round-trip against a modern broker") {
    withBroker { b =>
      val c = new Kafka.Client(b.bootstrap)
      try {
        val base = c.produceMsgs("h", 0, Seq(
          Kafka.Msg(0L, "k1".getBytes(UTF_8), "v1".getBytes(UTF_8),
            timestamp = 1723500000000L,
            headers = Seq(("trace", "abc".getBytes(UTF_8)), ("empty", Array.emptyByteArray))),
          Kafka.Msg(0L, null, "v2".getBytes(UTF_8), timestamp = 1723500000500L)))
        assert(base == 0L)
        val (msgs, hw) = c.fetch("h", 0, 0L)
        assert(hw == 2L && msgs.length == 2)
        assert(msgs(0).timestamp == 1723500000000L)
        assert(msgs(1).timestamp == 1723500000500L)
        assert(msgs(0).headers.map(_._1) == Seq("trace", "empty"))
        assert(new String(msgs(0).headers.head._2, UTF_8) == "abc")
        assert(msgs(1).headers.isEmpty)
      } finally c.close()
    }
  }

  test("legacy broker downgrades the same client to the v0 MessageSet") {
    val legacy = new Kafka.MiniKafka(numPartitions = 1, modern = false).start()
    try {
      val c = new Kafka.Client(legacy.bootstrap)
      try {
        // same client API; ApiVersions negotiation selects produce v0/fetch v0
        val base = c.produceMsgs("t", 0, Seq(
          Kafka.Msg(0L, "k".getBytes(UTF_8), "v".getBytes(UTF_8),
            timestamp = 99L, headers = Seq(("h", "x".getBytes(UTF_8))))))
        assert(base == 0L)
        val (msgs, hw) = c.fetch("t", 0, 0L)
        assert(hw == 1L && msgs.length == 1)
        assert(new String(msgs.head.value, UTF_8) == "v")
        // v0 carries neither timestamps nor headers — downgraded away
        assert(msgs.head.timestamp == -1L && msgs.head.headers.isEmpty)
      } finally c.close()
    } finally legacy.stop()
  }
}
