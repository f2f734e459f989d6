package graft

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Aws, Kinesis}
import graft.conn.Aws.SigV4
import org.scalatest.funsuite.AnyFunSuite

/** Kinesis JSON protocol over MiniKinesis: MD5 hash-range shard routing
  * (independently recomputed), per-shard sequence monotonicity, the four
  * iterator types, and the PutRecords batch limit. */
class KinesisSpec extends AnyFunSuite {

  private def withK[T](shards: Int = 4)(f: (Kinesis.MiniKinesis, Kinesis.Client) => T): T = {
    val srv = new Kinesis.MiniKinesis().start()
    val c = new Kinesis.Client(srv.endpoint)
    try { c.createStream("evt", shards); f(srv, c) } finally { c.close(); srv.stop() }
  }

  test("shard ranges partition the 2^128 hash space contiguously") {
    val rs = Kinesis.shardRanges(4)
    assert(rs.head.startHash == BigInteger.ZERO)
    assert(rs.last.endHash == BigInteger.ONE.shiftLeft(128).subtract(BigInteger.ONE))
    rs.sliding(2).foreach { case Seq(a, b) =>
      assert(a.endHash.add(BigInteger.ONE) == b.startHash)
    }
  }

  test("records route to the shard owning MD5(partitionKey) — top-2-bits check for 4 shards") {
    withK() { (_, c) =>
      val keys = (1 to 40).map(i => s"key-$i")
      val placed = c.putRecords("evt", keys.map(k => (k, k.getBytes(UTF_8))))
      keys.zip(placed).foreach { case (k, (shardId, _)) =>
        // independent recompute: shard index = first hex digit of md5 >> 2
        val md5hex = SigV4.hex(java.security.MessageDigest.getInstance("MD5").digest(k.getBytes(UTF_8)))
        val expect = Integer.parseInt(md5hex.substring(0, 1), 16) >> 2
        assert(shardId == Kinesis.shardIdName(expect), s"key $k")
      }
      // all four shards get traffic at this key count
      assert(placed.map(_._1).distinct.size == 4)
    }
  }

  test("per-shard sequence numbers are strictly increasing and ordered like arrival") {
    withK() { (_, c) =>
      val placed = c.putRecords("evt", (1 to 100).map(i => (s"k$i", s"v$i".getBytes(UTF_8))))
      placed.groupBy(_._1).foreach { case (_, sns) =>
        val seqs = sns.map(_._2)
        assert(seqs == seqs.sorted, "arrival order preserved")
        assert(seqs.distinct.size == seqs.size)
      }
    }
  }

  test("TRIM_HORIZON replays all; LATEST sees only post-iterator records; AFTER_SEQUENCE_NUMBER resumes") {
    withK(shards = 1) { (_, c) =>
      c.putRecords("evt", Seq(("a", "1".getBytes(UTF_8)), ("b", "2".getBytes(UTF_8))))
      val sid = Kinesis.shardIdName(0)
      val fromStart = c.getRecords(c.shardIterator("evt", sid, "TRIM_HORIZON"))
      assert(fromStart.records.map(r => new String(r.data, UTF_8)) == Seq("1", "2"))
      assert(fromStart.millisBehind == 0)

      val latest = c.shardIterator("evt", sid, "LATEST")
      c.putRecords("evt", Seq(("c", "3".getBytes(UTF_8))))
      assert(c.getRecords(latest).records.map(r => new String(r.data, UTF_8)) == Seq("3"))

      val after = c.shardIterator("evt", sid, "AFTER_SEQUENCE_NUMBER",
        Some(fromStart.records.head.sequenceNumber))
      assert(c.getRecords(after).records.map(r => new String(r.data, UTF_8)) == Seq("2", "3"))
    }
  }

  test("GetRecords honors Limit and NextShardIterator pages through the backlog") {
    withK(shards = 1) { (_, c) =>
      c.putRecords("evt", (1 to 25).map(i => ("same-key", s"v$i".getBytes(UTF_8))))
      var it = c.shardIterator("evt", Kinesis.shardIdName(0))
      var seen = Vector.empty[String]
      var behind = 1L
      while (behind > 0) {
        val got = c.getRecords(it, limit = 10)
        assert(got.records.size <= 10)
        seen ++= got.records.map(r => new String(r.data, UTF_8))
        it = got.nextIterator; behind = got.millisBehind
      }
      assert(seen == (1 to 25).map(i => s"v$i"))
    }
  }

  test("PutRecords rejects >500 entries; unknown stream errors") {
    withK() { (_, c) =>
      intercept[IllegalArgumentException] {
        c.putRecords("evt", (1 to 501).map(i => (s"k$i", Array[Byte](1))))
      }
      val e = intercept[IllegalArgumentException](c.listShards("absent"))
      assert(e.getMessage.contains("ResourceNotFoundException"))
    }
  }

  test("binary payloads survive the base64 framing") {
    withK(shards = 1) { (_, c) =>
      val data = Array.tabulate[Byte](256)(_.toByte)
      c.putRecords("evt", Seq(("bin", data)))
      val got = c.getRecords(c.shardIterator("evt", Kinesis.shardIdName(0)))
      assert(got.records.head.data.toSeq == data.toSeq)
    }
  }
}
