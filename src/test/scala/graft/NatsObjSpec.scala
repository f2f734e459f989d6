package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{JetStream, Nats, NatsObj}
import org.scalatest.funsuite.AnyFunSuite

/** NATS object-store semantics over the KV substrate: chunked writes
  * under a nuid, rolled-up info records, ordered multi-chunk reads,
  * overwrite purging the superseded chunks, delete tombstones, list. */
class NatsObjSpec extends AnyFunSuite {

  private def withOs[T](chunkSize: Int = 1024)(f: NatsObj.ObjClient => T): T = {
    val nats = new Nats.MiniNats().start()
    val js = new JetStream.MiniJetStream(nats.url).start()
    val os = new NatsObj.ObjClient(nats.url, "blobs", chunkSize = chunkSize).createBucket()
    try f(os) finally { os.close(); js.stop(); nats.stop() }
  }

  test("multi-chunk object round-trips byte-exact; info counts the chunks") {
    withOs(chunkSize = 100) { os =>
      val data = Array.tabulate[Byte](1037)(i => (i * 31 % 251).toByte) // 11 chunks
      val inf = os.put("big.bin", data)
      assert(inf.chunks == 11L && inf.size == 1037L)
      assert(java.util.Arrays.equals(os.get("big.bin").get, data))
      val small = "hello".getBytes(UTF_8)
      os.put("s.txt", small)
      assert(os.info("s.txt").get.chunks == 1L)
      assert(new String(os.get("s.txt").get, UTF_8) == "hello")
      assert(os.get("missing").isEmpty)
    }
  }

  test("overwrite serves the new bytes and purges the superseded nuid's chunks") {
    withOs(chunkSize = 64) { os =>
      val v1 = Array.fill[Byte](300)(1)
      val v2 = Array.fill[Byte](150)(2)
      val i1 = os.put("o", v1)
      val i2 = os.put("o", v2)
      assert(i1.nuid != i2.nuid, "overwrite re-chunks under a fresh nuid")
      assert(java.util.Arrays.equals(os.get("o").get, v2))
      assert(os.info("o").get.size == 150L)
    }
  }

  test("delete tombstones the object; zero-byte objects are legal") {
    withOs() { os =>
      os.put("gone", "x".getBytes(UTF_8))
      os.delete("gone")
      assert(os.get("gone").isEmpty)
      assert(os.info("gone").exists(_.deleted), "the tombstoned info record survives")
      os.put("empty", Array.emptyByteArray)
      assert(os.get("empty").get.isEmpty && os.info("empty").get.chunks == 0L)
    }
  }

  test("names with spaces and dots are legal (info records key on base64(name))") {
    withOs() { os =>
      val name = "4-NOT SPECIFIED/report v1.2.txt"
      os.put(name, "payload".getBytes(UTF_8))
      assert(new String(os.get(name).get, UTF_8) == "payload")
      assert(os.list().contains(name), "list decodes the original name")
      os.delete(name)
      assert(os.get(name).isEmpty)
    }
  }

  test("list returns live names sorted, tombstones and overwrites collapsed") {
    withOs() { os =>
      os.put("b", "1".getBytes(UTF_8))
      os.put("a", "2".getBytes(UTF_8))
      os.put("a", "3".getBytes(UTF_8)) // overwrite: still one entry
      os.put("c", "4".getBytes(UTF_8))
      os.delete("c")
      assert(os.list() == Vector("a", "b"))
    }
  }
}
