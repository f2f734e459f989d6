package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{JetStream, Nats, NatsKv}
import org.scalatest.funsuite.AnyFunSuite

/** NATS KV bucket semantics over the from-scratch core-NATS (HPUB/HMSG
  * headers) + JetStream (expected-last-subject-sequence, rollup, direct
  * get, filtered consumers) layers: revisions, compare-and-set,
  * create-over-tombstone, delete-vs-purge history, watch snapshot+tail,
  * and the cache backend mapping. */
class NatsKvSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)
  private def str(a: Array[Byte]) = new String(a, UTF_8)

  private def withKv[T](f: NatsKv.KvClient => T): T = {
    val nats = new Nats.MiniNats().start()
    val js = new JetStream.MiniJetStream(nats.url).start()
    val kv = new NatsKv.KvClient(nats.url, "cfg").createBucket()
    try f(kv) finally { kv.close(); js.stop(); nats.stop() }
  }

  test("put bumps the revision; get returns the newest value") {
    withKv { kv =>
      assert(kv.put("a", b("1")) == 1L)
      assert(kv.put("b", b("2")) == 2L)
      assert(kv.put("a", b("1b")) == 3L, "stream sequence is the revision")
      assert(str(kv.get("a").get.value) == "1b" && kv.get("a").get.revision == 3L)
      assert(kv.get("missing").isEmpty)
    }
  }

  test("create fails on a live key (10071), succeeds over a delete marker") {
    withKv { kv =>
      assert(kv.create("k", b("v1")) == 1L)
      val e = intercept[JetStream.JsApiError](kv.create("k", b("v2")))
      assert(e.errCode == 10071L, "already-exists is the wrong-last-sequence error")
      assert(str(kv.get("k").get.value) == "v1", "failed create did not write")
      val delRev = kv.delete("k")
      assert(kv.get("k").isEmpty, "tombstoned")
      assert(kv.create("k", b("v3")) == delRev + 1, "create reclaims a deleted key")
      assert(str(kv.get("k").get.value) == "v3")
    }
  }

  test("update is compare-and-set: stale revisions are rejected and write nothing") {
    withKv { kv =>
      val r1 = kv.put("cas", b("v1"))
      val r2 = kv.update("cas", b("v2"), expectedRevision = r1)
      assert(r2 > r1)
      val e = intercept[JetStream.JsApiError](kv.update("cas", b("v-stale"), expectedRevision = r1))
      assert(e.errCode == 10071L && e.description.contains(s"wrong last sequence: $r2"))
      assert(str(kv.get("cas").get.value) == "v2")
      kv.update("cas", b("v3"), expectedRevision = r2)
      assert(str(kv.get("cas").get.value) == "v3")
    }
  }

  test("delete keeps history; purge rolls the subject up") {
    withKv { kv =>
      kv.put("d", b("v1")); kv.put("d", b("v2")); kv.delete("d")
      val h = kv.history("d")
      assert(h.map(_.operation) == Vector("PUT", "PUT", "DEL"), "delete preserves history")
      assert(h.map(e => str(e.value)).take(2) == Vector("v1", "v2"))
      kv.put("p", b("x1")); kv.put("p", b("x2")); kv.purge("p")
      val hp = kv.history("p")
      assert(hp.map(_.operation) == Vector("PURGE"), "purge destroys history")
      assert(kv.get("p").isEmpty)
    }
  }

  test("getRevision pins a historical value; another key's revision is not ours") {
    withKv { kv =>
      val r1 = kv.put("x", b("old"))
      val rOther = kv.put("y", b("other"))
      kv.put("x", b("new"))
      assert(str(kv.getRevision("x", r1).get.value) == "old")
      assert(kv.getRevision("x", rOther).isEmpty, "revision belongs to y")
    }
  }

  test("watch delivers the latest-per-key snapshot, then the live tail; keys() drops tombstones") {
    withKv { kv =>
      kv.put("w.1", b("a1")); kv.put("w.1", b("a2")) // superseded
      kv.put("w.2", b("b1"))
      kv.put("w.3", b("c1")); kv.delete("w.3")
      val w = kv.watch("w.>")
      val snapshot = Iterator.continually(w.next(500)).takeWhile(_.isDefined).flatten.toVector
      assert(snapshot.map(e => e.key -> e.operation).toSet ==
        Set("w.1" -> "PUT", "w.2" -> "PUT", "w.3" -> "DEL"),
        "snapshot is newest-per-key only (a1 never delivered)")
      assert(snapshot.find(_.key == "w.1").map(e => str(e.value)).contains("a2"))
      kv.put("w.4", b("d1")) // live tail
      val live = w.next(2000).get
      assert(live.key == "w.4" && str(live.value) == "d1")
      assert(kv.keys("w.>").toSet == Set("w.1", "w.2", "w.4"), "tombstoned w.3 absent")
    }
  }

  test("cache backend: add maps already-exists to false, the KvBackend contract") {
    val nats = new Nats.MiniNats().start()
    val js = new JetStream.MiniJetStream(nats.url).start()
    val cache = new NatsKv.Cache(nats.url, "cache")
    try {
      assert(cache.get("k").isEmpty)
      cache.set("k", b("v1"))
      cache.set("k", b("v2"))
      assert(cache.get("k").map(str).contains("v2"))
      assert(!cache.add("k", b("v3")), "live key: add=false")
      assert(cache.add("k2", b("v3")))
      cache.delete("k")
      assert(cache.get("k").isEmpty)
      assert(cache.add("k", b("v4")), "add succeeds over the tombstone")
    } finally { cache.close(); js.stop(); nats.stop() }
  }
}
