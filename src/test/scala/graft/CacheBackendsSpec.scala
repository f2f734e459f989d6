package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.operators.CacheBackends._
import org.scalatest.funsuite.AnyFunSuite

/** Pure cache backends: memory/lru/ttlru/file/multilevel/noop semantics
  * against the reference contracts (cache_{memory,lru,ttlru,multilevel,
  * noop}.go, io/cache_file.go), incl. multilevel stacked over the RESP
  * redis backend. */
class CacheBackendsSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)
  private def s(o: Option[Array[Byte]]) = o.map(new String(_, UTF_8))

  test("memory: get/set/add/delete, default TTL lapses lazily") {
    val c = new MemoryCache(defaultTtlMs = 60)
    c.set("k", b("v"))
    assert(s(c.get("k")).contains("v"))
    assert(!c.add("k", b("other")))
    Thread.sleep(120)
    assert(c.get("k").isEmpty) // default TTL applied and lapsed
    assert(c.add("k", b("again")))
    c.delete("k")
    assert(!c.exists("k"))
    val never = new MemoryCache() // no TTL
    never.set("p", b("q"))
    Thread.sleep(80)
    assert(never.exists("p"))
  }

  test("lru: capacity bound evicts least-recently-USED; Get refreshes recency") {
    val c = new LruCache(3)
    c.set("a", b("1")); c.set("b", b("2")); c.set("c", b("3"))
    assert(s(c.get("a")).contains("1")) // touch a → b is now eldest
    c.set("d", b("4"))                  // evicts b
    assert(c.get("b").isEmpty, "least-recently-used entry evicted")
    assert(c.exists("a") && c.exists("c") && c.exists("d"))
    assert(!c.add("a", b("x")))
    // recency after the exists() touches is a < c < d, so the next
    // insert evicts a
    assert(c.add("e", b("5")))
    assert(c.get("a").isEmpty)
    assert(c.exists("c") && c.exists("d") && c.exists("e"))
  }

  test("ttlru: capacity AND per-cache TTL both evict") {
    val c = new TtlruCache(2, defaultTtlMs = 80)
    c.set("a", b("1")); c.set("b", b("2"))
    c.set("c", b("3")) // capacity eviction of a
    assert(c.get("a").isEmpty)
    assert(c.exists("b"))
    Thread.sleep(150)
    assert(c.get("b").isEmpty && c.get("c").isEmpty, "TTL lapsed")
    assert(c.add("b", b("fresh")), "expired key addable again")
  }

  test("file: persists across instances; add is O_EXCL; traversal rejected") {
    val dir = java.nio.file.Files.createTempDirectory("fcache").toString
    val c1 = new FileCache(dir)
    c1.set("item1", b("hello"))
    assert(c1.add("item2", b("first")))
    assert(!c1.add("item2", b("second")), "CREATE_NEW refuses an existing file")
    val c2 = new FileCache(dir) // new instance, same dir — disk is truth
    assert(s(c2.get("item1")).contains("hello"))
    assert(s(c2.get("item2")).contains("first"))
    c2.delete("item1")
    assert(!c1.exists("item1"))
    intercept[IllegalArgumentException](c1.get("../escape"))
  }

  test("multilevel: hit promotes upward; writes/deletes hit all levels") {
    val l1 = new LruCache(4)
    val l2 = new MemoryCache()
    val ml = new MultilevelCache(Seq(l1, l2))
    l2.set("deep", b("v2")) // present only in L2
    assert(l1.get("deep").isEmpty)
    assert(s(ml.get("deep")).contains("v2"))
    assert(s(l1.get("deep")).contains("v2"), "hit promoted into L1")
    ml.set("all", b("x"))
    assert(l1.exists("all") && l2.exists("all"))
    ml.delete("all")
    assert(!l1.exists("all") && !l2.exists("all"))
    assert(ml.get("absent").isEmpty)
  }

  test("multilevel stacks over the redis backend (lru in front of RESP)") {
    val srv = new graft.conn.Resp.MiniRedis().start()
    try {
      val remote = new graft.conn.Redis.Cache(srv.url)
      val front = new LruCache(8)
      val ml = new MultilevelCache(Seq(front, remote))
      remote.set("only-remote", b("42"))
      assert(s(ml.get("only-remote")).contains("42"))
      assert(s(front.get("only-remote")).contains("42"), "remote hit cached locally")
      ml.set("both", b("y"))
      assert(remote.exists("both"))
      ml.close()
    } finally srv.stop()
  }

  test("noop: remembers nothing, accepts everything") {
    val c = new NoopCache
    c.set("k", b("v"))
    assert(c.get("k").isEmpty && !c.exists("k"))
    assert(c.add("k", b("v")) && c.add("k", b("v")))
  }
}
