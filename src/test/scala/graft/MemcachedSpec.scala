package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Memcached
import org.scalatest.funsuite.AnyFunSuite

/** Memcached text protocol: store/retrieve/add/delete verbs, expiry,
  * prefix namespacing, multilevel composition. */
class MemcachedSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)
  private def s(o: Option[Array[Byte]]) = o.map(new String(_, UTF_8))

  private def withServer[T](f: Memcached.MiniMemcached => T): T = {
    val srv = new Memcached.MiniMemcached().start()
    try f(srv) finally srv.stop()
  }

  test("set/get/add/delete verbs with STORED/NOT_STORED semantics") {
    withServer { srv =>
      val c = new Memcached.Cache(srv.address)
      try {
        assert(c.get("k").isEmpty)
        c.set("k", b("v1"))
        assert(s(c.get("k")).contains("v1"))
        assert(!c.add("k", b("v2")), "add on existing key is NOT_STORED")
        assert(c.add("k2", b("v2")))
        c.set("k", b("v3")) // unconditional overwrite
        assert(s(c.get("k")).contains("v3"))
        c.delete("k")
        assert(c.get("k").isEmpty && !c.exists("k"))
        c.delete("absent") // NOT_FOUND tolerated
      } finally c.close()
    }
  }

  test("binary values with CRLF bytes survive the data block framing") {
    withServer { srv =>
      val c = new Memcached.Cache(srv.address)
      try {
        val blob = Array[Byte](13, 10, 0, -1, 69, 78, 68) // \r\n + "END"
        c.set("bin", blob)
        assert(c.get("bin").get.toSeq == blob.toSeq)
      } finally c.close()
    }
  }

  test("TTL as relative exptime seconds lapses; prefix namespaces keys") {
    withServer { srv =>
      val c = new Memcached.Cache(srv.address, prefix = "app1_", defaultTtlMs = 1000)
      val plain = new Memcached.Cache(srv.address)
      try {
        c.set("t", b("v"))
        assert(plain.get("t").isEmpty, "unprefixed key must not exist")
        assert(s(plain.get("app1_t")).contains("v"))
        Thread.sleep(1200)
        assert(c.get("t").isEmpty, "1s relative exptime lapsed")
        intercept[IllegalArgumentException](c.set("bad key", b("x")))
      } finally { c.close(); plain.close() }
    }
  }

  test("multilevel stacks an lru in front of memcached") {
    withServer { srv =>
      val remote = new Memcached.Cache(srv.address)
      val front = new graft.operators.CacheBackends.LruCache(4)
      val ml = new graft.operators.CacheBackends.MultilevelCache(Seq(front, remote))
      remote.set("deep", b("42"))
      assert(s(ml.get("deep")).contains("42"))
      assert(s(front.get("deep")).contains("42"), "remote hit promoted")
      ml.close()
    }
  }
}
