package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Couchbase
import org.scalatest.funsuite.AnyFunSuite

/** Couchbase KV (memcached binary) protocol over MiniCouchbase: SASL
  * PLAIN + SELECT_BUCKET session gating, the get/insert/upsert/replace/
  * remove/counter operation set, status-code semantics, CAS monotony. */
class CouchbaseSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withCb[T](f: (Couchbase.MiniCouchbase, Couchbase.Client) => T): T = {
    val srv = new Couchbase.MiniCouchbase("graft", "pw-123", "data").start()
    val c = new Couchbase.Client(srv.address, "graft", "pw-123", "data")
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("the reference operation set: get/insert/upsert/replace/remove with status semantics") {
    withCb { (srv, c) =>
      assert(c.get("k").isEmpty)
      assert(c.insert("k", b("v1")), "insert on absent key")
      assert(!c.insert("k", b("v2")), "KEY_EXISTS maps to false")
      assert(c.get("k").map(new String(_, UTF_8)).contains("v1"))
      c.upsert("k", b("v3"))
      assert(c.get("k").map(new String(_, UTF_8)).contains("v3"))
      assert(c.replace("k", b("v4")))
      assert(!c.replace("absent", b("x")), "replace needs an existing doc")
      assert(c.remove("k") && !c.remove("k"))
      assert(srv.docCount == 0)
    }
  }

  test("increment/decrement: initial on absent, delta on present, floor at zero") {
    withCb { (_, c) =>
      assert(c.counter("n", delta = 5, initial = 100) == 100, "absent key takes the initial")
      assert(c.counter("n", delta = 5) == 105)
      assert(c.counter("n", delta = 3, decrement = true) == 102)
      assert(c.counter("n", delta = 500, decrement = true) == 0, "decrement floors at zero")
    }
  }

  test("wrong password and wrong bucket are refused; data ops gated behind the session") {
    val srv = new Couchbase.MiniCouchbase("graft", "pw-123", "data").start()
    try {
      val e1 = intercept[IllegalArgumentException](
        new Couchbase.Client(srv.address, "graft", "wrong", "data"))
      assert(e1.getMessage.contains("SASL auth failed"))
      val e2 = intercept[IllegalArgumentException](
        new Couchbase.Client(srv.address, "graft", "pw-123", "other-bucket"))
      assert(e2.getMessage.contains("select bucket failed"))
    } finally srv.stop()
  }

  test("cache backend mapping and binary values") {
    withCb { (srv, _) =>
      val cache = new Couchbase.Cache(srv.address, "graft", "pw-123", "data", prefix = "ns_")
      try {
        val bin = Array.tabulate[Byte](256)(_.toByte)
        cache.set("k", bin)
        assert(cache.get("k").get.toSeq == bin.toSeq)
        assert(!cache.add("k", b("other")))
        assert(cache.add("k2", b("x")))
        cache.delete("k")
        assert(cache.get("k").isEmpty && srv.docCount == 1)
      } finally cache.close()
    }
  }
}
