package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.CountDownLatch

import graft.conn.{Redis, Resp}
import org.scalatest.funsuite.AnyFunSuite

/** RESP protocol + MiniRedis server + connector-surface semantics.
  * Wire vectors are the worked examples from the public RESP spec. */
class RespSpec extends AnyFunSuite {

  private def enc(v: Resp.Value): String = {
    val bo = new ByteArrayOutputStream(); Resp.encode(bo, v); new String(bo.toByteArray, UTF_8)
  }
  private def dec(s: String): Resp.Value =
    Resp.decode(new ByteArrayInputStream(s.getBytes(UTF_8)))

  test("RESP spec wire vectors encode and decode") {
    assert(enc(Resp.Simple("OK")) == "+OK\r\n")
    assert(enc(Resp.Int64(1000)) == ":1000\r\n")
    assert(enc(Resp.bulk("hello")) == "$5\r\nhello\r\n")
    assert(enc(Resp.NullBulk) == "$-1\r\n")
    assert(enc(Resp.Arr(Vector(Resp.bulk("hello"), Resp.bulk("world")))) ==
      "*2\r\n$5\r\nhello\r\n$5\r\nworld\r\n")
    assert(enc(Resp.NullArr) == "*-1\r\n")
    assert(dec("+OK\r\n") == Resp.Simple("OK"))
    assert(dec(":1000\r\n") == Resp.Int64(1000))
    assert(dec("-Error message\r\n") == Resp.Err("Error message"))
    assert(dec("$-1\r\n") == Resp.NullBulk)
    dec("*2\r\n$4\r\nLLEN\r\n$6\r\nmylist\r\n") match {
      case Resp.Arr(Vector(Resp.Bulk(a), Resp.Bulk(b))) =>
        assert(new String(a, UTF_8) == "LLEN" && new String(b, UTF_8) == "mylist")
      case other => fail(s"$other")
    }
    // empty bulk is NOT null bulk
    assert(enc(Resp.bulk("")) == "$0\r\n\r\n")
    dec("$0\r\n\r\n") match {
      case Resp.Bulk(d) => assert(d != null && d.isEmpty)
      case other => fail(s"$other")
    }
  }

  test("command encoding is an array of bulk strings") {
    val bo = new ByteArrayOutputStream()
    Resp.encodeCommand(bo, Seq("SET".getBytes(UTF_8), "k".getBytes(UTF_8), "v".getBytes(UTF_8)))
    assert(new String(bo.toByteArray, UTF_8) == "*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$1\r\nv\r\n")
  }

  private def withServer[T](f: (Resp.MiniRedis, Resp.Client) => T): T = {
    val srv = new Resp.MiniRedis().start()
    val c = new Resp.Client("127.0.0.1", srv.port)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("string family: SET/GET/SETNX/DEL/EXISTS, binary-safe values") {
    withServer { (_, c) =>
      assert(c.str("PING") == "PONG")
      val blob = Array[Byte](0, 1, -1, 13, 10, 127) // CRLF + high bytes inside
      assert(c.str("SET", "bin", blob) == "OK")
      assert(c.bytes("GET", "bin").toSeq == blob.toSeq)
      assert(c.long("SETNX", "bin", "other") == 0)
      assert(c.long("SETNX", "fresh", "x") == 1)
      assert(c.long("EXISTS", "bin", "fresh", "absent") == 2)
      assert(c.long("DEL", "bin", "absent") == 1)
      assert(c.cmd("GET", "bin") == Resp.NullBulk)
    }
  }

  test("SET NX/XX options match redis semantics") {
    withServer { (_, c) =>
      assert(c.cmd("SET", "k", "a", "XX") == Resp.NullBulk) // no key yet
      assert(c.str("SET", "k", "a", "NX") == "OK")
      assert(c.cmd("SET", "k", "b", "NX") == Resp.NullBulk) // already there
      assert(c.str("GET", "k") == "a")
      assert(c.str("SET", "k", "b", "XX") == "OK")
      assert(c.str("GET", "k") == "b")
    }
  }

  test("INCR/INCRBY arithmetic and WRONGTYPE/not-integer errors") {
    withServer { (_, c) =>
      assert(c.long("INCR", "n") == 1)
      assert(c.long("INCRBY", "n", 41L) == 42)
      assert(c.long("DECRBY", "n", 2L) == 40)
      c.cmd("SET", "s", "abc")
      val e = intercept[Resp.RedisErrorException](c.long("INCR", "s"))
      assert(e.getMessage.contains("not an integer"))
      c.cmd("LPUSH", "l", "x")
      val w = intercept[Resp.RedisErrorException](c.str("GET", "l"))
      assert(w.getMessage.startsWith("WRONGTYPE"))
    }
  }

  test("expiry: PX TTL lapses lazily; TTL/PTTL report; EXPIRE on absent key is 0") {
    withServer { (_, c) =>
      c.cmd("SET", "t", "v", "PX", 60L)
      assert(c.long("PTTL", "t") > 0)
      Thread.sleep(120)
      assert(c.cmd("GET", "t") == Resp.NullBulk)
      assert(c.long("TTL", "t") == -2) // gone
      c.cmd("SET", "u", "v")
      assert(c.long("TTL", "u") == -1) // no expiry
      assert(c.long("EXPIRE", "absent", 10L) == 0)
      assert(c.long("EXPIRE", "u", 10L) == 1)
      assert(c.long("TTL", "u") > 0)
    }
  }

  test("KEYS glob and SCAN full-traversal cursor contract") {
    withServer { (_, c) =>
      (1 to 100).foreach(i => c.cmd("SET", f"k:$i%03d", i.toString))
      c.cmd("SET", "other", "x")
      val keys = c.arr("KEYS", "k:*").map { case Resp.Bulk(d) => new String(d, UTF_8) }
      assert(keys.length == 100 && keys.head == "k:001")
      // SCAN with small COUNT must still traverse every key exactly once
      var cursor = "0"; var first = true
      val seen = scala.collection.mutable.ArrayBuffer[String]()
      while (first || cursor != "0") {
        first = false
        c.cmd("SCAN", cursor, "MATCH", "k:*", "COUNT", 7L) match {
          case Resp.Arr(Vector(Resp.Bulk(cur), Resp.Arr(ks))) =>
            cursor = new String(cur, UTF_8)
            ks.foreach { case Resp.Bulk(d) => seen += new String(d, UTF_8) }
          case other => fail(s"$other")
        }
      }
      assert(seen.sorted == keys.sorted && seen.distinct.length == 100)
    }
  }

  test("list family: push order, LRANGE negatives, LPOP/RPOP, LLEN") {
    withServer { (_, c) =>
      c.cmd("RPUSH", "l", "a", "b")
      c.cmd("LPUSH", "l", "z")
      assert(c.long("LLEN", "l") == 3)
      val all = c.arr("LRANGE", "l", "0", "-1").map { case Resp.Bulk(d) => new String(d, UTF_8) }
      assert(all == Vector("z", "a", "b"))
      assert(c.str("LPOP", "l") == "z")
      assert(c.str("RPOP", "l") == "b")
      assert(c.cmd("LPOP", "empty") == Resp.NullBulk)
    }
  }

  test("BLPOP blocks until a concurrent push arrives, times out when dry") {
    withServer { (srv, c) =>
      val t0 = System.nanoTime()
      assert(c.cmd("BLPOP", "q", 0.2) == Resp.NullArr) // dry → timeout
      assert((System.nanoTime() - t0) / 1e6 >= 150)
      val pusher = new Thread(() => {
        Thread.sleep(100)
        val c2 = new Resp.Client("127.0.0.1", srv.port)
        try c2.cmd("RPUSH", "q", "late") finally c2.close()
      })
      pusher.setDaemon(true); pusher.start()
      c.cmd("BLPOP", "q", 5.0) match {
        case Resp.Arr(Vector(Resp.Bulk(k), Resp.Bulk(v))) =>
          assert(new String(k, UTF_8) == "q" && new String(v, UTF_8) == "late")
        case other => fail(s"$other")
      }
    }
  }

  test("set family: SADD dedupe, SCARD, SISMEMBER, SMEMBERS") {
    withServer { (_, c) =>
      assert(c.long("SADD", "s", "a", "b", "a") == 2)
      assert(c.long("SADD", "s", "b", "c") == 1)
      assert(c.long("SCARD", "s") == 3)
      assert(c.long("SISMEMBER", "s", "a") == 1)
      assert(c.long("SISMEMBER", "s", "zz") == 0)
      assert(c.long("SCARD", "absent") == 0)
    }
  }

  test("hash family: HSET multi-field counts new fields, HMSET aliases OK, HGETALL/HDEL") {
    withServer { (_, c) =>
      assert(c.long("HSET", "h", "a", "1", "b", "2") == 2, "two new fields")
      assert(c.long("HSET", "h", "a", "1b", "c", "3") == 1, "overwrite counts 0, new counts 1")
      assert(c.str("HGET", "h", "a") == "1b")
      assert(c.cmd("HGET", "h", "zz") == Resp.NullBulk)
      val all = c.arr("HGETALL", "h").map { case Resp.Bulk(b) => new String(b, "UTF-8") }
      assert(all.grouped(2).map(p => p(0) -> p(1)).toMap == Map("a" -> "1b", "b" -> "2", "c" -> "3"))
      assert(c.str("HMSET", "h2", "x", "9") == "OK", "deprecated alias replies OK")
      assert(c.long("HLEN", "h") == 3)
      assert(c.long("HDEL", "h", "a", "zz") == 1)
      assert(c.long("HLEN", "h") == 2)
      c.str("SET", "plain", "v")
      val e = intercept[Resp.RedisErrorException](c.cmd("HGET", "plain", "f"))
      assert(e.getMessage.contains("WRONGTYPE"), "WRONGTYPE on a string key")
    }
  }

  test("stream family: XADD monotonic ids, XLEN, XRANGE bounds") {
    withServer { (_, c) =>
      val ids = (1 to 5).map(i => c.str("XADD", "st", "*", "body", s"m$i"))
      assert(ids.distinct.length == 5)
      def ord(id: String): (Long, Long) = {
        val Array(ms, seq) = id.split("-"); (ms.toLong, seq.toLong)
      }
      assert(ids.map(ord) == ids.map(ord).sorted)
      assert(c.long("XLEN", "st") == 5)
      val mid = c.arr("XRANGE", "st", ids(1), ids(3))
      assert(mid.length == 3)
      val all = c.arr("XRANGE", "st", "-", "+")
      assert(all.length == 5)
      all.head match {
        case Resp.Arr(Vector(Resp.Bulk(id), Resp.Arr(fields))) =>
          assert(new String(id, UTF_8) == ids.head)
          assert(fields.length == 2)
        case other => fail(s"$other")
      }
    }
  }

  test("pubsub: SUBSCRIBE push mode delivers PUBLISH payloads in order") {
    withServer { (srv, c) =>
      val ready = new CountDownLatch(1)
      val fut = new java.util.concurrent.FutureTask(() =>
        Redis.subscribeCollect(srv.url, "chan", 3, ready))
      val th = new Thread(fut); th.setDaemon(true); th.start()
      assert(ready.await(5, java.util.concurrent.TimeUnit.SECONDS))
      assert(c.long("PUBLISH", "chan", "one") == 1)
      c.cmd("PUBLISH", "chan", "two"); c.cmd("PUBLISH", "chan", "three")
      assert(c.long("PUBLISH", "nobody-listens", "x") == 0)
      assert(fut.get(5, java.util.concurrent.TimeUnit.SECONDS) ==
        Vector("one", "two", "three"))
    }
  }

  test("concurrent clients: 16 threads x 200 INCR land exactly 3200") {
    withServer { (srv, c) =>
      val threads = (1 to 16).map { _ =>
        val th = new Thread(() => {
          val cc = new Resp.Client("127.0.0.1", srv.port)
          try (1 to 200).foreach(_ => cc.long("INCR", "ctr")) finally cc.close()
        })
        th.setDaemon(true); th.start(); th
      }
      threads.foreach(_.join(30000))
      assert(c.str("GET", "ctr") == "3200")
    }
  }

  test("cache resource: get/set/add/delete/exists with prefix and TTL (cache.go)") {
    withServer { (srv, _) =>
      val cache = new Redis.Cache(srv.url, prefix = "bento_")
      try {
        assert(cache.get("k").isEmpty)
        cache.set("k", "v1".getBytes(UTF_8))
        assert(new String(cache.get("k").get, UTF_8) == "v1")
        assert(!cache.add("k", "v2".getBytes(UTF_8))) // ErrKeyAlreadyExists
        assert(cache.add("k2", "v2".getBytes(UTF_8)))
        assert(cache.exists("k2"))
        cache.delete("k2")
        assert(!cache.exists("k2"))
        // prefix isolation: raw key "k" does not exist unprefixed
        val raw = new Resp.Client("127.0.0.1", srv.port)
        try {
          assert(raw.long("EXISTS", "k") == 0)
          assert(raw.long("EXISTS", "bento_k") == 1)
        } finally raw.close()
        cache.set("ttl", "x".getBytes(UTF_8), ttlMs = 50)
        Thread.sleep(120)
        assert(cache.get("ttl").isEmpty)
      } finally cache.close()
    }
  }

  test("renderReply marshals replies like the reference processor") {
    assert(Redis.renderReply(Resp.Int64(42)) == "42")
    assert(Redis.renderReply(Resp.Simple("OK")) == "OK")
    assert(Redis.renderReply(Resp.bulk("hi")) == "hi")
    assert(Redis.renderReply(Resp.Arr(Vector(Resp.bulk("a"), Resp.bulk("b")))) ==
      """["a","b"]""")
  }

  test("redis rate limit: shared token bucket via the reference's Lua script (rate_limit.go)") {
    val srv = new graft.conn.Resp.MiniRedis().start()
    try {
      val a = new graft.conn.Redis.RateLimit(srv.url, "rl", count = 3, intervalMs = 300)
      val b = new graft.conn.Redis.RateLimit(srv.url, "rl", count = 3, intervalMs = 300)
      try {
        // the bucket is SHARED: 2 accesses on a + 1 on b exhaust it
        assert(a.access() == 0L && a.access() == 0L && b.access() == 0L)
        val wait = b.access()
        assert(wait > 0L && wait <= 300L, s"over-count returns PTTL backoff, got $wait")
        assert(a.access() > 0L, "both clients throttled by the one bucket")
        Thread.sleep(wait + 150)
        assert(a.access() == 0L, "window expired: bucket refills")
        // waitFor blocks through saturation and admits eventually
        (1 to 2).foreach(_ => assert(b.access() == 0L)) // fill again (3 used now)
        val t0 = System.currentTimeMillis()
        a.waitFor()
        assert(System.currentTimeMillis() - t0 <= 1000, "admitted within the next window")
      } finally { a.close(); b.close() }
    } finally srv.stop()
  }
}
