package graft

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.VectorMap

import graft.conn.Mongo
import graft.conn.Mongo.Bson
import org.scalatest.funsuite.AnyFunSuite

/** BSON codec vectors (hand-computed per bsonspec.org) + the OP_MSG
  * command surface over MiniMongo: insert/find/update/delete, filter
  * operators, upserts, duplicate-key errors, and the cache backend. */
class MongoSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  test("BSON hand-computed vector: {\"hello\": \"world\"} is the spec's canonical example") {
    // 0x16 total, type 0x02, cstring "hello", int32 6, "world\0", terminator
    val enc = Bson.encodeDoc(VectorMap("hello" -> "world"))
    val expect = Array[Int](0x16, 0, 0, 0, 0x02, 'h', 'e', 'l', 'l', 'o', 0,
      6, 0, 0, 0, 'w', 'o', 'r', 'l', 'd', 0, 0).map(_.toByte)
    assert(enc.toSeq == expect.toSeq)
    assert(Bson.decodeDoc(enc) == VectorMap("hello" -> "world"))
  }

  test("BSON round-trips the full supported type set with order preserved") {
    val doc = VectorMap[String, Any](
      "d" -> 3.25, "s" -> "héllo", "sub" -> VectorMap[String, Any]("x" -> 1L),
      "arr" -> Vector[Any](1L, "two", 3.0), "bin" -> Array[Byte](0, 1, 2, -1),
      "t" -> true, "f" -> false, "z" -> null, "i64" -> Long.MaxValue, "neg" -> -42L)
    val back = Bson.decodeDoc(Bson.encodeDoc(doc))
    assert(back.keys.toSeq == doc.keys.toSeq, "field order preserved")
    assert(back("d") == 3.25 && back("s") == "héllo")
    assert(back("sub") == VectorMap("x" -> 1L))
    assert(back("arr") == Vector(1L, "two", 3.0))
    assert(back("bin").asInstanceOf[Array[Byte]].toSeq == Seq[Byte](0, 1, 2, -1))
    assert(back("t") == true && back("f") == false && back("z") == null)
    assert(back("i64") == Long.MaxValue && back("neg") == -42L)
  }

  private def withMongo[T](f: (Mongo.MiniMongo, Mongo.Client) => T): T = {
    val srv = new Mongo.MiniMongo().start()
    val c = new Mongo.Client(srv.address)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("insert + find with equality and comparison operators; limit") {
    withMongo { (_, c) =>
      c.insert("users", (1 to 10).map(i =>
        VectorMap[String, Any]("_id" -> i.toLong, "name" -> s"u$i", "score" -> i * 10.0)))
      assert(c.find("users").size == 10)
      assert(c.findOne("users", VectorMap("_id" -> 7L)).map(_("name")).contains("u7"))
      val hi = c.find("users", VectorMap[String, Any]("score" ->
        VectorMap[String, Any]("$gte" -> 80.0)))
      assert(hi.map(_("_id")) == Vector(8L, 9L, 10L))
      assert(c.find("users", VectorMap[String, Any]("score" ->
        VectorMap[String, Any]("$gt" -> 20.0, "$lt" -> 50.0))).size == 2)
      assert(c.find("users", limit = 3).size == 3)
      // cross-type numeric equality: int32 filter matches int64 field
      assert(c.findOne("users", VectorMap[String, Any]("_id" -> 7)).isDefined)
    }
  }

  test("update-one $set, replace-one, multi-update and upsert") {
    withMongo { (_, c) =>
      c.insert("docs", Seq(
        VectorMap[String, Any]("_id" -> 1L, "v" -> "a", "tag" -> "x"),
        VectorMap[String, Any]("_id" -> 2L, "v" -> "b", "tag" -> "x")))
      // $set touches one doc, leaves others
      c.updateOne("docs", VectorMap("_id" -> 1L),
        VectorMap[String, Any]("$set" -> VectorMap[String, Any]("v" -> "A")))
      assert(c.findOne("docs", VectorMap("_id" -> 1L)).map(_("v")).contains("A"))
      assert(c.findOne("docs", VectorMap("_id" -> 2L)).map(_("v")).contains("b"))
      // replace-one: full replacement keeps _id
      c.updateOne("docs", VectorMap("_id" -> 2L), VectorMap[String, Any]("w" -> 9L))
      val r = c.findOne("docs", VectorMap("_id" -> 2L)).get
      assert(r("w") == 9L && !r.contains("v"))
      // upsert inserts filter ∪ $set when no match
      val up = c.updateOne("docs", VectorMap("_id" -> 3L),
        VectorMap[String, Any]("$set" -> VectorMap[String, Any]("v" -> "new")), upsert = true)
      assert(up("upserted") == 1L)
      assert(c.findOne("docs", VectorMap("_id" -> 3L)).map(_("v")).contains("new"))
    }
  }

  test("delete one vs many; duplicate _id raises writeErrors 11000") {
    withMongo { (srv, c) =>
      c.insert("d", (1 to 6).map(i => VectorMap[String, Any]("_id" -> i.toLong, "k" -> (i % 2).toLong)))
      assert(c.deleteOne("d", VectorMap("k" -> 0L)) == 1L)
      assert(c.deleteMany("d", VectorMap("k" -> 0L)) == 2L)
      assert(srv.count("test", "d") == 3)
      val dup = c.insert("d", Seq(VectorMap[String, Any]("_id" -> 1L)))
      assert(dup.contains("writeErrors"))
    }
  }

  test("mixed-batch insert persists the non-duplicates (real mongod contract)") {
    withMongo { (srv, c) =>
      c.insert("m", Seq(VectorMap[String, Any]("_id" -> 1L)))
      // ordered (default): doc 0 lands, doc 1 dups with index=1, doc 2 never attempted
      val r1 = c.insert("m", Seq(
        VectorMap[String, Any]("_id" -> 2L), VectorMap[String, Any]("_id" -> 1L),
        VectorMap[String, Any]("_id" -> 3L)))
      assert(r1("n") == 1L && srv.count("test", "m") == 2)
      val we1 = r1("writeErrors").asInstanceOf[Vector[Any]]
      assert(we1.size == 1 &&
        we1.head.asInstanceOf[VectorMap[String, Any]]("index") == 1L)
      // unordered: every document attempted; both dups reported by index
      val r2 = c.insert("m", Seq(
        VectorMap[String, Any]("_id" -> 1L), VectorMap[String, Any]("_id" -> 3L),
        VectorMap[String, Any]("_id" -> 2L)), ordered = false)
      assert(r2("n") == 1L && srv.count("test", "m") == 3)
      val we2 = r2("writeErrors").asInstanceOf[Vector[Any]]
      assert(we2.map(_.asInstanceOf[VectorMap[String, Any]]("index")) == Vector(0L, 2L))
      assert(c.find("m").map(_("_id")).toSet == Set(1L, 2L, 3L))
    }
  }

  test("cache backend: get/set/add/delete with upsert set and duplicate-key add") {
    withMongo { (srv, _) =>
      val cache = new Mongo.Cache(srv.address, "kv", prefix = "ns_")
      try {
        assert(cache.get("k").isEmpty)
        cache.set("k", b("v1"))
        cache.set("k", b("v2")) // upsert overwrite
        assert(cache.get("k").map(new String(_, UTF_8)).contains("v2"))
        assert(!cache.add("k", b("v3")), "E11000 maps to add=false")
        assert(cache.add("k2", b("v3")))
        cache.delete("k")
        assert(cache.get("k").isEmpty && srv.count("test", "kv") == 1)
      } finally cache.close()
    }
  }

  test("hello handshake and unknown command error shape") {
    withMongo { (_, c) =>
      val hello = c.command(VectorMap("hello" -> 1L))
      assert(hello("ok") == 1.0 && hello("maxWireVersion") == 17L)
      val bad = c.command(VectorMap("frobnicate" -> 1L))
      assert(bad("ok") == 0.0 && bad("code") == 59L)
    }
  }

  test("concurrent clients: per-partition insert pattern is safe") {
    withMongo { (srv, _) =>
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val c = new Mongo.Client(srv.address)
          try (0 until 50).foreach(i =>
            c.insert("par", Seq(VectorMap[String, Any]("_id" -> (t * 1000 + i).toLong, "t" -> t.toLong))))
          finally c.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(srv.count("test", "par") == 400)
    }
  }
}
