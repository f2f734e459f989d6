package graft

import graft.conn.Bolt
import graft.conn.Bolt._
import org.scalatest.funsuite.AnyFunSuite

/** Bolt/PackStream from the public specs: marker-level codec vectors,
  * the 4.4 handshake, HELLO auth, RUN/PULL with fetch-size batching and
  * has_more, FAILURE + RESET recovery, chunked framing of large
  * records, and the restricted Cypher evaluator's semantics. */
class BoltSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02X").mkString(" ")

  test("packstream encodes the spec's documented marker shapes") {
    assert(hex(pack(PInt(1))) == "01", "tiny int")
    assert(hex(pack(PInt(-16))) == "F0", "low tiny int")
    assert(hex(pack(PInt(-17))) == "C8 EF", "INT_8")
    assert(hex(pack(PInt(128))) == "C9 00 80", "INT_16")
    assert(hex(pack(PInt(2147483648L))) == "CB 00 00 00 00 80 00 00 00", "INT_64")
    assert(hex(pack(PStr("hello"))) == "85 68 65 6C 6C 6F", "tiny string")
    assert(hex(pack(PNull)) == "C0" && hex(pack(PBool(true))) == "C3")
    assert(hex(pack(PFloat(1.1))) == "C1 3F F1 99 99 99 99 99 9A", "the spec's own 1.1 example")
    assert(hex(pack(PList(Vector(PInt(1), PInt(2), PInt(3))))) == "93 01 02 03", "tiny list")
    val m = pack(PMap(scala.collection.immutable.VectorMap("one" -> PStr("eins"))))
    assert(hex(m) == "A1 83 6F 6E 65 84 65 69 6E 73", "the spec's own map example")
    // round-trips including sized forms
    val big = PStr("x" * 300)
    assert(new Unpacker(pack(big)).unpack() == big)
    val struct = PStruct(0x4E, Vector(PInt(7), PList(Vector(PStr("L"))),
      PMap(scala.collection.immutable.VectorMap("k" -> PInt(1)))))
    assert(new Unpacker(pack(struct)).unpack() == struct)
  }

  private def withNeo[T](f: (Bolt.MiniNeo4j, Bolt.Client) => T): T = {
    val srv = new Bolt.MiniNeo4j().start()
    val c = new Bolt.Client(srv.address)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("create + match round-trip with $-parameters; RETURN node vs properties") {
    withNeo { (srv, c) =>
      (1 to 5).foreach { i =>
        val (fields, rows) = c.run(
          "CREATE (p:Person {name: $name, age: $age}) RETURN p",
          Map("name" -> s"u$i", "age" -> (20L + i)))
        assert(fields == Vector("p") && rows.size == 1)
      }
      assert(srv.nodeCount("Person") == 5)
      val (cols, rows) = c.run(
        "MATCH (n:Person) WHERE n.age > $min RETURN n.name AS name, n.age AS age ORDER BY n.age",
        Map("min" -> 22L))
      assert(cols == Vector("name", "age"))
      assert(rows.map(r => (r(0), r(1))) == Vector(("u3", 23L), ("u4", 24L), ("u5", 25L)))
    }
  }

  test("PULL with a small fetch size pages through has_more") {
    withNeo { (_, c) =>
      (1 to 37).foreach(i => c.run("CREATE (e:Evt {n: $n})", Map("n" -> i.toLong)))
      val (_, rows) = c.run("MATCH (e:Evt) RETURN e.n", fetchSize = 5)
      assert(rows.size == 37, "8 PULL batches via has_more")
    }
  }

  test("FAILURE + RESET: a bad statement errors, the connection keeps working") {
    withNeo { (_, c) =>
      val e = intercept[BoltFailure](c.run("DROP EVERYTHING"))
      assert(e.code == "Neo.ClientError.Statement.SyntaxError")
      val missing = intercept[BoltFailure](c.run("CREATE (x:T {v: $nope})"))
      assert(missing.text.contains("Expected parameter"))
      c.run("CREATE (x:T {v: 1})")
      assert(c.run("MATCH (x:T) RETURN x.v")._2 == Vector(Vector(1L)))
    }
  }

  test("bad credentials are rejected at HELLO with the documented code") {
    val srv = new Bolt.MiniNeo4j().start()
    try {
      val e = intercept[BoltFailure](new Bolt.Client(srv.address, password = "wrong"))
      assert(e.code == "Neo.ClientError.Security.Unauthorized")
    } finally srv.stop()
  }

  test("a record larger than one chunk (64 KiB) spans chunks and reassembles") {
    withNeo { (_, c) =>
      val big = "y" * 200000
      c.run("CREATE (b:Blob {data: $d})", Map("d" -> big))
      val (_, rows) = c.run("MATCH (b:Blob) RETURN b.data")
      assert(rows.head.head == big)
    }
  }
}
