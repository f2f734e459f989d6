package graft

import graft.conn.Cassandra
import org.scalatest.funsuite.AnyFunSuite

/** CQL native protocol v4 over MiniCassandra: STARTUP→READY handshake,
  * PREPARE/EXECUTE with typed big-endian binds, Rows decoding via
  * response metadata, WHERE pushdown, nulls, and error frames. */
class CassandraSpec extends AnyFunSuite {

  private def withCas[T](f: (Cassandra.MiniCassandra, Cassandra.Client) => T): T = {
    val srv = new Cassandra.MiniCassandra().start()
    val c = new Cassandra.Client(srv.address) // STARTUP happens in the constructor
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("create table, prepared inserts, select star round-trips all four types") {
    withCas { (srv, c) =>
      c.execute("CREATE TABLE graft.t (id bigint, name varchar, score double, ok boolean, PRIMARY KEY(id))")
      val p = c.prepare("INSERT INTO graft.t (id, name, score, ok) VALUES (?, ?, ?, ?)")
      assert(p.bindCols.map(_.name) == Vector("id", "name", "score", "ok"))
      c.executePrepared(p, Seq(1L, "alpha", 1.5, true))
      c.executePrepared(p, Seq(2L, "βeta", -2.25, false))
      c.executePrepared(p, Seq(3L, null, 0.0, true))
      assert(srv.rowCount("t") == 3)
      val (cols, rows) = c.query("SELECT * FROM graft.t")
      assert(cols.map(_.name) == Vector("id", "name", "score", "ok"))
      assert(cols.map(c2 => Cassandra.typeName(c2.tpe)) == Vector("bigint", "varchar", "double", "boolean"))
      assert(rows.toSet == Set(
        Vector(1L, "alpha", 1.5, true),
        Vector(2L, "βeta", -2.25, false),
        Vector(3L, null, 0.0, true)))
    }
  }

  test("projection and WHERE equality bind filter server-side") {
    withCas { (_, c) =>
      c.execute("CREATE TABLE graft.ev (id bigint, kind varchar, PRIMARY KEY(id))")
      val p = c.prepare("INSERT INTO graft.ev (id, kind) VALUES (?, ?)")
      (1 to 10).foreach(i => c.executePrepared(p, Seq(i.toLong, if (i % 2 == 0) "even" else "odd")))
      val (cols, rows) = c.query("SELECT id FROM graft.ev WHERE id = ?", bind = Some(7L))
      assert(cols.map(_.name) == Vector("id"))
      assert(rows == Vector(Vector(7L)))
      val (_, all) = c.query("SELECT kind FROM graft.ev")
      assert(all.count(_ == Vector("even")) == 5)
    }
  }

  test("partial-column insert leaves unbound columns null") {
    withCas { (_, c) =>
      c.execute("CREATE TABLE graft.p (id bigint, a varchar, b varchar, PRIMARY KEY(id))")
      val p = c.prepare("INSERT INTO graft.p (id, b) VALUES (?, ?)")
      c.executePrepared(p, Seq(1L, "only-b"))
      val (_, rows) = c.query("SELECT * FROM graft.p")
      assert(rows == Vector(Vector(1L, null, "only-b")))
    }
  }

  test("error frames: unknown table, wrong bind arity, undefined column") {
    withCas { (_, c) =>
      val e1 = intercept[IllegalArgumentException](c.prepare("INSERT INTO graft.none (x) VALUES (?)"))
      assert(e1.getMessage.contains("unconfigured table"))
      c.execute("CREATE TABLE graft.t2 (id bigint, PRIMARY KEY(id))")
      val p = c.prepare("INSERT INTO graft.t2 (id) VALUES (?)")
      val e2 = intercept[IllegalArgumentException](c.executePrepared(
        p.copy(bindCols = p.bindCols ++ p.bindCols), Seq(1L, 2L)))
      assert(e2.getMessage.contains("expected 1 values"))
      val e3 = intercept[IllegalArgumentException](c.query("SELECT nope FROM graft.t2"))
      assert(e3.getMessage.contains("undefined column"))
    }
  }

  test("concurrent per-partition writers share the server safely") {
    withCas { (srv, c) =>
      c.execute("CREATE TABLE graft.w (id bigint, t bigint, PRIMARY KEY(id))")
      val threads = (0 until 8).map { t =>
        new Thread(() => {
          val cc = new Cassandra.Client(srv.address)
          try {
            val p = cc.prepare("INSERT INTO graft.w (id, t) VALUES (?, ?)")
            (0 until 50).foreach(i => cc.executePrepared(p, Seq((t * 1000 + i).toLong, t.toLong)))
          } finally cc.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(srv.rowCount("w") == 400)
    }
  }
}
