package graft

import graft.conn.Pgwire
import org.scalatest.funsuite.AnyFunSuite

/** PostgreSQL wire protocol v3 over MiniCrdb: startup + cleartext auth,
  * the rangefeed-enabled prerequisite, pgwire INSERTs, and the
  * changefeed contract — backfill, live tail, and CURSOR resume. */
class PgwireSpec extends AnyFunSuite {

  private def withCrdb[T](f: (Pgwire.MiniCrdb, Pgwire.Client) => T): T = {
    val srv = new Pgwire.MiniCrdb("graft", "pg-pass").start()
    val c = new Pgwire.Client(srv.address, "graft", "pg-pass")
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("wrong password fails the cleartext handshake with the pg error message") {
    val srv = new Pgwire.MiniCrdb("graft", "pg-pass").start()
    try {
      val e = intercept[IllegalArgumentException](new Pgwire.Client(srv.address, "graft", "nope"))
      assert(e.getMessage.contains("password authentication failed"))
    } finally srv.stop()
  }

  test("changefeed requires the documented cluster setting first") {
    withCrdb { (_, c) =>
      val e = intercept[IllegalArgumentException](c.startChangefeed(Seq("foo")))
      assert(e.getMessage.contains("kv.rangefeed.enabled"))
      c.exec("SET CLUSTER SETTING kv.rangefeed.enabled = true")
      c.startChangefeed(Seq("foo")) // now accepted
    }
  }

  test("backfill + live tail: rows inserted before and during the feed all arrive in order") {
    withCrdb { (srv, c) =>
      c.exec("SET CLUSTER SETTING kv.rangefeed.enabled = true")
      val w = new Pgwire.Client(srv.address, "graft", "pg-pass")
      try {
        w.exec("""INSERT INTO foo VALUES ('[1]', '{"a": 1}')""")
        w.exec("""INSERT INTO foo VALUES ('[2]', '{"a": 2}')""")
        w.exec("""INSERT INTO bar VALUES ('[9]', '{"b": 9}')""") // other table: filtered
        c.startChangefeed(Seq("foo"))
        val backfill = Seq(c.nextRow().get, c.nextRow().get)
        assert(backfill.map(_.key) == Seq("[1]", "[2]"))
        assert(backfill.forall(_.table == "foo"))
        assert(backfill.head.valueJson.contains("\"a\": 1"))
        assert(c.nextRow(timeoutMs = 300).isEmpty, "caught up; feed idles")
        w.exec("""INSERT INTO foo VALUES ('[3]', '{"a": 3}')""")
        val live = c.nextRow().get
        assert(live.key == "[3]" && live.updated.nonEmpty)
        assert(live.updated > backfill.last.updated, "hlc timestamps advance")
      } finally w.close()
    }
  }

  test("CURSOR resume skips everything at or before the checkpoint (at-least-once restart)") {
    withCrdb { (srv, _) =>
      val c1 = new Pgwire.Client(srv.address, "graft", "pg-pass")
      c1.exec("SET CLUSTER SETTING kv.rangefeed.enabled = true")
      (1 to 5).foreach(i => c1.exec(s"""INSERT INTO t VALUES ('[$i]', '{"n": $i}')"""))
      c1.startChangefeed(Seq("t"))
      val firstThree = (1 to 3).map(_ => c1.nextRow().get)
      val checkpoint = firstThree.last.updated
      c1.close() // crash mid-consume after checkpointing row 3
      val c2 = new Pgwire.Client(srv.address, "graft", "pg-pass")
      try {
        c2.startChangefeed(Seq("t"), cursor = Some(checkpoint))
        val resumed = (4 to 5).map(_ => c2.nextRow().get)
        assert(resumed.map(_.key) == Seq("[4]", "[5]"), "resume delivers only post-cursor rows")
        assert(c2.nextRow(timeoutMs = 300).isEmpty)
      } finally c2.close()
    }
  }

  test("quoted literals with escaped quotes survive the INSERT path") {
    withCrdb { (srv, c) =>
      c.exec("SET CLUSTER SETTING kv.rangefeed.enabled = true")
      c.exec("""INSERT INTO q VALUES ('[''x'']', '{"s": "it''s"}')""")
      val r = new Pgwire.Client(srv.address, "graft", "pg-pass")
      try {
        r.startChangefeed(Seq("q"))
        val row = r.nextRow().get
        assert(row.key == "['x']")
        assert(row.valueJson.contains("it's"))
      } finally r.close()
    }
  }
}
