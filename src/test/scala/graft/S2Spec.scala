package graft

import graft.conn.S2
import org.scalatest.funsuite.AnyFunSuite

/** S2 streams over MiniS2: batch appends with assigned seq-num
  * windows, cursored bounded reads, prefix listing, tail cursors,
  * headers, and the Bearer gate. */
class S2Spec extends AnyFunSuite {

  private def withS2[T](f: (S2.MiniS2, S2.Client) => T): T = {
    val srv = new S2.MiniS2("s2-token").start()
    val c = new S2.Client(srv.endpoint, "s2-token")
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("appends assign a strictly increasing [start,end) window; reads resume by cursor") {
    withS2 { (srv, c) =>
      assert(c.append("s/a", Seq(("r1", Vector.empty), ("r2", Vector.empty))) == S2.AppendAck(0L, 2L))
      assert(c.append("s/a", Seq(("r3", Vector.empty))) == S2.AppendAck(2L, 3L))
      assert(srv.streamLen("s/a") == 3)
      val all = c.readAll("s/a", pageSize = 2)
      assert(all.map(_.body) == Vector("r1", "r2", "r3"))
      assert(all.map(_.seqNum) == Vector(0L, 1L, 2L))
      assert(c.readAll("s/a", fromSeqNum = 2L).map(_.body) == Vector("r3"), "cursor resume")
      assert(c.tail("s/a") == 3L, "tail is the next seq num")
    }
  }

  test("headers ride records; prefix listing scopes streams (the input's prefix mode)") {
    withS2 { (_, c) =>
      c.append("pfx/one", Seq(("x", Vector("k" -> "v", "k2" -> "v2"))))
      c.append("pfx/two", Seq(("y", Vector.empty)))
      c.append("other", Seq(("z", Vector.empty)))
      assert(c.listStreams("pfx/") == Vector("pfx/one", "pfx/two"))
      assert(c.listStreams() == Vector("other", "pfx/one", "pfx/two"))
      assert(c.readAll("pfx/one").head.headers == Vector("k" -> "v", "k2" -> "v2"))
    }
  }

  test("requests without the token are 401") {
    val srv = new S2.MiniS2("s2-token").start()
    val bad = new S2.Client(srv.endpoint, "wrong")
    try {
      val e = intercept[IllegalArgumentException](bad.listStreams())
      assert(e.getMessage.contains("401"))
    } finally { bad.close(); srv.stop() }
  }
}
