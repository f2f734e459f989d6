package graft

import graft.conn.Spanner
import org.scalatest.funsuite.AnyFunSuite

/** Spanner change streams over the from-scratch gRPC stack: sessions,
  * parameterized DML, the READ_<stream> TVF with the NULL-token
  * partition-tree root query, per-token disjoint-and-complete replay,
  * the bounded timestamp window, and heartbeat records. */
class SpannerSpec extends AnyFunSuite {

  private def withSpanner[T](partitions: Int = 4)(f: (Spanner.MiniSpanner, Spanner.Client) => T): T = {
    val srv = new Spanner.MiniSpanner("OrderStream", "orders", partitions).start()
    val c = new Spanner.Client("127.0.0.1", srv.port)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("the NULL-token query names the partition roots; tokens split changes disjointly and completely") {
    withSpanner() { (srv, c) =>
      (1 to 40).foreach(i => c.insert("orders", Seq("okey" -> i.toLong, "total" -> i * 1.5)))
      assert(srv.changeCount == 40)
      val tokens = c.initialTokens("OrderStream")
      assert(tokens.size == 4 && tokens.distinct.size == 4)
      val perToken = tokens.map(t => c.readPartition("OrderStream", t))
      val all = perToken.flatten
      assert(all.size == 40, "complete across the token set")
      assert(all.map(_.keys("okey")).distinct.size == 40, "disjoint: no change seen twice")
      assert(perToken.count(_.nonEmpty) >= 2, "the key hash actually spreads partitions")
      assert(all.forall(c => c.modType == "INSERT" && c.table == "orders"))
      val one = all.find(_.keys("okey") == 7L).get
      assert(one.newValues("total") == 10.5)
    }
  }

  test("commit timestamps are a total order; the window [start, end) bounds the replay") {
    withSpanner(partitions = 1) { (_, c) =>
      (1 to 10).foreach(i => c.insert("orders", Seq("okey" -> i.toLong)))
      val t = c.initialTokens("OrderStream").head
      val all = c.readPartition("OrderStream", t)
      assert(all.map(_.commitTimestamp) == (1L to 10L).toVector, "one total commit order")
      val window = c.readPartition("OrderStream", t, start = 4L, end = Some(8L))
      assert(window.map(_.commitTimestamp) == Vector(4L, 5L, 6L, 7L), "inclusive start, exclusive end")
      val resumed = c.readPartition("OrderStream", t, start = 8L)
      assert(resumed.map(_.commitTimestamp) == Vector(8L, 9L, 10L), "checkpoint resume shape")
    }
  }

  test("sessions are created per client; unsupported SQL fails the RPC, not the connection") {
    withSpanner() { (_, c) =>
      intercept[Exception](c.insert("unknown_table", Seq("a" -> 1L)))
      c.insert("orders", Seq("okey" -> 1L)) // connection still usable
      assert(c.initialTokens("OrderStream").nonEmpty)
    }
  }
}
