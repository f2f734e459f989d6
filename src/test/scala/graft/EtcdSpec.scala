package graft

import graft.conn.Etcd
import org.scalatest.funsuite.AnyFunSuite

/** etcd v3 over the from-scratch gRPC/HTTP2/HPACK stack: MVCC
  * revisions, Range reads, and the Watch backfill-then-tail contract
  * with start_revision resume — the reference input's semantics. */
class EtcdSpec extends AnyFunSuite {

  private def withEtcd[T](f: (Etcd.MiniEtcd, Etcd.Client) => T): T = {
    val srv = new Etcd.MiniEtcd().start()
    val c = new Etcd.Client("127.0.0.1", srv.port)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("put bumps the cluster revision; range reads back sorted with prefix semantics") {
    withEtcd { (srv, c) =>
      assert(c.put("app/a", "1") == 1L)
      assert(c.put("app/b", "2") == 2L)
      assert(c.put("app/a", "1b") == 3L, "overwrite bumps revision")
      assert(c.put("other/z", "9") == 4L)
      assert(srv.currentRevision == 4L)
      assert(c.range("app/", rangeEnd = "app0") == Seq("app/a" -> "1b", "app/b" -> "2"))
      assert(c.range("app/a") == Seq("app/a" -> "1b"), "empty range_end = exact key")
      assert(c.range("app/", rangeEnd = "app0", limit = 1).size == 1)
    }
  }

  test("watch backfills history then tails live events with the reference's flattened shape") {
    withEtcd { (srv, c) =>
      c.put("w/k1", "v1")
      c.put("w/k2", "v2")
      val w = c.watch("w/", rangeEnd = "w0", startRevision = 1)
      val backfill = Seq(w.next().get, w.next().get)
      assert(backfill.map(_.key) == Seq("w/k1", "w/k2"))
      assert(backfill.forall(_.eventType == "PUT"))
      assert(backfill.map(_.modRevision) == Seq(1L, 2L))
      assert(backfill.head.version == 1L && backfill.head.createRevision == 1L)
      assert(w.next(300).isEmpty, "caught up; watch idles")
      c.put("w/k1", "v1b") // live tail, version bumps
      val live = w.next().get
      assert(live.key == "w/k1" && live.value == "v1b" && live.version == 2L)
      srv.deleteDirect("w/k2")
      val del = w.next().get
      assert(del.eventType == "DELETE" && del.key == "w/k2")
    }
  }

  test("zero/absent start_revision means live-only (the public contract), not history replay") {
    withEtcd { (_, c) =>
      c.put("z/k1", "v1")
      c.put("z/k2", "v2")
      val w = c.watch("z/", rangeEnd = "z0") // no start_revision: from now
      assert(w.next(300).isEmpty, "no backfill without an explicit start_revision")
      c.put("z/k3", "v3")
      val live = w.next().get
      assert(live.key == "z/k3" && live.value == "v3")
    }
  }

  test("start_revision resumes a watch past the checkpoint; range filter scopes events") {
    withEtcd { (_, c) =>
      (1 to 5).foreach(i => c.put(s"r/k$i", s"v$i"))
      c.put("outside", "x")
      val w1 = c.watch("r/", rangeEnd = "r0", startRevision = 1)
      val firstThree = (1 to 3).map(_ => w1.next().get)
      val checkpoint = firstThree.last.modRevision
      // resume from checkpoint+1 on a fresh client (crash/restart shape)
      val w2 = c.watch("r/", rangeEnd = "r0", startRevision = checkpoint + 1)
      val resumed = (4 to 5).map(_ => w2.next().get)
      assert(resumed.map(_.key) == Seq("r/k4", "r/k5"))
      assert(resumed.forall(_.key.startsWith("r/")), "the out-of-range key never appears")
      assert(w2.next(300).isEmpty)
    }
  }

  test("concurrent writers through separate gRPC clients serialize into one revision order") {
    withEtcd { (srv, c) =>
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          val w = new Etcd.Client("127.0.0.1", srv.port)
          try (0 until 25).foreach(i => w.put(s"c/$t-$i", s"$t-$i"))
          finally w.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(srv.currentRevision == 100L)
      assert(c.range("c/", rangeEnd = "c0").size == 100)
      val w = c.watch("c/", rangeEnd = "c0", startRevision = 1)
      val revs = (1 to 100).map(_ => w.next().get.modRevision)
      assert(revs == revs.sorted && revs.distinct.size == 100, "one total revision order")
    }
  }
}
