package graft

import scala.collection.immutable.VectorMap

import graft.conn.Kube
import org.scalatest.funsuite.AnyFunSuite

/** kubernetes_watch over MiniKubeApiserver: Bearer auth, list with the
  * resourceVersion bookmark, the chunked replay-then-tail watch stream,
  * label selectors on both paths, and write semantics (409/404,
  * MODIFIED vs ADDED, DELETED markers). */
class KubeSpec extends AnyFunSuite {

  private def withKube[T](f: (Kube.MiniKubeApiserver, Kube.Client) => T): T = {
    val srv = new Kube.MiniKubeApiserver("kube-token-1").start()
    val c = new Kube.Client(srv.endpoint, "kube-token-1")
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("writes bump the resourceVersion; list carries the bookmark; 409/404 semantics") {
    withKube { (srv, c) =>
      c.create("pods", "a", Map("app" -> "x"), VectorMap("image" -> "img:1"))
      c.create("pods", "b", Map("app" -> "y"), VectorMap("image" -> "img:2"))
      assert(srv.currentResourceVersion == 2L)
      val e409 = intercept[IllegalArgumentException](
        c.create("pods", "a", Map.empty, VectorMap("image" -> "dup")))
      assert(e409.getMessage.contains("409"))
      val e404 = intercept[IllegalArgumentException](
        c.update("pods", "zz", Map.empty, VectorMap.empty))
      assert(e404.getMessage.contains("404"))
      val (items, rv) = c.list("pods")
      assert(items.size == 2 && rv == 2L)
      val (onlyX, _) = c.list("pods", Map("app" -> "x"))
      assert(onlyX.size == 1 && onlyX.head.contains("\"name\":\"a\""))
    }
  }

  test("watch replays history after resourceVersion, then tails live events") {
    withKube { (srv, c) =>
      c.create("pods", "p1", Map("app" -> "w"), VectorMap("image" -> "i1"))
      c.update("pods", "p1", Map("app" -> "w"), VectorMap("image" -> "i2"))
      c.delete("pods", "p1")
      val w = new Kube.Watch(srv.endpoint, "kube-token-1", "default", "pods", resourceVersion = 0L)
      try {
        val replay = Seq(w.next().get, w.next().get, w.next().get)
        assert(replay.map(_.eventType) == Seq("ADDED", "MODIFIED", "DELETED"))
        assert(replay.map(_.resourceVersion) == Seq(1L, 2L, 3L), "events carry their rv")
        assert(w.next(300).isEmpty, "caught up; stream idles")
        c.create("pods", "p2", Map("app" -> "w"), VectorMap("image" -> "i3"))
        val live = w.next().get
        assert(live.eventType == "ADDED" && live.name == "p2")
      } finally w.close()
    }
  }

  test("watch from a later resourceVersion skips already-seen history; selector scopes events") {
    withKube { (srv, c) =>
      c.create("pods", "keep", Map("tier" -> "a"), VectorMap("image" -> "i"))
      c.create("pods", "skip", Map("tier" -> "b"), VectorMap("image" -> "i"))
      val checkpoint = srv.currentResourceVersion
      c.update("pods", "keep", Map("tier" -> "a"), VectorMap("image" -> "i2"))
      c.update("pods", "skip", Map("tier" -> "b"), VectorMap("image" -> "i2"))
      val w = new Kube.Watch(srv.endpoint, "kube-token-1", "default", "pods",
        resourceVersion = checkpoint, labelSelector = Map("tier" -> "a"))
      try {
        val ev = w.next().get
        assert(ev.name == "keep" && ev.eventType == "MODIFIED")
        assert(w.next(300).isEmpty, "tier=b event filtered; nothing else after the checkpoint")
      } finally w.close()
    }
  }

  test("requests without the Bearer token are 401") {
    withKube { (srv, _) =>
      val bad = new Kube.Client(srv.endpoint, "wrong-token")
      try {
        val e = intercept[IllegalArgumentException](bad.list("pods"))
        assert(e.getMessage.contains("401"))
      } finally bad.close()
    }
  }
}
