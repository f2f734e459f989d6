package graft

import scala.collection.immutable.VectorMap

import graft.conn.Elastic
import graft.conn.Elastic.{CreateOp, DeleteOp, IndexOp, UpdateOp}
import org.scalatest.funsuite.AnyFunSuite

/** Elasticsearch `_bulk` NDJSON semantics over MiniElastic: per-item
  * statuses for the four actions, create conflicts, update doc-merge,
  * term/match_all search, and `_doc` lookups. */
class ElasticSpec extends AnyFunSuite {

  private def withEs[T](f: (Elastic.MiniElastic, Elastic.Client) => T): T = {
    val srv = new Elastic.MiniElastic().start()
    val c = new Elastic.Client(srv.endpoint)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("bulk index/create/update/delete per-item statuses and the errors flag") {
    withEs { (srv, c) =>
      val r1 = c.bulk(Seq(
        IndexOp("logs", "1", VectorMap("v" -> 1L)),
        CreateOp("logs", "2", VectorMap("v" -> 2L))))
      assert(!r1.errors)
      assert(r1.items.map(i => (i.action, i.status, i.result)) ==
        Seq(("index", 201L, "created"), ("create", 201L, "created")))
      // index on existing = updated 200; create on existing = 409 conflict
      val r2 = c.bulk(Seq(
        IndexOp("logs", "1", VectorMap("v" -> 10L)),
        CreateOp("logs", "2", VectorMap("v" -> 20L))))
      assert(r2.errors, "the create conflict sets the errors flag")
      assert(r2.items.map(i => (i.status, i.result)) ==
        Seq((200L, "updated"), (409L, "version_conflict")))
      assert(c.getDoc("logs", "1").get("v") == 10L)
      assert(c.getDoc("logs", "2").get("v") == 2L, "conflicting create left the doc alone")
      // update merges the patch into the doc; delete removes
      val r3 = c.bulk(Seq(
        UpdateOp("logs", "1", VectorMap("tag" -> "x")),
        DeleteOp("logs", "2"),
        UpdateOp("logs", "404", VectorMap("tag" -> "y"))))
      assert(r3.errors)
      assert(r3.items.map(_.status) == Seq(200L, 200L, 404L))
      assert(c.getDoc("logs", "1").get == VectorMap("v" -> 10L, "tag" -> "x"))
      assert(c.getDoc("logs", "2").isEmpty)
      assert(srv.docCount("logs") == 1)
    }
  }

  test("search: term query with numeric cross-type match, match_all with size") {
    withEs { (_, c) =>
      c.bulk((1 to 20).map(i => IndexOp("evt", i.toString,
        VectorMap[String, Any]("n" -> i.toLong, "kind" -> (if (i % 2 == 0) "even" else "odd")))))
      val odd = c.search("evt", term = Some("kind" -> "odd"), size = 100)
      assert(odd.size == 10 && odd.forall(_.source("kind") == "odd"))
      assert(c.search("evt", term = Some("n" -> 7L), size = 10).map(_.id) == Seq("7"))
      assert(c.search("evt", size = 5).size == 5, "size caps match_all")
      assert(c.search("evt", size = 100).size == 20)
    }
  }

  test("sliced search partitions the index disjointly and completely; pages are bounded") {
    withEs { (_, c) =>
      c.bulk((1 to 300).map(i => IndexOp("big", s"doc-$i",
        VectorMap[String, Any]("n" -> i.toLong))))
      val slices = 4
      // per-slice drain via bounded pages (pageSize 50 < 300 docs)
      val bySlice = (0 until slices).map { sid =>
        c.drainSlice("big", sid, slices, pageSize = 50).map(_.id).toVector
      }
      bySlice.foreach(ids => assert(ids == ids.sorted, "pages arrive in _id order"))
      val union = bySlice.flatten
      assert(union.size == 300, "complete: every doc in exactly one slice")
      assert(union.toSet.size == 300, "disjoint: no doc appears twice")
      assert(bySlice.count(_.nonEmpty) >= 2, "the hash actually spreads docs")
      // no single call returns more than the page size
      val page = c.searchPage("big", slice = Some((0, slices)), size = 50)
      assert(page.size <= 50)
    }
  }

  test("search_after keyset pagination walks the full order without overlap") {
    withEs { (_, c) =>
      c.bulk((1 to 25).map(i => IndexOp("pg", f"k$i%03d",
        VectorMap[String, Any]("n" -> i.toLong))))
      var after: Option[String] = None
      val seen = Vector.newBuilder[String]
      var done = false
      while (!done) {
        val page = c.searchPage("pg", after = after, size = 10)
        seen ++= page.map(_.id)
        if (page.size < 10) done = true else after = Some(page.last.id)
      }
      val ids = seen.result()
      assert(ids == (1 to 25).map(i => f"k$i%03d").toVector, "ordered, complete, no overlap")
    }
  }

  test("dynamic index creation on first bulk write") {
    withEs { (srv, c) =>
      assert(srv.docCount("fresh") == 0)
      c.bulk(Seq(IndexOp("fresh", "a", VectorMap("x" -> 1L))))
      assert(srv.docCount("fresh") == 1)
    }
  }
}
