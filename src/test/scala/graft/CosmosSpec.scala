package graft

import scala.collection.immutable.VectorMap

import graft.conn.Cosmos
import org.scalatest.funsuite.AnyFunSuite

/** Cosmos DB SQL API over MiniCosmos: the documented master-key token,
  * create/upsert/conflict semantics, per-partition-key parameterized
  * queries, projections, and continuation paging. */
class CosmosSpec extends AnyFunSuite {

  private def withCosmos[T](f: (Cosmos.MiniCosmos, Cosmos.Client) => T): T = {
    val srv = new Cosmos.MiniCosmos().start()
    srv.createContainer("fish")
    val c = new Cosmos.Client(srv.endpoint)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("create is conflict-checked per (pk,id); upsert overwrites") {
    withCosmos { (srv, c) =>
      assert(c.create("fish", "deep", VectorMap("id" -> "1", "species" -> "blobfish", "depth" -> 900L)))
      assert(!c.create("fish", "deep", VectorMap("id" -> "1", "species" -> "dup")), "409 -> false")
      assert(c.create("fish", "shallow", VectorMap("id" -> "1", "species" -> "clownfish")),
        "same id under another partition key is a different document")
      c.upsert("fish", "deep", VectorMap("id" -> "1", "species" -> "blobfish-v2", "depth" -> 950L))
      assert(srv.docCount("fish") == 2)
      val got = c.query("fish", "deep", "SELECT c.species FROM fish AS c")
      assert(got.map(_("species")) == Vector("blobfish-v2"))
    }
  }

  test("parameterized query with the reference's own example shape; projections") {
    withCosmos { (_, c) =>
      (1 to 10).foreach(i => c.create("fish", "deep", VectorMap(
        "id" -> f"d$i%02d", "species" -> (if (i % 2 == 0) "eel" else "blobfish"),
        "depth" -> (i * 100).toLong)))
      val hits = c.query("fish", "deep",
        "SELECT c.id, c.depth FROM fish AS c WHERE c.species = @species AND c.depth > @min",
        Map("@species" -> "blobfish", "@min" -> 300L))
      assert(hits.map(_("id")) == Vector("d05", "d07", "d09"))
      assert(hits.head.keySet == Set("id", "depth"), "projection drops species")
      val all = c.query("fish", "deep", "SELECT * FROM fish AS c")
      assert(all.size == 10 && all.head.contains("species"))
    }
  }

  test("queries are scoped to ONE partition key (the reference's documented restriction)") {
    withCosmos { (_, c) =>
      c.create("fish", "pkA", VectorMap("id" -> "1", "v" -> 1L))
      c.create("fish", "pkB", VectorMap("id" -> "2", "v" -> 2L))
      assert(c.query("fish", "pkA", "SELECT * FROM fish AS c").size == 1)
      assert(c.query("fish", "pkB", "SELECT * FROM fish AS c").size == 1)
    }
  }

  test("pages follow x-ms-continuation; no page exceeds maxItemCount") {
    withCosmos { (_, c) =>
      (1 to 57).foreach(i => c.create("fish", "p", VectorMap("id" -> f"i$i%03d", "n" -> i.toLong)))
      val all = c.query("fish", "p", "SELECT * FROM fish AS c", maxItemCount = 10)
      assert(all.size == 57)
    }
  }

  test("a wrong master key is 401") {
    val srv = new Cosmos.MiniCosmos().start()
    srv.createContainer("x")
    val bad = new Cosmos.Client(srv.endpoint, masterKeyB64 =
      java.util.Base64.getEncoder.encodeToString("wrong".getBytes("UTF-8")))
    try {
      val e = intercept[IllegalArgumentException](
        bad.create("x", "p", VectorMap("id" -> "1")))
      assert(e.getMessage.contains("401"))
    } finally { bad.close(); srv.stop() }
  }
}
