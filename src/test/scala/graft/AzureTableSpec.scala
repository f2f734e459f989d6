package graft

import scala.collection.immutable.VectorMap

import graft.conn.Azure
import org.scalatest.funsuite.AnyFunSuite

/** Azure Table service over MiniAzure: the table-flavored SharedKey
  * string-to-sign, entity insert/merge/replace/delete semantics, the
  * documented OData filter subset, and continuation-token paging. */
class AzureTableSpec extends AnyFunSuite {

  private def withTable[T](f: (Azure.MiniAzure, Azure.TableClient) => T): T = {
    val srv = new Azure.MiniAzure().start()
    val tc = new Azure.TableClient(srv.endpoint, Azure.testAccount)
    try { tc.createTable("t"); f(srv, tc) } finally { tc.close(); srv.stop() }
  }

  test("insert is create-only (409=false); merge patches, replace overwrites, delete removes") {
    withTable { (_, tc) =>
      assert(tc.insert("t", "p1", "r1", VectorMap("a" -> 1L, "b" -> "x")))
      assert(!tc.insert("t", "p1", "r1", VectorMap("a" -> 9L)), "duplicate -> 409 -> false")
      tc.merge("t", "p1", "r1", VectorMap("c" -> 2.5))
      val merged = tc.get("t", "p1", "r1").get
      assert(merged("a") == 1L && merged("b") == "x" && merged("c") == 2.5, "merge keeps old props")
      tc.replace("t", "p1", "r1", VectorMap("z" -> true))
      val replaced = tc.get("t", "p1", "r1").get
      assert(!replaced.contains("a") && replaced("z") == true, "replace drops old props")
      assert(replaced("PartitionKey") == "p1" && replaced("RowKey") == "r1")
      assert(tc.delete("t", "p1", "r1") && tc.get("t", "p1", "r1").isEmpty)
      assert(!tc.delete("t", "p1", "r1"), "second delete -> 404 -> false")
    }
  }

  test("merge on a missing entity inserts (insert-or-merge semantics)") {
    withTable { (_, tc) =>
      tc.merge("t", "p", "new", VectorMap("v" -> 7L))
      assert(tc.get("t", "p", "new").get("v") == 7L)
    }
  }

  test("$filter subset: string and numeric operators joined by and") {
    withTable { (_, tc) =>
      (1 to 20).foreach(i => tc.insert("t", if (i % 2 == 0) "even" else "odd",
        f"r$i%03d", VectorMap("n" -> i.toDouble)))
      val evens = tc.query("t", filter = Some("PartitionKey eq 'even'"))
      assert(evens.size == 10)
      val big = tc.query("t", filter = Some("PartitionKey eq 'odd' and n gt 10"))
      assert(big.map(_("n")).toSet == Set(11.0, 13.0, 15.0, 17.0, 19.0))
      assert(tc.query("t", filter = Some("n le 2")).size == 2)
    }
  }

  test("queries page through continuation tokens; no call exceeds $top") {
    withTable { (_, tc) =>
      (1 to 57).foreach(i => tc.insert("t", "p", f"r$i%03d", VectorMap("n" -> i.toDouble)))
      val all = tc.query("t", top = 10)
      assert(all.size == 57, "6 pages via x-ms-continuation headers")
      assert(all.map(_("RowKey").asInstanceOf[String]) == all.map(_("RowKey").asInstanceOf[String]).sorted)
    }
  }

  test("a client signing with the wrong key is rejected 403") {
    val srv = new Azure.MiniAzure().start()
    val bad = new Azure.TableClient(srv.endpoint, Azure.Account("devaccount",
      java.util.Base64.getEncoder.encodeToString("wrong-key".getBytes("UTF-8"))))
    try {
      val e = intercept[IllegalArgumentException](bad.createTable("x"))
      assert(e.getMessage.contains("403"))
    } finally { bad.close(); srv.stop() }
  }
}
