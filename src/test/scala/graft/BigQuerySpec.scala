package graft

import scala.collection.immutable.VectorMap

import graft.conn.Gcp
import org.scalatest.funsuite.AnyFunSuite

/** BigQuery REST v2 over MiniGcp: tabledata.insertAll (typed coercion,
  * insertId dedup), jobs.query with positional parameters and the
  * restricted SELECT shape the reference input generates, and
  * getQueryResults keyset paging — all behind the OAuth2 Bearer gate. */
class BigQuerySpec extends AnyFunSuite {

  private val (privPem, pubPem) = Gcp.generateKeyPair()
  private val sa = Gcp.ServiceAccount("svc@graft.iam.gserviceaccount.com", privPem)

  private def withBq[T](f: (Gcp.MiniGcp, Gcp.BigQueryClient) => T): T = {
    val srv = new Gcp.MiniGcp(sa, pubPem).start()
    srv.createBqTable("graft.ds.events",
      Seq("id" -> "INT64", "kind" -> "STRING", "score" -> "FLOAT64"))
    val c = new Gcp.BigQueryClient(srv.endpoint, sa)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  private def seed(c: Gcp.BigQueryClient, n: Int): Unit =
    c.insertAll("ds.events", (1 to n).map(i => VectorMap[String, Any](
      "id" -> i.toLong, "kind" -> (if (i % 2 == 0) "even" else "odd"),
      "score" -> i * 1.5)))

  test("insertAll + select round-trips typed values; where pushes ?-params down") {
    withBq { (srv, c) =>
      seed(c, 20)
      assert(srv.bqRowCount("graft.ds.events") == 20)
      val r = c.query("SELECT id, score FROM `graft.ds.events` WHERE kind = ? AND id > ?",
        Seq("odd", 10L))
      assert(r.columns == Vector("id", "score") && r.types == Vector("INT64", "FLOAT64"))
      val rows = r.rows.toVector
      assert(rows.map(_(0).toLong).sorted == Vector(11L, 13L, 15L, 17L, 19L))
      assert(rows.find(_(0) == "11").get(1).toDouble == 16.5)
    }
  }

  test("getQueryResults pages the result set; no call exceeds pageSize") {
    withBq { (_, c) =>
      seed(c, 57)
      val r = c.query("SELECT id FROM `graft.ds.events`", pageSize = 10)
      assert(r.rows.size == 57, "6 pages drained through pageToken")
    }
  }

  test("ORDER BY and LIMIT suffixes; unknown table/column are API errors") {
    withBq { (_, c) =>
      seed(c, 9)
      val top = c.query("SELECT id FROM `graft.ds.events` ORDER BY score DESC LIMIT 3")
      assert(top.rows.toVector.map(_(0).toLong) == Vector(9L, 8L, 7L))
      val e1 = intercept[IllegalArgumentException](c.query("SELECT id FROM `graft.ds.missing`").rows.size)
      assert(e1.getMessage.contains("Not found"))
      val e2 = intercept[IllegalArgumentException](c.query("SELECT nope FROM `graft.ds.events`").rows.size)
      assert(e2.getMessage.contains("Unrecognized name"))
    }
  }

  test("insertId dedups redelivered rows (the streaming-insert contract)") {
    withBq { (srv, c) =>
      val rows = (1 to 5).map(i => VectorMap[String, Any](
        "id" -> i.toLong, "kind" -> "x", "score" -> 0.0))
      c.insertAll("ds.events", rows, insertIdOf = r => Some(s"ins-${r("id")}"))
      c.insertAll("ds.events", rows, insertIdOf = r => Some(s"ins-${r("id")}")) // retry
      assert(srv.bqRowCount("graft.ds.events") == 5, "retried batch inserted nothing")
      c.insertAll("ds.events", rows) // no insertId: appended
      assert(srv.bqRowCount("graft.ds.events") == 10)
    }
  }

  test("queries are rejected without a live Bearer token") {
    val srv = new Gcp.MiniGcp(sa, pubPem).start()
    srv.createBqTable("graft.ds.t", Seq("a" -> "INT64"))
    val (otherPriv, _) = Gcp.generateKeyPair()
    val bad = new Gcp.BigQueryClient(srv.endpoint, Gcp.ServiceAccount(sa.clientEmail, otherPriv))
    try {
      val e = intercept[Exception](bad.query("SELECT a FROM `graft.ds.t`").rows.size)
      assert(e.getMessage.contains("401") || e.getMessage.contains("invalid_grant"))
    } finally { bad.close(); srv.stop() }
  }
}
