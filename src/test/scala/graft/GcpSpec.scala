package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Gcp
import org.scalatest.funsuite.AnyFunSuite

/** GCP REST protocols over MiniGcp: the OAuth2 JWT-bearer exchange with
  * real RS256 verification, Pub/Sub publish/pull/ack with ack-deadline
  * redelivery, and the Cloud Storage JSON API with pagination. */
class GcpSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private val (privPem, pubPem) = Gcp.generateKeyPair()
  private val sa = Gcp.ServiceAccount("svc@graft.iam.gserviceaccount.com", privPem)

  private def withGcp[T](ackMs: Long = 400)(f: Gcp.MiniGcp => T): T = {
    val srv = new Gcp.MiniGcp(sa, pubPem, ackDeadlineMs = ackMs).start()
    try f(srv) finally srv.stop()
  }

  test("token exchange verifies the RS256 assertion; wrong key / iss / aud rejected") {
    withGcp() { srv =>
      val good = new Gcp.PubSubClient(srv.endpoint, sa)
      srv.createTopic("t"); srv.createSubscription("s", "t")
      try {
        good.publish("t", Seq((b("ping"), Map.empty[String, String])))
        assert(srv.issuedTokens == 1)
      } finally good.close()
      // an assertion signed with a DIFFERENT private key fails verification
      val (otherPriv, _) = Gcp.generateKeyPair()
      val bad = new Gcp.PubSubClient(srv.endpoint, Gcp.ServiceAccount(sa.clientEmail, otherPriv))
      try {
        val e = intercept[IllegalArgumentException](bad.publish("t", Seq((b("x"), Map.empty[String, String]))))
        assert(e.getMessage.contains("invalid_grant"))
      } finally bad.close()
      // right key, unknown account email
      val badIss = new Gcp.PubSubClient(srv.endpoint, Gcp.ServiceAccount("other@x", privPem))
      try {
        val e = intercept[IllegalArgumentException](badIss.publish("t", Seq((b("x"), Map.empty[String, String]))))
        assert(e.getMessage.contains("unknown iss"))
      } finally badIss.close()
    }
  }

  test("publish/pull/ack round-trip with attributes; one token reused across calls") {
    withGcp(ackMs = 30000) { srv =>
      srv.createTopic("t"); srv.createSubscription("s", "t")
      val c = new Gcp.PubSubClient(srv.endpoint, sa)
      try {
        val ids = c.publish("t", Seq((b("m1"), Map("k" -> "v1")), (b("m2"), Map("k" -> "v2"))))
        assert(ids.size == 2 && ids.distinct.size == 2)
        val got = c.pull("s", maxMessages = 10)
        assert(got.map(m => new String(m.data, UTF_8)) == Seq("m1", "m2"))
        assert(got.map(_.attributes("k")) == Seq("v1", "v2"))
        assert(got.forall(_.deliveryAttempt == 1))
        c.acknowledge("s", got.map(_.ackId))
        assert(c.pull("s").isEmpty)
        assert(srv.issuedTokens == 1, "token cached, not re-minted per call")
      } finally c.close()
    }
  }

  test("ack deadline: unacked messages are redelivered with deliveryAttempt bumped; stale ackId is a no-op") {
    withGcp(ackMs = 300) { srv =>
      srv.createTopic("t"); srv.createSubscription("s", "t")
      val c = new Gcp.PubSubClient(srv.endpoint, sa)
      try {
        c.publish("t", Seq((b("m"), Map.empty[String, String])))
        val first = c.pull("s")
        assert(first.size == 1 && c.pull("s").isEmpty, "leased message is invisible")
        Thread.sleep(400)
        val again = c.pull("s")
        assert(again.size == 1 && again.head.deliveryAttempt == 2)
        c.acknowledge("s", first.map(_.ackId)) // stale lease's ackId no longer acks
        Thread.sleep(400)
        assert(c.pull("s").size == 1, "message survived the stale ack")
        c.acknowledge("s", c.pull("s").map(_.ackId) ++ again.map(_.ackId))
      } finally c.close()
    }
  }

  test("GCS insert/get/list/delete with pagination and nested names") {
    withGcp() { srv =>
      val c = new Gcp.GcsClient(srv.endpoint, sa)
      try {
        (1 to 15).foreach(i => c.insert("bkt", f"docs/d$i%03d.txt", b(s"v$i")))
        c.insert("bkt", "other/alt name+x.bin", Array[Byte](0, 1, 2))
        assert(c.get("bkt", "docs/d007.txt").map(new String(_, UTF_8)).contains("v7"))
        assert(c.get("bkt", "other/alt name+x.bin").get.toSeq == Seq[Byte](0, 1, 2))
        assert(c.list("bkt", "docs/", pageSize = 4) == (1 to 15).map(i => f"docs/d$i%03d.txt"))
        assert(c.delete("bkt", "docs/d001.txt"))
        assert(!c.delete("bkt", "docs/d001.txt"))
        assert(c.get("bkt", "docs/d001.txt").isEmpty)
        assert(srv.objectCount("bkt") == 15)
      } finally c.close()
    }
  }

  test("GCS cache backend get/set/add/delete") {
    withGcp() { srv =>
      val cache = new Gcp.GcsCache(srv.endpoint, sa, "cachebkt", prefix = "ns_")
      try {
        assert(cache.get("k").isEmpty)
        cache.set("k", b("v1"))
        assert(cache.get("k").map(new String(_, UTF_8)).contains("v1"))
        assert(!cache.add("k", b("v2")))
        assert(cache.add("k2", b("v2")))
        cache.delete("k")
        assert(cache.get("k").isEmpty && srv.objectCount("cachebkt") == 1)
      } finally cache.close()
    }
  }

  test("API calls without a live Bearer token are 401") {
    withGcp() { srv =>
      srv.createTopic("t")
      val http = new graft.conn.Aws.Http
      val r = http.request("POST", s"${srv.endpoint}/v1/projects/graft/topics/t:publish",
        Seq("content-type" -> "application/json"), b("""{"messages":[]}"""))
      assert(r.status == 401)
    }
  }
}
