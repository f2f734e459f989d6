package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Aws, S3}
import graft.conn.Aws.SigV4
import org.scalatest.funsuite.AnyFunSuite

/** SigV4 signing pinned against the PUBLIC worked example in the AWS
  * General Reference ("Signature Version 4 signing process" — the
  * 2015-08-30 IAM ListUsers request), plus the S3 REST protocol over
  * MiniS3 with signature verification on every request.
  */
class AwsSpec extends AnyFunSuite {

  // --- the documented example request -------------------------------
  private val docCreds = SigV4.Credentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  private val docHeaders = Seq(
    "host" -> "iam.amazonaws.com",
    "content-type" -> "application/x-www-form-urlencoded; charset=utf-8",
    "x-amz-date" -> "20150830T123600Z")
  private val docQuery = Seq("Action" -> "ListUsers", "Version" -> "2010-05-08")

  test("SigV4 canonical request hashes to the documented value") {
    val (cr, signed) = SigV4.canonicalRequest("GET", "/", SigV4.canonicalQuery(docQuery),
      docHeaders, SigV4.emptyPayloadHash)
    assert(signed == "content-type;host;x-amz-date")
    assert(SigV4.sha256Hex(cr.getBytes(UTF_8)) ==
      "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59")
  }

  test("SigV4 final signature matches the documented value") {
    val auth = SigV4.authorization(docCreds, "us-east-1", "iam", "GET", "/", docQuery,
      docHeaders, SigV4.emptyPayloadHash, "20150830T123600Z")
    assert(auth.endsWith("Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"))
    assert(auth.startsWith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request"))
  }

  test("SigV4 uriEncode: unreserved kept, slash mode, UTF-8 percent-escapes") {
    assert(SigV4.uriEncode("AZaz09-_.~", encodeSlash = true) == "AZaz09-_.~")
    assert(SigV4.uriEncode("a/b", encodeSlash = true) == "a%2Fb")
    assert(SigV4.uriEncode("a/b", encodeSlash = false) == "a/b")
    assert(SigV4.uriEncode("a b+c", encodeSlash = true) == "a%20b%2Bc")
    assert(SigV4.uriEncode("é", encodeSlash = true) == "%C3%A9")
  }

  test("server-side verify accepts a correctly signed request and names tamper reasons") {
    val hdrs = docHeaders.toMap + ("authorization" -> SigV4.authorization(docCreds,
      "us-east-1", "iam", "GET", "/", docQuery, docHeaders, SigV4.emptyPayloadHash, "20150830T123600Z"))
    def run(h: Map[String, String], q: String = "Action=ListUsers&Version=2010-05-08") =
      SigV4.verify(ak => Option.when(ak == "AKIDEXAMPLE")(docCreds.secretKey),
        "GET", "/", q, h, SigV4.emptyPayloadHash)
    assert(run(hdrs).isEmpty)
    // the server re-sorts the raw query, so client-side ordering is free
    assert(run(hdrs, "Version=2010-05-08&Action=ListUsers").isEmpty)
    assert(run(hdrs, "Action=ListUsers&Version=2010-05-09").exists(_.contains("mismatch")))
    assert(run(hdrs + ("x-amz-date" -> "20150830T123601Z")).exists(_.contains("mismatch")))
    assert(run(hdrs - "authorization").contains("missing Authorization"))
  }

  // --- S3 over MiniS3 ------------------------------------------------
  private def withS3[T](f: (S3.MiniS3, S3.Client) => T): T = {
    val srv = new S3.MiniS3().start()
    val c = new S3.Client(srv.endpoint)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("S3 put/get/head/delete round-trip with content-type and user metadata") {
    withS3 { (_, c) =>
      c.put("data", "a/b/doc.json", "{\"x\":1}".getBytes(UTF_8), "application/json",
        meta = Seq("origin" -> "unit"))
      val o = c.get("data", "a/b/doc.json").get
      assert(new String(o.bytes, UTF_8) == "{\"x\":1}")
      assert(o.contentType == "application/json")
      assert(o.meta.get("origin").contains("unit"))
      assert(o.lastModified > 0)
      assert(c.exists("data", "a/b/doc.json"))
      assert(c.get("data", "absent").isEmpty && !c.exists("data", "absent"))
      c.delete("data", "a/b/doc.json")
      assert(c.get("data", "a/b/doc.json").isEmpty)
    }
  }

  test("ListObjectsV2 paginates with continuation tokens and honors prefix") {
    withS3 { (_, c) =>
      (1 to 23).foreach(i => c.put("data", f"logs/part-$i%03d", s"v$i".getBytes(UTF_8)))
      c.put("data", "other/x", "y".getBytes(UTF_8))
      val listed = c.list("data", "logs/", pageSize = 7) // forces 4 pages
      assert(listed.map(_.key) == (1 to 23).map(i => f"logs/part-$i%03d"))
      assert(listed.forall(o => o.size > 0 && o.lastModified > 0))
      assert(c.list("data", "other/").map(_.key) == Seq("other/x"))
      assert(c.list("data").size == 24)
    }
  }

  test("multipart upload concatenates parts in part-number order") {
    withS3 { (_, c) =>
      val parts = Seq("alpha-", "beta-", "gamma").map(_.getBytes(UTF_8))
      c.multipartPut("data", "big/obj.bin", parts)
      assert(new String(c.get("data", "big/obj.bin").get.bytes, UTF_8) == "alpha-beta-gamma")
    }
  }

  test("requests signed with the wrong secret are rejected 403 SignatureDoesNotMatch") {
    val srv = new S3.MiniS3().start()
    val bad = new S3.Client(srv.endpoint, SigV4.Credentials("AKIDEXAMPLE", "not-the-secret"))
    try {
      val e = intercept[IllegalArgumentException](bad.put("data", "k", "v".getBytes(UTF_8)))
      assert(e.getMessage.contains("403"))
    } finally { bad.close(); srv.stop() }
  }

  test("unknown access key is rejected") {
    val srv = new S3.MiniS3().start()
    val bad = new S3.Client(srv.endpoint, SigV4.Credentials("AKIDOTHER", "whatever"))
    try {
      val e = intercept[IllegalArgumentException](bad.put("data", "k", "v".getBytes(UTF_8)))
      assert(e.getMessage.contains("403"))
    } finally { bad.close(); srv.stop() }
  }

  test("S3 cache backend: get/set/add/delete with prefix namespacing") {
    withS3 { (srv, _) =>
      val cache = new S3.Cache(srv.endpoint, "cachebkt", prefix = "ns_")
      try {
        assert(cache.get("k").isEmpty)
        cache.set("k", "v1".getBytes(UTF_8))
        assert(new String(cache.get("k").get, UTF_8) == "v1")
        assert(!cache.add("k", "v2".getBytes(UTF_8)), "add on existing key fails")
        assert(cache.add("k2", "v2".getBytes(UTF_8)))
        cache.delete("k")
        assert(cache.get("k").isEmpty)
        assert(srv.objectCount("cachebkt") == 1) // only ns_k2 remains
      } finally cache.close()
    }
  }

  test("keys with spaces and unicode survive the signed path encoding") {
    withS3 { (_, c) =>
      val key = "dir with space/fähre+x.txt"
      c.put("data", key, "payload".getBytes(UTF_8))
      assert(new String(c.get("data", key).get.bytes, UTF_8) == "payload")
      assert(c.list("data", "dir with space/").map(_.key) == Seq(key))
    }
  }
}
