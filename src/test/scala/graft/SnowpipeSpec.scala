package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Gcp, S3, Snowpipe}
import org.scalatest.funsuite.AnyFunSuite

/** Snowpipe REST over an external S3 stage: key-pair JWT auth with the
  * documented fingerprinted issuer, insertFiles loading staged files,
  * idempotent resubmits, insertReport statuses, and the 401 gate. */
class SnowpipeSpec extends AnyFunSuite {

  private val (privPem, pubPem) = Gcp.generateKeyPair()

  private def withPipe[T](f: (S3.MiniS3, Snowpipe.MiniSnowpipe, Snowpipe.Client) => T): T = {
    val s3 = new S3.MiniS3().start()
    val sp = new Snowpipe.MiniSnowpipe("ACC", "LOADER", pubPem, s3.endpoint, "stage").start()
    val c = new Snowpipe.Client(sp.endpoint, "ACC", "LOADER", privPem, pubPem)
    try f(s3, sp, c) finally { c.close(); sp.stop(); s3.stop() }
  }

  test("staged files load through insertFiles; insertReport confirms per file") {
    withPipe { (s3, sp, c) =>
      val s3c = new S3.Client(s3.endpoint)
      try {
        s3c.put("stage", "batch/f1.ndjson", "a\nb\nc\n".getBytes(UTF_8))
        s3c.put("stage", "batch/f2.ndjson", "d\ne\n".getBytes(UTF_8))
      } finally s3c.close()
      c.insertFiles("PIPE1", Seq("batch/f1.ndjson", "batch/f2.ndjson"))
      val report = c.insertReport("PIPE1")
      assert(report.map(r => (r.path, r.status, r.rowsInserted)) == Vector(
        ("batch/f1.ndjson", "LOADED", 3L), ("batch/f2.ndjson", "LOADED", 2L)))
      assert(sp.loadedRows("PIPE1") == 5)
      // resubmits are idempotent per (pipe, path) — no double load
      c.insertFiles("PIPE1", Seq("batch/f1.ndjson"))
      assert(sp.loadedRows("PIPE1") == 5)
      // a missing staged file reports LOAD_FAILED, not an error
      c.insertFiles("PIPE1", Seq("batch/missing.ndjson"))
      assert(c.insertReport("PIPE1").find(_.path == "batch/missing.ndjson")
        .exists(_.status == "LOAD_FAILED"))
    }
  }

  test("the issuer embeds the documented SHA256 public-key fingerprint") {
    val fp = Snowpipe.fingerprint(pubPem)
    assert(fp.startsWith("SHA256:") &&
      java.util.Base64.getDecoder.decode(fp.stripPrefix("SHA256:")).length == 32)
  }

  test("a JWT signed with the wrong key is 401") {
    withPipe { (_, sp, _) =>
      val (otherPriv, otherPub) = Gcp.generateKeyPair()
      val bad = new Snowpipe.Client(sp.endpoint, "ACC", "LOADER", otherPriv, otherPub)
      try {
        val e = intercept[IllegalArgumentException](bad.insertReport("PIPE1"))
        assert(e.getMessage.contains("401"))
      } finally bad.close()
    }
  }
}
