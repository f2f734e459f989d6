package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Azure
import org.scalatest.funsuite.AnyFunSuite

/** Azure Storage SharedKey auth + Blob/Queue REST surfaces over
  * MiniAzure: canonicalized string-to-sign verified on every request,
  * block-blob round-trips, paged listing, queue visibility leases with
  * DequeueCount and pop-receipt rotation. */
class AzureSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withAzure[T](f: (Azure.MiniAzure, Azure.BlobClient, Azure.QueueClient) => T): T = {
    val srv = new Azure.MiniAzure().start()
    val bc = new Azure.BlobClient(srv.endpoint)
    val qc = new Azure.QueueClient(srv.endpoint)
    try f(srv, bc, qc) finally { bc.close(); qc.close(); srv.stop() }
  }

  test("SharedKey string-to-sign shape: standard headers, sorted x-ms-*, canonical resource with query") {
    val sts = Azure.SharedKey.stringToSign("PUT", "/c/blob.txt",
      Seq("restype" -> "container", "comp" -> "list"),
      Map("x-ms-date" -> "Thu, 14 Aug 2026 05:00:00 GMT", "x-ms-version" -> "2021-08-06",
        "x-ms-blob-type" -> "BlockBlob", "content-type" -> "text/plain"),
      contentLength = 11, account = "devaccount")
    val lines = sts.split("\n", -1)
    assert(lines(0) == "PUT")
    assert(lines(3) == "11", "Content-Length position")
    assert(lines(5) == "text/plain", "Content-Type position")
    assert(lines(6) == "", "Date empty when x-ms-date is used")
    // x-ms-* sorted lexicographically, then /account/path, then sorted query
    assert(sts.contains("x-ms-blob-type:BlockBlob\nx-ms-date:Thu, 14 Aug 2026 05:00:00 GMT\nx-ms-version:2021-08-06\n"))
    assert(sts.endsWith("/devaccount/c/blob.txt\ncomp:list\nrestype:container"))
    // zero-length body signs Content-Length as the EMPTY string (2015-02-21+ rule)
    val sts0 = Azure.SharedKey.stringToSign("GET", "/c", Nil, Map.empty, 0, "devaccount")
    assert(sts0.split("\n", -1)(3) == "")
  }

  test("blob put/get/delete round-trip; wrong account key is 403") {
    withAzure { (srv, bc, _) =>
      bc.createContainer("data")
      bc.put("data", "dir/f one.txt", b("hello azure"), "text/plain")
      assert(bc.get("data", "dir/f one.txt").map(new String(_, UTF_8)).contains("hello azure"))
      assert(bc.delete("data", "dir/f one.txt"))
      assert(bc.get("data", "dir/f one.txt").isEmpty)
      val bad = new Azure.BlobClient(srv.endpoint,
        Azure.Account("devaccount", java.util.Base64.getEncoder.encodeToString(b("wrong-key"))))
      try {
        val e = intercept[IllegalArgumentException](bad.put("data", "x", b("v")))
        assert(e.getMessage.contains("403"))
      } finally bad.close()
    }
  }

  test("blob listing pages through NextMarker and honors prefix") {
    withAzure { (_, bc, _) =>
      bc.createContainer("data")
      (1 to 12).foreach(i => bc.put("data", f"logs/p$i%03d", b(s"v$i")))
      bc.put("data", "other/x", b("y"))
      val listed = bc.list("data", "logs/", pageSize = 5)
      assert(listed.map(_.name) == (1 to 12).map(i => f"logs/p$i%03d"))
      assert(listed.forall(_.size > 0))
      assert(bc.list("data").size == 13)
    }
  }

  test("queue enqueue/dequeue/delete with base64 bodies and visibility redelivery") {
    withAzure { (_, _, qc) =>
      qc.createQueue("jobs")
      qc.enqueue("jobs", b("task-1"))
      val first = qc.dequeue("jobs", visibilitySec = 1)
      assert(first.size == 1)
      assert(new String(qc.decodeBody(first.head), UTF_8) == "task-1")
      assert(first.head.dequeueCount == 1)
      assert(qc.dequeue("jobs").isEmpty, "leased message invisible")
      Thread.sleep(1100)
      val again = qc.dequeue("jobs", visibilitySec = 30)
      assert(again.size == 1 && again.head.dequeueCount == 2)
      assert(again.head.popReceipt != first.head.popReceipt, "pop receipt rotates")
      // stale pop receipt cannot delete
      val e = intercept[IllegalArgumentException](qc.delete("jobs", first.head))
      assert(e.getMessage.contains("PopReceiptMismatch"))
      qc.delete("jobs", again.head)
      assert(qc.dequeue("jobs").isEmpty)
    }
  }

  test("enqueue with initial visibility delay holds the message back") {
    withAzure { (_, _, qc) =>
      qc.createQueue("jobs")
      qc.enqueue("jobs", b("late"), visibilitySec = 1)
      assert(qc.dequeue("jobs").isEmpty)
      Thread.sleep(1100)
      assert(qc.dequeue("jobs").size == 1)
    }
  }

  test("binary queue bodies survive; unknown queue is 404") {
    withAzure { (_, _, qc) =>
      qc.createQueue("bin")
      val data = Array.tabulate[Byte](128)(_.toByte)
      qc.enqueue("bin", data)
      assert(qc.decodeBody(qc.dequeue("bin").head).toSeq == data.toSeq)
      val e = intercept[IllegalArgumentException](qc.enqueue("absent", b("x")))
      assert(e.getMessage.contains("404"))
    }
  }
}
