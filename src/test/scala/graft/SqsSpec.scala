package graft

import graft.conn.{Aws, Sqs}
import graft.conn.Aws.SigV4
import org.scalatest.funsuite.AnyFunSuite

/** SQS JSON protocol over MiniSqs: the visibility-timeout state machine
  * (in-flight → timeout → redelivery with ApproximateReceiveCount bumped),
  * receipt-handle rotation, batch limits, delay and long-poll — the
  * service contract input_sqs.go / output_sqs.go program against. */
class SqsSpec extends AnyFunSuite {

  private def withSqs[T](visMs: Long = 400)(f: (Sqs.MiniSqs, Sqs.Client, String) => T): T = {
    val srv = new Sqs.MiniSqs(defaultVisibilityMs = visMs).start()
    val c = new Sqs.Client(srv.endpoint)
    try f(srv, c, c.createQueue("jobs")) finally { c.close(); srv.stop() }
  }

  test("send/receive/delete round-trip with message attributes and sent timestamp") {
    withSqs() { (srv, c, url) =>
      c.send(url, "payload-1", attrs = Map("kind" -> "evt", "src" -> "unit"))
      val got = c.receive(url)
      assert(got.size == 1)
      val m = got.head
      assert(m.body == "payload-1")
      assert(m.receiveCount == 1)
      assert(m.sentTimestamp > 0)
      assert(m.attributes == Map("kind" -> "evt", "src" -> "unit"))
      c.delete(url, m.receiptHandle)
      assert(c.receive(url).isEmpty)
      assert(srv.visibleCount("jobs") == 0)
    }
  }

  test("visibility timeout: in-flight messages are invisible, then redelivered with count bumped") {
    withSqs(visMs = 300) { (_, c, url) =>
      c.send(url, "m1")
      val first = c.receive(url)
      assert(first.size == 1 && first.head.receiveCount == 1)
      assert(c.receive(url).isEmpty, "in-flight message must not be redelivered early")
      Thread.sleep(400)
      val again = c.receive(url)
      assert(again.size == 1)
      assert(again.head.receiveCount == 2, "ApproximateReceiveCount bumps on redelivery")
      assert(again.head.receiptHandle != first.head.receiptHandle, "receipt handle rotates")
      // the stale receipt can no longer delete (at-least-once contract)
      val e = intercept[IllegalArgumentException](c.delete(url, first.head.receiptHandle))
      assert(e.getMessage.contains("ReceiptHandleIsInvalid"))
      c.delete(url, again.head.receiptHandle)
    }
  }

  test("ChangeMessageVisibility 0 nacks a message back to visible immediately (input_sqs.go:484)") {
    withSqs(visMs = 60000) { (_, c, url) =>
      c.send(url, "m1")
      val m = c.receive(url).head
      assert(c.receive(url).isEmpty, "long visibility holds it in flight")
      c.changeVisibility(url, m.receiptHandle, 0)
      val back = c.receive(url)
      assert(back.size == 1 && back.head.receiveCount == 2)
    }
  }

  test("DelaySeconds holds a message invisible until the delay elapses") {
    withSqs() { (_, c, url) =>
      c.send(url, "late", delaySec = 1)
      assert(c.receive(url).isEmpty)
      Thread.sleep(1100)
      assert(c.receive(url).map(_.body) == Seq("late"))
    }
  }

  test("SendMessageBatch caps at 10 entries; DeleteMessageBatch reports stale handles as Failed") {
    withSqs() { (_, c, url) =>
      assert(c.sendBatch(url, (1 to 10).map(i => (s"b$i", Map.empty[String, String]))).size == 10)
      intercept[IllegalArgumentException] {
        c.sendBatch(url, (1 to 11).map(i => (s"b$i", Map.empty[String, String])))
      }
      val got = c.receive(url, max = 10)
      assert(got.size == 10)
      val deleted = c.deleteBatch(url, got.map(_.receiptHandle) :+ "rh-bogus")
      assert(deleted == 10, "the 10 live handles succeed, the bogus one lands in Failed")
    }
  }

  test("long-poll wait returns a message that arrives mid-wait") {
    withSqs() { (_, c, url) =>
      val t = new Thread(() => { Thread.sleep(200); val p = new Sqs.Client(
        url.split('/').dropRight(2).mkString("/")); try p.send(url, "poked") finally p.close() })
      t.setDaemon(true); t.start()
      val t0 = System.currentTimeMillis()
      val got = c.receive(url, waitTimeSec = 3)
      assert(got.map(_.body) == Seq("poked"))
      assert(System.currentTimeMillis() - t0 < 3000, "returned as soon as the message arrived")
      t.join()
    }
  }

  test("unknown queue and wrong-secret requests are rejected") {
    withSqs() { (srv, c, _) =>
      val e = intercept[IllegalArgumentException](c.send(s"${srv.endpoint}/123456789012/nope", "x"))
      assert(e.getMessage.contains("QueueDoesNotExist"))
      val bad = new Sqs.Client(srv.endpoint, SigV4.Credentials(Aws.testCreds.accessKey, "wrong"))
      try {
        val e2 = intercept[IllegalArgumentException](bad.send(srv.queueUrl("jobs"), "x"))
        assert(e2.getMessage.contains("403"))
      } finally bad.close()
    }
  }
}
