package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.{Aws, Firehose, S3, Sns, Sqs}
import graft.conn.Aws.Json
import org.scalatest.funsuite.AnyFunSuite

/** SNS Query protocol (Publish + indexed message attributes + the
  * SNS→SQS notification envelope) and Firehose PutRecordBatch with the
  * documented S3-destination delivery, both composed against the other
  * real fixtures. */
class SnsFirehoseSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  test("SNS publish delivers the notification envelope to every subscriber with attributes") {
    val srv = new Sns.MiniSns().start()
    val c = new Sns.Client(srv.endpoint)
    try {
      val arn = c.createTopic("alerts")
      assert(arn.endsWith(":alerts"))
      val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      srv.subscribe(arn, got.add(_))
      srv.subscribe(arn, got.add(_))
      val id = c.publish(arn, "disk full", attrs = Map("sev" -> "crit", "host" -> "h1"))
      assert(id.nonEmpty)
      assert(got.size == 2, "both subscribers fan out")
      val env = Json.asObj(Json.parse(got.peek()))
      assert(Json.str(env, "Type") == "Notification")
      assert(Json.str(env, "Message") == "disk full")
      assert(Json.str(env, "TopicArn") == arn)
      val attrs = Json.asObj(env("MessageAttributes"))
      assert(Json.str(Json.asObj(attrs("sev")), "Value") == "crit")
    } finally { c.close(); srv.stop() }
  }

  test("SNS to real SQS queues: one publish lands in every subscribed queue") {
    val sns = new Sns.MiniSns().start()
    val sqs = new Sqs.MiniSqs(defaultVisibilityMs = 30000).start()
    val snsC = new Sns.Client(sns.endpoint)
    val sqsC = new Sqs.Client(sqs.endpoint)
    try {
      val arn = snsC.createTopic("orders")
      val urls = Seq("q1", "q2").map(sqsC.createQueue)
      urls.foreach { url =>
        sns.subscribe(arn, envelope => {
          val c = new Sqs.Client(sqs.endpoint)
          try c.send(url, envelope) finally c.close()
        })
      }
      snsC.publish(arn, "order-42", attrs = Map("k" -> "v"))
      urls.foreach { url =>
        val msgs = sqsC.receive(url)
        assert(msgs.size == 1, s"$url got the fan-out copy")
        val env = Json.asObj(Json.parse(msgs.head.body))
        assert(Json.str(env, "Message") == "order-42")
      }
    } finally { snsC.close(); sqsC.close(); sns.stop(); sqs.stop() }
  }

  test("SNS unknown topic is 404; unknown action is 400") {
    val srv = new Sns.MiniSns().start()
    val c = new Sns.Client(srv.endpoint)
    try {
      val e = intercept[IllegalArgumentException](c.publish(srv.topicArn("absent"), "x"))
      assert(e.getMessage.contains("404"))
    } finally { c.close(); srv.stop() }
  }

  test("Firehose buffers records and flushes concatenated objects to S3 at the buffer count") {
    val s3 = new S3.MiniS3().start()
    val fh = new Firehose.MiniFirehose(s3.endpoint, "delivery", "fh", bufferCount = 5).start()
    fh.createStreamDirect("events")
    val c = new Firehose.Client(fh.endpoint)
    val s3c = new S3.Client(s3.endpoint)
    try {
      assert(c.putRecordBatch("events", (1 to 4).map(i => b(s"r$i\n"))) == 0)
      assert(s3c.list("delivery", "fh/").isEmpty, "below buffer count, nothing flushed")
      c.putRecordBatch("events", Seq(b("r5\n"))) // hits bufferCount = 5
      val objs = s3c.list("delivery", "fh/")
      assert(objs.size == 1)
      assert(new String(s3c.get("delivery", objs.head.key).get.bytes, UTF_8) == "r1\nr2\nr3\nr4\nr5\n")
      c.putRecordBatch("events", Seq(b("r6\n")))
      fh.flushAll() // drains the partial buffer
      assert(s3c.list("delivery", "fh/").size == 2)
    } finally { c.close(); s3c.close(); fh.stop(); s3.stop() }
  }

  test("Firehose rejects >500 records and unknown streams") {
    val s3 = new S3.MiniS3().start()
    val fh = new Firehose.MiniFirehose(s3.endpoint, "delivery", "fh").start()
    fh.createStreamDirect("events")
    val c = new Firehose.Client(fh.endpoint)
    try {
      intercept[IllegalArgumentException](c.putRecordBatch("events", (1 to 501).map(_ => Array[Byte](1))))
      val e = intercept[IllegalArgumentException](c.putRecordBatch("absent", Seq(Array[Byte](1))))
      assert(e.getMessage.contains("ResourceNotFoundException"))
    } finally { c.close(); fh.stop(); s3.stop() }
  }
}
