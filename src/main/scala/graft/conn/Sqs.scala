package graft.conn

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap

import graft.conn.Aws.{AwsHttp, Json, MiniAwsService, SigV4}

/** Amazon SQS connector over the PUBLIC SQS JSON protocol
  * (Content-Type application/x-amz-json-1.0, X-Amz-Target
  * AmazonSQS.&lt;Action&gt; — the AWS SDK v2 wire format), SigV4-signed and
  * verified per request.
  *
  * Reference surface being re-expressed:
  *  - input_sqs.go — ReceiveMessage loops with wait_time_seconds long
  *    polling, at-least-once delete-after-ack, visibility reset on nack
  *    (:484), metadata sqs_message_id / sqs_receipt_handle /
  *    sqs_approximate_receive_count (:504-506) plus message attributes
  *    flattened to metadata (:512-517).
  *  - output_sqs.go — SendMessageBatch of ≤10 entries with interpolated
  *    delay_seconds / group id and metadata forwarded as message
  *    attributes (:221-275).
  *
  * The visibility-timeout state machine (in-flight until timeout, then
  * redelivered with ApproximateReceiveCount bumped) is implemented by the
  * fixture per the public service contract; the reference wraps
  * aws-sdk-go-v2/service/sqs and has no queue logic to port.
  */
object Sqs {

  final case class SqsMsg(messageId: String, receiptHandle: String, body: String,
                          receiveCount: Long, sentTimestamp: Long,
                          attributes: Map[String, String])

  // ------------------------------------------------------------- fixture
  private final class QMsg(val id: String, val body: String, val attrs: Map[String, String],
                           val sentTs: Long) {
    @volatile var visibleAt: Long = 0L
    @volatile var receiveCount: Int = 0
    @volatile var receiptHandle: String = ""
    @volatile var deleted: Boolean = false
  }

  /** In-memory SQS with the visibility-timeout redelivery contract.
    * `defaultVisibilityMs` plays the queue's VisibilityTimeout attribute
    * (service default 30 s; the fixture defaults shorter so specs can
    * observe redelivery without sleeping for real). */
  final class MiniSqs(defaultVisibilityMs: Long = 400,
                      creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("sqs", creds) {
    private val queues = new CTrieMap[String, java.util.concurrent.ConcurrentLinkedQueue[QMsg]]()
    private val seq = new AtomicLong(0)

    def queueUrl(name: String): String = s"$endpoint/123456789012/$name"
    def createQueueDirect(name: String): String = {
      queues.putIfAbsent(name, new java.util.concurrent.ConcurrentLinkedQueue[QMsg]())
      queueUrl(name)
    }
    /** messages currently neither deleted nor in flight (for specs) */
    def visibleCount(name: String): Int = {
      val now = System.currentTimeMillis()
      queues.get(name).map(_.toArray(Array.empty[QMsg]).count(m => !m.deleted && m.visibleAt <= now)).getOrElse(0)
    }

    private def err(typ: String, msg: String): (Int, Seq[(String, String)], Array[Byte]) =
      (400, Seq("Content-Type" -> "application/x-amz-json-1.0"),
        Json.render(Json.obj("__type" -> s"com.amazonaws.sqs#$typ", "message" -> msg)).getBytes(UTF_8))

    private def ok(body: VectorMap[String, Any]): (Int, Seq[(String, String)], Array[Byte]) =
      (200, Seq("Content-Type" -> "application/x-amz-json-1.0"), Json.render(body).getBytes(UTF_8))

    private def queueOf(m: VectorMap[String, Any]): Option[(String, java.util.concurrent.ConcurrentLinkedQueue[QMsg])] = {
      val name = Json.str(m, "QueueUrl").split('/').last
      queues.get(name).map(name -> _)
    }

    private def md5hex(s: String): String =
      SigV4.hex(java.security.MessageDigest.getInstance("MD5").digest(s.getBytes(UTF_8)))

    private def parseAttrs(m: VectorMap[String, Any]): Map[String, String] =
      m.get("MessageAttributes") match {
        case Some(am: VectorMap[String @unchecked, Any @unchecked]) =>
          am.map { case (k, v) =>
            val vm = Json.asObj(v)
            k -> Json.strOpt(vm, "StringValue").getOrElse(Json.strOpt(vm, "BinaryValue").getOrElse(""))
          }.toMap
        case _ => Map.empty
      }

    private def enqueue(q: java.util.concurrent.ConcurrentLinkedQueue[QMsg],
                        body: String, attrs: Map[String, String], delaySec: Long): String = {
      val id = f"msg-${seq.incrementAndGet()}%08d"
      val m = new QMsg(id, body, attrs, System.currentTimeMillis())
      m.visibleAt = System.currentTimeMillis() + delaySec * 1000
      q.add(m)
      id
    }

    private def renderAttrVals(attrs: Map[String, String]): VectorMap[String, Any] =
      VectorMap(attrs.toSeq.map { case (k, v) =>
        k -> (Json.obj("DataType" -> "String", "StringValue" -> v): Any) }: _*)

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val target = headers.getOrElse("x-amz-target", "")
      val req = Json.asObj(Json.parse(new String(body, UTF_8)))
      target.stripPrefix("AmazonSQS.") match {
        case "CreateQueue" =>
          val name = Json.str(req, "QueueName")
          ok(Json.obj("QueueUrl" -> createQueueDirect(name)))

        case "SendMessage" =>
          queueOf(req) match {
            case Some((_, q)) =>
              val b = Json.str(req, "MessageBody")
              val id = enqueue(q, b, parseAttrs(req), Json.long(req, "DelaySeconds"))
              ok(Json.obj("MessageId" -> id, "MD5OfMessageBody" -> md5hex(b)))
            case None => err("QueueDoesNotExist", Json.str(req, "QueueUrl"))
          }

        case "SendMessageBatch" =>
          queueOf(req) match {
            case Some((_, q)) =>
              val entries = Json.asArr(req("Entries")).map(Json.asObj)
              if (entries.size > 10) err("TooManyEntriesInBatchRequest", s"${entries.size} > 10")
              else ok(Json.obj("Successful" -> entries.map { e =>
                val id = enqueue(q, Json.str(e, "MessageBody"), parseAttrs(e), Json.long(e, "DelaySeconds"))
                Json.obj("Id" -> Json.str(e, "Id"), "MessageId" -> id,
                  "MD5OfMessageBody" -> md5hex(Json.str(e, "MessageBody"))): Any
              }, "Failed" -> Vector.empty[Any]))
            case None => err("QueueDoesNotExist", Json.str(req, "QueueUrl"))
          }

        case "ReceiveMessage" =>
          queueOf(req) match {
            case Some((_, q)) =>
              val max = math.min(10, math.max(1, Json.long(req, "MaxNumberOfMessages", 1))).toInt
              val visMs = req.get("VisibilityTimeout").map(_ => Json.long(req, "VisibilityTimeout") * 1000)
                .getOrElse(defaultVisibilityMs)
              val waitUntil = System.currentTimeMillis() + Json.long(req, "WaitTimeSeconds") * 1000
              var picked = List.empty[QMsg]
              var looped = false
              while (picked.isEmpty && !looped) {
                val now = System.currentTimeMillis()
                picked = q.toArray(Array.empty[QMsg]).iterator
                  .filter(m => !m.deleted && m.visibleAt <= now).take(max).toList
                picked.foreach { m =>
                  m.visibleAt = now + visMs
                  m.receiveCount += 1
                  m.receiptHandle = s"rh-${m.id}-${m.receiveCount}-${seq.incrementAndGet()}"
                }
                if (picked.isEmpty) {
                  if (System.currentTimeMillis() >= waitUntil) looped = true
                  else Thread.sleep(20) // long-poll wait (input_sqs.go wait_time_seconds)
                }
              }
              ok(Json.obj("Messages" -> picked.toVector.map { m =>
                Json.obj("MessageId" -> m.id, "ReceiptHandle" -> m.receiptHandle,
                  "Body" -> m.body, "MD5OfBody" -> md5hex(m.body),
                  "Attributes" -> Json.obj(
                    "ApproximateReceiveCount" -> m.receiveCount.toString,
                    "SentTimestamp" -> m.sentTs.toString),
                  "MessageAttributes" -> renderAttrVals(m.attrs)): Any
              }))
            case None => err("QueueDoesNotExist", Json.str(req, "QueueUrl"))
          }

        case "DeleteMessage" | "ChangeMessageVisibility" =>
          queueOf(req) match {
            case Some((_, q)) =>
              val rh = Json.str(req, "ReceiptHandle")
              q.toArray(Array.empty[QMsg]).find(m => m.receiptHandle == rh && !m.deleted) match {
                case Some(m) if target.endsWith("DeleteMessage") =>
                  m.deleted = true; ok(Json.obj())
                case Some(m) => // ChangeMessageVisibility (input_sqs.go:484 nack reset)
                  m.visibleAt = System.currentTimeMillis() + Json.long(req, "VisibilityTimeout") * 1000
                  ok(Json.obj())
                case None => err("ReceiptHandleIsInvalid", rh)
              }
            case None => err("QueueDoesNotExist", Json.str(req, "QueueUrl"))
          }

        case "DeleteMessageBatch" =>
          queueOf(req) match {
            case Some((_, q)) =>
              val entries = Json.asArr(req("Entries")).map(Json.asObj)
              val all = q.toArray(Array.empty[QMsg])
              val (good, bad) = entries.partition { e =>
                all.find(m => m.receiptHandle == Json.str(e, "ReceiptHandle") && !m.deleted) match {
                  case Some(m) => m.deleted = true; true
                  case None => false
                }
              }
              ok(Json.obj(
                "Successful" -> good.map(e => Json.obj("Id" -> Json.str(e, "Id")): Any),
                "Failed" -> bad.map(e => Json.obj("Id" -> Json.str(e, "Id"),
                  "Code" -> "ReceiptHandleIsInvalid", "SenderFault" -> true): Any)))
            case None => err("QueueDoesNotExist", Json.str(req, "QueueUrl"))
          }

        case other => err("InvalidAction", other)
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "sqs", creds)

    private def call(action: String, body: VectorMap[String, Any]): VectorMap[String, Any] = {
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.0",
        "x-amz-target" -> s"AmazonSQS.$action"),
        body = Json.render(body).getBytes(UTF_8))
      require(r.status == 200, s"$action: ${r.status} ${r.bodyStr}")
      Json.asObj(Json.parse(r.bodyStr))
    }

    def createQueue(name: String): String =
      Json.str(call("CreateQueue", Json.obj("QueueName" -> name)), "QueueUrl")

    def send(queueUrl: String, body: String, attrs: Map[String, String] = Map.empty,
             delaySec: Long = 0): String = {
      var m = Json.obj("QueueUrl" -> queueUrl, "MessageBody" -> body)
      if (delaySec > 0) m = m.updated("DelaySeconds", delaySec)
      if (attrs.nonEmpty) m = m.updated("MessageAttributes", VectorMap(attrs.toSeq.map {
        case (k, v) => k -> (Json.obj("DataType" -> "String", "StringValue" -> v): Any) }: _*))
      Json.str(call("SendMessage", m), "MessageId")
    }

    /** ≤10 entries per call — the service limit output_sqs.go chunks to */
    def sendBatch(queueUrl: String, msgs: Seq[(String, Map[String, String])]): Seq[String] = {
      require(msgs.size <= 10, s"SendMessageBatch limit is 10, got ${msgs.size}")
      val resp = call("SendMessageBatch", Json.obj("QueueUrl" -> queueUrl,
        "Entries" -> msgs.zipWithIndex.toVector.map { case ((b, attrs), i) =>
          var e = Json.obj("Id" -> s"e$i", "MessageBody" -> b)
          if (attrs.nonEmpty) e = e.updated("MessageAttributes", VectorMap(attrs.toSeq.map {
            case (k, v) => k -> (Json.obj("DataType" -> "String", "StringValue" -> v): Any) }: _*))
          e: Any
        }))
      Json.asArr(resp("Successful")).map(e => Json.str(Json.asObj(e), "MessageId"))
    }

    def receive(queueUrl: String, max: Int = 10, visibilityTimeoutSec: Option[Long] = None,
                waitTimeSec: Long = 0): Seq[SqsMsg] = {
      var m = Json.obj("QueueUrl" -> queueUrl, "MaxNumberOfMessages" -> max.toLong,
        "AttributeNames" -> Vector[Any]("All"), "MessageAttributeNames" -> Vector[Any]("All"))
      visibilityTimeoutSec.foreach(v => m = m.updated("VisibilityTimeout", v))
      if (waitTimeSec > 0) m = m.updated("WaitTimeSeconds", waitTimeSec)
      val resp = call("ReceiveMessage", m)
      resp.get("Messages") match {
        case Some(arr: Vector[Any @unchecked]) => arr.map { v =>
          val mm = Json.asObj(v)
          val sysAttrs = mm.get("Attributes").map(Json.asObj).getOrElse(VectorMap.empty[String, Any])
          val msgAttrs = mm.get("MessageAttributes").map(Json.asObj).getOrElse(VectorMap.empty[String, Any])
          SqsMsg(Json.str(mm, "MessageId"), Json.str(mm, "ReceiptHandle"), Json.str(mm, "Body"),
            Json.strOpt(sysAttrs, "ApproximateReceiveCount").map(_.toLong).getOrElse(0L),
            Json.strOpt(sysAttrs, "SentTimestamp").map(_.toLong).getOrElse(0L),
            msgAttrs.map { case (k, av) => k -> Json.str(Json.asObj(av), "StringValue") }.toMap)
        }
        case _ => Nil
      }
    }

    def delete(queueUrl: String, receiptHandle: String): Unit = {
      call("DeleteMessage", Json.obj("QueueUrl" -> queueUrl, "ReceiptHandle" -> receiptHandle)); ()
    }

    def deleteBatch(queueUrl: String, receiptHandles: Seq[String]): Int = {
      if (receiptHandles.isEmpty) return 0
      val resp = call("DeleteMessageBatch", Json.obj("QueueUrl" -> queueUrl,
        "Entries" -> receiptHandles.zipWithIndex.toVector.map { case (rh, i) =>
          Json.obj("Id" -> s"d$i", "ReceiptHandle" -> rh): Any }))
      Json.asArr(resp("Successful")).size
    }

    /** visibility reset — the input's nack path (input_sqs.go:484) */
    def changeVisibility(queueUrl: String, receiptHandle: String, timeoutSec: Long): Unit = {
      call("ChangeMessageVisibility", Json.obj("QueueUrl" -> queueUrl,
        "ReceiptHandle" -> receiptHandle, "VisibilityTimeout" -> timeoutSec)); ()
    }

    override def close(): Unit = aws.close()
  }
}
