package graft.conn

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.mutable.ArrayBuffer

import graft.conn.Aws.{AwsHttp, Json, MiniAwsService, SigV4}

/** Amazon SNS (impl/aws/output_sns.go) over the PUBLIC SNS Query
  * protocol: form-encoded `Action=Publish` with indexed
  * `MessageAttributes.entry.N.*` members and an XML response,
  * SigV4-signed (service "sns") and verified per request.
  *
  * Fan-out follows the canonical SNS→SQS pattern: a subscription is a
  * callback that receives the documented JSON notification envelope
  * ({"Type":"Notification","MessageId",…,"Message","MessageAttributes"})
  * — the gate query subscribes REAL SQS queues through the real SQS
  * client, so one Publish lands in every subscribed queue exactly as
  * the composed services behave.
  */
object Sns {

  // ------------------------------------------------------------- fixture
  final class MiniSns(creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("sns", creds) {
    // topicArn -> subscriber callbacks fed the notification-envelope JSON
    private val topics = new CTrieMap[String, ArrayBuffer[String => Unit]]()
    private val seq = new AtomicLong(0)

    def topicArn(name: String): String = s"arn:aws:sns:${Aws.testRegion}:123456789012:$name"
    def createTopicDirect(name: String): String = {
      topics.putIfAbsent(topicArn(name), new ArrayBuffer[String => Unit]()); topicArn(name)
    }
    /** subscribe a consumer of the notification envelope (e.g. an SQS send) */
    def subscribe(arn: String, deliver: String => Unit): Unit =
      topics(arn).synchronized { topics(arn) += deliver }

    private def parseForm(body: Array[Byte]): Map[String, String] =
      new String(body, UTF_8).split('&').filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (URLDecoder.decode(kv, "UTF-8"), "")
        else (URLDecoder.decode(kv.substring(0, i), "UTF-8"), URLDecoder.decode(kv.substring(i + 1), "UTF-8"))
      }.toMap

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val form = parseForm(body)
      form.getOrElse("Action", "") match {
        case "CreateTopic" =>
          val arn = createTopicDirect(form("Name"))
          (200, Seq("Content-Type" -> "text/xml"),
            s"<CreateTopicResponse><CreateTopicResult><TopicArn>$arn</TopicArn></CreateTopicResult></CreateTopicResponse>".getBytes(UTF_8))

        case "Publish" =>
          val arn = form.getOrElse("TopicArn", "")
          topics.get(arn) match {
            case Some(subs) =>
              // indexed members: MessageAttributes.entry.N.Name / .Value.StringValue
              val attrs = Iterator.from(1).map { i =>
                form.get(s"MessageAttributes.entry.$i.Name").map(
                  _ -> form.getOrElse(s"MessageAttributes.entry.$i.Value.StringValue", ""))
              }.takeWhile(_.isDefined).flatten.toMap
              val id = java.util.UUID.nameUUIDFromBytes(
                s"sns-${seq.incrementAndGet()}".getBytes(UTF_8)).toString
              // the documented SNS→SQS notification envelope
              val envelope = Json.render(Json.obj(
                "Type" -> "Notification", "MessageId" -> id, "TopicArn" -> arn,
                "Message" -> form.getOrElse("Message", ""),
                "Timestamp" -> java.time.Instant.now().toString,
                "MessageAttributes" -> scala.collection.immutable.VectorMap(attrs.toSeq.map {
                  case (k, v) => k -> (Json.obj("Type" -> "String", "Value" -> v): Any) }: _*)))
              subs.synchronized(subs.toVector).foreach(_(envelope))
              (200, Seq("Content-Type" -> "text/xml"),
                s"<PublishResponse><PublishResult><MessageId>$id</MessageId></PublishResult></PublishResponse>".getBytes(UTF_8))
            case None =>
              (404, Seq("Content-Type" -> "text/xml"),
                "<ErrorResponse><Error><Code>NotFound</Code></Error></ErrorResponse>".getBytes(UTF_8))
          }

        case other =>
          (400, Seq("Content-Type" -> "text/xml"),
            s"<ErrorResponse><Error><Code>InvalidAction</Code><Message>$other</Message></Error></ErrorResponse>".getBytes(UTF_8))
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "sns", creds)

    private def call(params: Seq[(String, String)]): String = {
      val body = params.map { case (k, v) =>
        s"${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
      }.mkString("&")
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-www-form-urlencoded"),
        body = body.getBytes(UTF_8))
      require(r.status == 200, s"${params.headOption.map(_._2).getOrElse("?")}: ${r.status} ${r.bodyStr}")
      r.bodyStr
    }

    def createTopic(name: String): String =
      (scala.xml.XML.loadString(call(Seq("Action" -> "CreateTopic", "Name" -> name))) \\ "TopicArn").text

    def publish(topicArn: String, message: String, attrs: Map[String, String] = Map.empty): String = {
      val attrParams = attrs.toSeq.zipWithIndex.flatMap { case ((k, v), i) => Seq(
        s"MessageAttributes.entry.${i + 1}.Name" -> k,
        s"MessageAttributes.entry.${i + 1}.Value.DataType" -> "String",
        s"MessageAttributes.entry.${i + 1}.Value.StringValue" -> v)
      }
      (scala.xml.XML.loadString(call(Seq("Action" -> "Publish", "TopicArn" -> topicArn,
        "Message" -> message) ++ attrParams)) \\ "MessageId").text
    }
    override def close(): Unit = aws.close()
  }
}

/** Amazon Kinesis Data Firehose (impl/aws/output_kinesis_firehose.go)
  * over the PUBLIC Firehose JSON protocol: PutRecordBatch of ≤500
  * base64 records (x-amz-json-1.1, target Firehose_20150804.*),
  * SigV4-signed. The fixture implements the documented S3-destination
  * delivery: records buffer and flush as concatenated objects under
  * `prefix/`, written through the REAL S3 client against a MiniS3 — the
  * composed delivery path a production stream runs.
  */
object Firehose {

  // ------------------------------------------------------------- fixture
  /** delivery stream -> buffered records; flush to S3 when `bufferCount`
    * accumulate (plays the documented BufferingHints) or on flushAll() */
  final class MiniFirehose(s3Endpoint: String, bucket: String, prefix: String,
                           bufferCount: Int = 500,
                           creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("firehose", creds) {
    private val streams = new CTrieMap[String, ArrayBuffer[Array[Byte]]]()
    private val flushSeq = new AtomicLong(0)

    def createStreamDirect(name: String): Unit = streams.putIfAbsent(name, new ArrayBuffer[Array[Byte]]())

    private def flushLocked(name: String, buf: ArrayBuffer[Array[Byte]]): Unit =
      if (buf.nonEmpty) {
        val joined = buf.foldLeft(Array.emptyByteArray)(_ ++ _)
        buf.clear()
        val c = new S3.Client(s3Endpoint)
        try c.put(bucket, f"$prefix/${flushSeq.incrementAndGet()}%06d.batch", joined)
        finally c.close()
      }

    def flushAll(): Unit = streams.foreach { case (name, buf) => buf.synchronized(flushLocked(name, buf)) }

    private def ok(body: scala.collection.immutable.VectorMap[String, Any]) =
      (200, Seq("Content-Type" -> "application/x-amz-json-1.1"), Json.render(body).getBytes(UTF_8))

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val target = headers.getOrElse("x-amz-target", "")
      val req = Json.asObj(Json.parse(new String(body, UTF_8)))
      target.stripPrefix("Firehose_20150804.") match {
        case "PutRecordBatch" =>
          streams.get(Json.str(req, "DeliveryStreamName")) match {
            case Some(buf) =>
              val entries = Json.asArr(req("Records")).map(Json.asObj)
              if (entries.size > 500)
                (400, Seq("Content-Type" -> "application/x-amz-json-1.1"),
                  Json.render(Json.obj("__type" -> "ValidationException",
                    "message" -> s"${entries.size} > 500")).getBytes(UTF_8))
              else {
                buf.synchronized {
                  entries.foreach(e => buf += java.util.Base64.getDecoder.decode(Json.str(e, "Data")))
                  if (buf.size >= bufferCount) flushLocked(Json.str(req, "DeliveryStreamName"), buf)
                }
                ok(Json.obj("FailedPutCount" -> 0L,
                  "RequestResponses" -> entries.map(_ => Json.obj("RecordId" -> java.util.UUID.randomUUID().toString): Any)))
              }
            case None =>
              (400, Seq("Content-Type" -> "application/x-amz-json-1.1"),
                Json.render(Json.obj("__type" -> "ResourceNotFoundException",
                  "message" -> Json.str(req, "DeliveryStreamName"))).getBytes(UTF_8))
          }
        case other =>
          (400, Nil, Json.render(Json.obj("__type" -> "InvalidAction", "message" -> other)).getBytes(UTF_8))
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "firehose", creds)

    /** records are delivered verbatim — the reference appends the
      * newline delimiter itself before handing bytes to firehose */
    def putRecordBatch(stream: String, records: Seq[Array[Byte]]): Int = {
      require(records.size <= 500, s"PutRecordBatch limit is 500, got ${records.size}")
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> "Firehose_20150804.PutRecordBatch"),
        body = Json.render(Json.obj("DeliveryStreamName" -> stream,
          "Records" -> records.toVector.map(d =>
            Json.obj("Data" -> java.util.Base64.getEncoder.encodeToString(d)): Any))).getBytes(UTF_8))
      require(r.status == 200, s"PutRecordBatch: ${r.status} ${r.bodyStr}")
      Json.long(Json.asObj(Json.parse(r.bodyStr)), "FailedPutCount").toInt
    }
    override def close(): Unit = aws.close()
  }
}
