package graft.conn

import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.{TrieMap => CTrieMap}

import graft.conn.Aws.{AwsHttp, MiniAwsService, SigV4}

/** Amazon S3 connector family over the PUBLIC S3 REST API (path-style):
  * ListObjectsV2 / GetObject / PutObject / HeadObject / DeleteObject and
  * the multipart-upload trio, all SigV4-signed and verified by the
  * fixture on every request.
  *
  * Reference surface being re-expressed (all of internal/impl/aws/):
  *  - input_s3.go — walk a bucket by prefix, download objects, stamp
  *    s3_key / s3_bucket / s3_last_modified_unix / s3_content_type (+ all
  *    user metadata) on each message (input_s3.go:734-750); optional
  *    delete-after-consume (:186).
  *  - output_s3.go — one PutObject per message at an interpolated path
  *    with content_type and x-amz-meta-* user metadata (:434-439).
  *  - cache_s3.go — the bucket as a KV cache (Get/Set/Add/Delete on keys).
  *  - output_s3_stream.go — large single objects via multipart upload.
  *
  * Spark shape: listing happens ONCE driver-side (exactly like Spark's
  * own file-source listing), then keys are distributed and each task runs
  * its own client — downloads scale with partitions, the driver never
  * touches object bytes. The reference wraps aws-sdk-go-v2; no S3
  * protocol code exists there to port.
  */
object S3 {

  final case class ObjInfo(key: String, size: Long, lastModified: Long)
  final case class Obj(bytes: Array[Byte], contentType: String,
                       meta: Map[String, String], lastModified: Long)

  private val rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)
  private val iso = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").withZone(ZoneOffset.UTC)

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def pctDecode(s: String): String = {
    val sb = new java.io.ByteArrayOutputStream
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        sb.write(Integer.parseInt(s.substring(i + 1, i + 3), 16)); i += 3
      } else { sb.write(c.toInt); i += 1 }
    }
    new String(sb.toByteArray, UTF_8)
  }

  private def parseQuery(q: String): Map[String, String] =
    if (q == null || q.isEmpty) Map.empty
    else q.split('&').toSeq.map { p =>
      val i = p.indexOf('=')
      if (i < 0) (pctDecode(p), "") else (pctDecode(p.substring(0, i)), pctDecode(p.substring(i + 1)))
    }.toMap

  // ------------------------------------------------------------- fixture
  /** In-memory S3 with real SigV4 verification, ListObjectsV2 pagination
    * and multipart uploads. Path-style addressing (the reference's
    * `force_path_style_urls: true` custom-endpoint mode, output_s3.go:317). */
  final class MiniS3(creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("s3", creds) {
    private val objects = new CTrieMap[(String, String), Obj]()
    private val uploads = new CTrieMap[String, (String, String, String, Map[String, String], CTrieMap[Int, Array[Byte]])]()
    private val uploadSeq = new AtomicLong(0)
    /** part sizes of each COMPLETED multipart object, in part order —
      * lets specs pin that flush boundaries land on message boundaries */
    val completedPartSizes = new CTrieMap[(String, String), Seq[Int]]()

    def objectCount(bucket: String): Int = objects.keys.count(_._1 == bucket)
    def pendingUploads: Int = uploads.size
    /** failure injection: the next CompleteMultipartUpload returns 500
      * (upload stays pending) — lets specs pin the close/abort discipline */
    @volatile var failNextComplete: Boolean = false
    def putDirect(bucket: String, key: String, bytes: Array[Byte], contentType: String = "application/octet-stream"): Unit =
      objects.put((bucket, key), Obj(bytes, contentType, Map.empty, System.currentTimeMillis()))

    private def userMeta(headers: Map[String, String]): Map[String, String] =
      headers.collect { case (k, v) if k.startsWith("x-amz-meta-") => k.stripPrefix("x-amz-meta-") -> v }

    private def etag(bytes: Array[Byte]): String =
      "\"" + SigV4.hex(java.security.MessageDigest.getInstance("MD5").digest(bytes)) + "\""

    private def notFound(key: String) =
      (404, Seq("Content-Type" -> "application/xml"),
        s"<Error><Code>NoSuchKey</Code><Key>${xmlEscape(key)}</Key></Error>".getBytes(UTF_8))

    protected def handle(method: String, rawPath: String, rawQuery: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val q = parseQuery(rawQuery)
      val path = pctDecode(rawPath).stripPrefix("/")
      val slash = path.indexOf('/')
      val (bucket, key) = if (slash < 0) (path, "") else (path.substring(0, slash), path.substring(slash + 1))

      (method, key) match {
        // ---- ListObjectsV2: GET /bucket?list-type=2&prefix=&continuation-token=&max-keys=
        case ("GET", "") if q.get("list-type").contains("2") =>
          val prefix = q.getOrElse("prefix", "")
          val after = q.getOrElse("continuation-token", "")
          val maxKeys = q.get("max-keys").map(_.toInt).getOrElse(1000)
          val all = objects.toSeq.collect {
            case ((b, k), o) if b == bucket && k.startsWith(prefix) && k > after => (k, o)
          }.sortBy(_._1)
          val page = all.take(maxKeys)
          val truncated = all.size > maxKeys
          val contents = page.map { case (k, o) =>
            s"<Contents><Key>${xmlEscape(k)}</Key><LastModified>${iso.format(Instant.ofEpochMilli(o.lastModified))}</LastModified><ETag>${xmlEscape(etag(o.bytes))}</ETag><Size>${o.bytes.length}</Size></Contents>"
          }.mkString
          val next = if (truncated) s"<NextContinuationToken>${xmlEscape(page.last._1)}</NextContinuationToken>" else ""
          val xml = s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult><Name>${xmlEscape(bucket)}</Name><Prefix>${xmlEscape(prefix)}</Prefix><KeyCount>${page.size}</KeyCount><MaxKeys>$maxKeys</MaxKeys><IsTruncated>$truncated</IsTruncated>$contents$next</ListBucketResult>"""
          (200, Seq("Content-Type" -> "application/xml"), xml.getBytes(UTF_8))

        // ---- multipart: POST /b/k?uploads  (initiate)
        case ("POST", k) if q.contains("uploads") =>
          val id = s"upload-${uploadSeq.incrementAndGet()}"
          uploads.put(id, (bucket, k, headers.getOrElse("content-type", "application/octet-stream"), userMeta(headers), new CTrieMap[Int, Array[Byte]]()))
          val xml = s"""<?xml version="1.0" encoding="UTF-8"?><InitiateMultipartUploadResult><Bucket>${xmlEscape(bucket)}</Bucket><Key>${xmlEscape(k)}</Key><UploadId>$id</UploadId></InitiateMultipartUploadResult>"""
          (200, Seq("Content-Type" -> "application/xml"), xml.getBytes(UTF_8))

        // ---- multipart: PUT /b/k?partNumber=N&uploadId=U
        case ("PUT", _) if q.contains("uploadId") && q.contains("partNumber") =>
          uploads.get(q("uploadId")) match {
            case Some((_, _, _, _, parts)) =>
              parts.put(q("partNumber").toInt, body)
              (200, Seq("ETag" -> etag(body)), Array.emptyByteArray)
            case None => (404, Nil, "<Error><Code>NoSuchUpload</Code></Error>".getBytes(UTF_8))
          }

        // ---- multipart: POST /b/k?uploadId=U  (complete)
        case ("POST", k) if q.contains("uploadId") =>
          if (failNextComplete) {
            failNextComplete = false
            return (500, Seq("Content-Type" -> "application/xml"),
              "<Error><Code>InternalError</Code></Error>".getBytes(UTF_8))
          }
          uploads.remove(q("uploadId")) match {
            case Some((b, _, ct, meta, parts)) =>
              val ordered = parts.toSeq.sortBy(_._1)
              val joined = ordered.map(_._2).foldLeft(Array.emptyByteArray)(_ ++ _)
              completedPartSizes.put((b, k), ordered.map(_._2.length))
              objects.put((b, k), Obj(joined, ct, meta, System.currentTimeMillis()))
              val xml = s"""<?xml version="1.0" encoding="UTF-8"?><CompleteMultipartUploadResult><Bucket>${xmlEscape(b)}</Bucket><Key>${xmlEscape(k)}</Key><ETag>${xmlEscape(etag(joined))}</ETag></CompleteMultipartUploadResult>"""
              (200, Seq("Content-Type" -> "application/xml"), xml.getBytes(UTF_8))
            case None => (404, Nil, "<Error><Code>NoSuchUpload</Code></Error>".getBytes(UTF_8))
          }

        // ---- multipart abort
        case ("DELETE", _) if q.contains("uploadId") =>
          uploads.remove(q("uploadId")); (204, Nil, Array.emptyByteArray)

        // ---- PutObject
        case ("PUT", k) if k.nonEmpty =>
          val obj = Obj(body, headers.getOrElse("content-type", "application/octet-stream"),
            userMeta(headers), System.currentTimeMillis())
          objects.put((bucket, k), obj)
          (200, Seq("ETag" -> etag(body)), Array.emptyByteArray)

        // ---- Get/HeadObject
        case ("GET" | "HEAD", k) if k.nonEmpty =>
          objects.get((bucket, k)) match {
            case Some(o) =>
              val hs = Seq("Content-Type" -> o.contentType,
                "Last-Modified" -> rfc1123.format(Instant.ofEpochMilli(o.lastModified)),
                "ETag" -> etag(o.bytes)) ++ o.meta.map { case (mk, v) => s"x-amz-meta-$mk" -> v }
              (200, hs, o.bytes)
            case None => notFound(k)
          }

        // ---- DeleteObject
        case ("DELETE", k) if k.nonEmpty =>
          objects.remove((bucket, k)); (204, Nil, Array.emptyByteArray)

        case _ => (400, Nil, "<Error><Code>InvalidRequest</Code></Error>".getBytes(UTF_8))
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "s3", creds)
    private def keyPath(bucket: String, key: String): String =
      s"/${SigV4.uriEncode(bucket, encodeSlash = true)}/${SigV4.uriEncode(key, encodeSlash = false)}"

    def put(bucket: String, key: String, bytes: Array[Byte],
            contentType: String = "application/octet-stream",
            meta: Seq[(String, String)] = Nil): Unit = {
      val r = aws.request("PUT", keyPath(bucket, key),
        extraHeaders = Seq("content-type" -> contentType) ++ meta.map { case (k, v) => s"x-amz-meta-$k" -> v },
        body = bytes)
      require(r.status == 200, s"PutObject $key: ${r.status} ${r.bodyStr}")
    }

    def get(bucket: String, key: String): Option[Obj] = {
      val r = aws.request("GET", keyPath(bucket, key))
      if (r.status == 404) None
      else {
        require(r.status == 200, s"GetObject $key: ${r.status} ${r.bodyStr}")
        val meta = r.headers.collect { case (k, v) if k.startsWith("x-amz-meta-") =>
          k.stripPrefix("x-amz-meta-") -> v }
        val lm = r.header("last-modified")
          .map(s => Instant.from(rfc1123.parse(s)).toEpochMilli).getOrElse(0L)
        Some(Obj(r.body, r.header("content-type").getOrElse(""), meta, lm))
      }
    }

    def exists(bucket: String, key: String): Boolean =
      aws.request("HEAD", keyPath(bucket, key)).status == 200

    def delete(bucket: String, key: String): Unit = {
      val r = aws.request("DELETE", keyPath(bucket, key))
      require(r.status == 204 || r.status == 200, s"DeleteObject $key: ${r.status}")
    }

    /** full paginated ListObjectsV2 walk (input_s3.go staticTargetReader) */
    def list(bucket: String, prefix: String = "", pageSize: Int = 1000): Seq[ObjInfo] = {
      val out = Vector.newBuilder[ObjInfo]
      var token: Option[String] = None
      var more = true
      while (more) {
        val q = Seq("list-type" -> "2", "max-keys" -> pageSize.toString) ++
          (if (prefix.nonEmpty) Seq("prefix" -> prefix) else Nil) ++
          token.map("continuation-token" -> _)
        val r = aws.request("GET", s"/${SigV4.uriEncode(bucket, encodeSlash = true)}", q)
        require(r.status == 200, s"ListObjectsV2: ${r.status} ${r.bodyStr}")
        val xml = scala.xml.XML.loadString(r.bodyStr)
        (xml \ "Contents").foreach { c =>
          out += ObjInfo((c \ "Key").text,
            (c \ "Size").text.toLong,
            Instant.from(DateTimeFormatter.ISO_DATE_TIME.parse((c \ "LastModified").text)).toEpochMilli)
        }
        more = (xml \ "IsTruncated").text == "true"
        token = (xml \ "NextContinuationToken").headOption.map(_.text)
      }
      out.result()
    }

    /** multipart trio, incremental (output_s3_stream_writer.go:127-160):
      * initiate → per-part PUT → complete. Exposed separately so the
      * streaming writer can interleave buffering with uploads. */
    def initiateMultipart(bucket: String, key: String,
                          contentType: String = "application/octet-stream"): String = {
      val init = aws.request("POST", keyPath(bucket, key), Seq("uploads" -> ""),
        Seq("content-type" -> contentType))
      require(init.status == 200, s"InitiateMultipartUpload: ${init.status} ${init.bodyStr}")
      (scala.xml.XML.loadString(init.bodyStr) \ "UploadId").text
    }

    def uploadPart(bucket: String, key: String, uploadId: String,
                   partNumber: Int, body: Array[Byte]): Unit = {
      val r = aws.request("PUT", keyPath(bucket, key),
        Seq("partNumber" -> partNumber.toString, "uploadId" -> uploadId), body = body)
      require(r.status == 200, s"UploadPart $partNumber: ${r.status}")
    }

    def completeMultipart(bucket: String, key: String, uploadId: String): Unit = {
      val done = aws.request("POST", keyPath(bucket, key), Seq("uploadId" -> uploadId),
        body = "<CompleteMultipartUpload/>".getBytes(UTF_8))
      require(done.status == 200, s"CompleteMultipartUpload: ${done.status} ${done.bodyStr}")
    }

    /** multipart upload (output_s3_stream.go: parts ≥5 MiB in prod; the
      * fixture takes any size) */
    def multipartPut(bucket: String, key: String, parts: Seq[Array[Byte]],
                     contentType: String = "application/octet-stream"): Unit = {
      val uploadId = initiateMultipart(bucket, key, contentType)
      parts.zipWithIndex.foreach { case (p, i) => uploadPart(bucket, key, uploadId, i + 1, p) }
      completeMultipart(bucket, key, uploadId)
    }

    def abortMultipart(bucket: String, key: String, uploadId: String): Unit =
      aws.request("DELETE", keyPath(bucket, key), Seq("uploadId" -> uploadId))

    override def close(): Unit = aws.close()
  }

  // ------------------------------------------------------- cache backend
  /** cache_s3.go: the bucket as a KV resource. `add` is head-then-put —
    * the same non-atomic check the reference documents for S3 (no
    * conditional puts in the S3 API it targets). */
  final class Cache(endpoint: String, bucket: String, prefix: String = "",
                    creds: SigV4.Credentials = Aws.testCreds)
      extends graft.operators.CacheBackends.KvBackend {
    private val c = new Client(endpoint, creds)
    def get(key: String): Option[Array[Byte]] = c.get(bucket, prefix + key).map(_.bytes)
    def set(key: String, value: Array[Byte], ttlMs: Long = 0): Unit = c.put(bucket, prefix + key, value)
    def add(key: String, value: Array[Byte], ttlMs: Long = 0): Boolean =
      if (c.exists(bucket, prefix + key)) false else { c.put(bucket, prefix + key, value); true }
    def delete(key: String): Unit = c.delete(bucket, prefix + key)
    override def close(): Unit = c.close()
  }

  // ------------------------------------------------ streaming multipart
  /** One streaming multipart upload (output_s3_stream_writer.go:78-391):
    * messages buffer until `maxBufferBytes` or `maxBufferCount`, each
    * flush is one UploadPart (retried with bounded backoff; the 5 MiB
    * S3 minimum applies to every part but the last — the production
    * threshold the reference enforces; the fixture takes any size, so
    * `minPartBytes` is a constructor knob tests shrink), and close()
    * force-flushes the remainder then CompleteMultipartUpload. A writer
    * that uploaded nothing aborts instead of completing an empty file.
    * Messages never split across parts — a part boundary is always a
    * message boundary (the buffer flushes BETWEEN WriteBytes calls). */
  final class StreamingWriter(client: Client, bucket: String, key: String,
                              maxBufferBytes: Long = 10L * 1024 * 1024,
                              maxBufferCount: Int = 10000,
                              contentType: String = "application/octet-stream",
                              maxRetries: Int = 2,
                              minPartBytes: Long = 5L * 1024 * 1024) {
    private val uploadId = client.initiateMultipart(bucket, key, contentType)
    private val buf = new java.io.ByteArrayOutputStream()
    private var bufCount = 0
    private var partNumber = 0
    private var closed = false
    // Set only once the multipart upload is settled server-side
    // (completed or aborted). abort() keys on this, not `closed`, so a
    // completeMultipart failure inside close() still leaves the upload
    // abortable by the error path instead of pending forever.
    private var settled = false
    var partsUploaded: Int = 0
    var totalMessages: Long = 0L
    var totalBytes: Long = 0L

    def writeBytes(data: Array[Byte]): Unit = {
      require(!closed, "writer is closed")
      buf.write(data)
      bufCount += 1
      totalMessages += 1
      totalBytes += data.length
      // size gate honors the S3 part minimum (flush() in the reference
      // defers sub-5MiB buffers); the count gate flushes regardless,
      // mirroring maxBufferCount precedence
      if ((buf.size >= maxBufferBytes && buf.size >= minPartBytes) || bufCount >= maxBufferCount)
        flush()
    }

    private def flush(): Unit = if (buf.size > 0) {
      partNumber += 1
      val body = buf.toByteArray
      var attempt = 0
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt <= maxRetries) {
        try { client.uploadPart(bucket, key, uploadId, partNumber, body); done = true }
        catch { case e: Exception =>
          lastErr = e; attempt += 1
          if (attempt <= maxRetries) Thread.sleep(math.min(1000L << (attempt - 1), 5000L))
        }
      }
      if (!done) {
        client.abortMultipart(bucket, key, uploadId)
        closed = true
        settled = true
        throw new java.io.IOException(s"failed to upload part $partNumber after retries", lastErr)
      }
      partsUploaded += 1
      buf.reset(); bufCount = 0
    }

    def close(): Unit = if (!closed) {
      closed = true
      if (buf.size > 0) { closed = false; flush(); closed = true }
      if (partsUploaded > 0) client.completeMultipart(bucket, key, uploadId)
      else client.abortMultipart(bucket, key, uploadId) // nothing written
      settled = true
    }

    /** Abort without completing — the error path for sibling-writer
      * failures, mirroring the reference writer's CloseAsync/abort
      * discipline: a pending multipart upload left neither completed
      * nor aborted accrues storage cost on real S3. Best-effort (the
      * task is already failing). */
    def abort(): Unit = if (!settled) {
      closed = true
      settled = true
      try client.abortMultipart(bucket, key, uploadId)
      catch { case _: Exception => () }
    }
  }

  /** aws_s3_stream output (output_s3_stream.go:294-436), Spark-first:
    * `repartition(partitionExpr)` routes every row of one partition
    * value to exactly ONE task, which owns that value's multipart
    * upload and streams parts from the EXECUTOR — the writer map and
    * path-evaluated-once-per-partition contract of writeToPartition,
    * with the shuffle doing what the reference's writersMut does. At
    * 100 TB this is the shape that scales: N files upload concurrently
    * from N tasks, no driver funnel, memory bounded by maxBufferBytes
    * per live writer. */
  def streamOutput(df: org.apache.spark.sql.DataFrame, endpoint: String, bucket: String,
                   partitionExpr: org.apache.spark.sql.Column,
                   partitionKeyOf: org.apache.spark.sql.Row => String,
                   pathOf: org.apache.spark.sql.Row => String,
                   bodyOf: org.apache.spark.sql.Row => Array[Byte],
                   maxBufferBytes: Long = 10L * 1024 * 1024,
                   maxBufferCount: Int = 10000,
                   contentType: String = "application/octet-stream",
                   minPartBytes: Long = 5L * 1024 * 1024): Unit =
    df.repartition(partitionExpr).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.nonEmpty) {
          val c = new Client(endpoint)
          val writers = scala.collection.mutable.LinkedHashMap[String, StreamingWriter]()
          try {
            var ok = false
            try {
              it.foreach { r =>
                // path evaluates once per partition value, on its first
                // message (the partition_by contract)
                val w = writers.getOrElseUpdate(partitionKeyOf(r),
                  new StreamingWriter(c, bucket, pathOf(r), maxBufferBytes, maxBufferCount,
                    contentType, minPartBytes = minPartBytes))
                w.writeBytes(bodyOf(r))
              }
              writers.values.foreach(_.close())
              ok = true
            } finally if (!ok)
              // a writeBytes or an earlier close() threw: abort every
              // writer still open so no multipart upload is left pending
              writers.values.foreach(_.abort())
          } finally c.close()
        }
    }

  // ----------------------------------------------------- spark operators
  /** output_s3.go: one object per message at a computed path; one client
    * per Spark partition. */
  def output(df: org.apache.spark.sql.DataFrame, endpoint: String, bucket: String,
             keyOf: org.apache.spark.sql.Row => String,
             bodyOf: org.apache.spark.sql.Row => Array[Byte],
             contentType: String = "application/octet-stream"): Unit =
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val c = new Client(endpoint)
        try it.foreach(r => c.put(bucket, keyOf(r), bodyOf(r), contentType))
        finally c.close()
      }
    }

  /** input_s3.go static walk: list driver-side (like Spark's own file
    * listing), download executor-side. Returns (s3_key, content-utf8,
    * s3_last_modified_unix, s3_content_type) — the reference's metadata
    * contract (input_s3.go:734-741) as columns. */
  def input(spark: org.apache.spark.sql.SparkSession, endpoint: String, bucket: String,
            prefix: String = "", deleteObjects: Boolean = false)
      : org.apache.spark.sql.Dataset[(String, String, Long, String)] = {
    import spark.implicits._
    val keys = {
      val c = new Client(endpoint)
      try c.list(bucket, prefix).map(_.key) finally c.close()
    }
    spark.createDataset(keys).repartition(math.min(math.max(1, spark.sparkContext.defaultParallelism), math.max(1, keys.size)))
      .mapPartitions { ks =>
        val c = new Client(endpoint)
        val out = ks.map { k =>
          val o = c.get(bucket, k).getOrElse(throw new java.io.FileNotFoundException(k))
          if (deleteObjects) c.delete(bucket, k)
          (k, new String(o.bytes, UTF_8), o.lastModified / 1000, o.contentType)
        }
        new Iterator[(String, String, Long, String)] {
          def hasNext: Boolean = { val h = out.hasNext; if (!h) c.close(); h }
          def next(): (String, String, Long, String) = out.next()
        }
      }
  }
}
