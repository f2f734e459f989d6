package graft.conn

import java.net.{InetSocketAddress, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.collection.immutable.VectorMap

/** AWS protocol plumbing shared by the S3 / SQS / Kinesis / DynamoDB /
  * Lambda connectors: Signature Version 4 request signing (both the
  * client-side signer and the fixture-side verifier), the blocking HTTP
  * helper every cloud client rides, and thin JSON utilities over the
  * in-repo parser.
  *
  * Everything here derives from the PUBLIC "AWS Signature Version 4
  * signing process" specification (AWS General Reference) — the
  * canonical-request / string-to-sign / derived-key algorithm — and is
  * pinned against the worked example published in that documentation
  * (the 2015-08-30 IAM ListUsers request) in AwsSpec. The reference
  * engine wraps the official aws-sdk-go-v2 (internal/impl/aws/
  * client_factory.go) and contains no signing code to port.
  */
object Aws {

  /** com.sun.net.httpserver leaves Nagle on; against the JDK client's
    * write-write-read pattern that costs a ~40 ms delayed-ACK stall per
    * loopback request (measured 45 ms/call → 0.4–2 ms with nodelay).
    * ServerConfig reads the property ONCE, when the HttpServer
    * implementation class initializes — so every fixture calls this
    * before its first HttpServer.create. */
  def serverNoDelay(): Unit =
    System.setProperty("sun.net.httpserver.nodelay", "true")

  // ----------------------------------------------------------------- JSON
  /** AWS JSON-protocol bodies (x-amz-json-1.0/1.1, REST-JSON) over the
    * in-repo parser/renderer. Field order is irrelevant to the protocol,
    * so marshalJson's sorted keys are fine.
    */
  object Json {
    def render(v: Any): String = graft.blob.Interp.marshalJson(v)
    def parse(s: String): Any = graft.blob.Interp.parseJsonTyped(s)
    def obj(kvs: (String, Any)*): VectorMap[String, Any] = VectorMap(kvs: _*)
    def asObj(v: Any): VectorMap[String, Any] = v match {
      case m: VectorMap[String @unchecked, Any @unchecked] => m
      case other => throw new IllegalArgumentException(s"not an object: $other")
    }
    def asArr(v: Any): Vector[Any] = v match {
      case a: Vector[Any @unchecked] => a
      case other => throw new IllegalArgumentException(s"not an array: $other")
    }
    def str(m: VectorMap[String, Any], k: String): String = m(k).asInstanceOf[String]
    def strOpt(m: VectorMap[String, Any], k: String): Option[String] =
      m.get(k).collect { case s: String => s }
    def long(m: VectorMap[String, Any], k: String, default: Long = 0L): Long = m.get(k) match {
      case Some(l: Long) => l
      case Some(d: Double) => d.toLong
      case Some(i: Int) => i.toLong
      case _ => default
    }
  }

  // ---------------------------------------------------------------- SigV4
  object SigV4 {
    final case class Credentials(accessKey: String, secretKey: String)

    private val hexDigits = "0123456789abcdef".toCharArray
    def hex(b: Array[Byte]): String = {
      val out = new Array[Char](b.length * 2)
      var i = 0
      while (i < b.length) {
        out(2 * i) = hexDigits((b(i) >> 4) & 0xf); out(2 * i + 1) = hexDigits(b(i) & 0xf); i += 1
      }
      new String(out)
    }
    def sha256(b: Array[Byte]): Array[Byte] = MessageDigest.getInstance("SHA-256").digest(b)
    def sha256Hex(b: Array[Byte]): String = hex(sha256(b))
    val emptyPayloadHash: String = sha256Hex(Array.emptyByteArray)

    def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(data)
    }
    private def hmac(key: Array[Byte], data: String): Array[Byte] = hmacSha256(key, data.getBytes(UTF_8))

    /** RFC 3986 "unreserved"-only percent-encoding, the SigV4 UriEncode()
      * (spec step 2: do-not-encode A-Za-z0-9 - _ . ~; '/' only when it is
      * a path separator). */
    def uriEncode(s: String, encodeSlash: Boolean): String = {
      val sb = new StringBuilder
      s.getBytes(UTF_8).foreach { b =>
        val c = (b & 0xff).toChar
        if (c.isLetterOrDigit && c < 128 || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
        else if (c == '/' && !encodeSlash) sb.append(c)
        else sb.append('%').append(hexDigits((b >> 4) & 0xf).toUpper).append(hexDigits(b & 0xf).toUpper)
      }
      sb.toString
    }

    /** Canonical query string: encode k and v, sort by (k, v), join k=v&. */
    def canonicalQuery(query: Seq[(String, String)]): String =
      query.map { case (k, v) => (uriEncode(k, encodeSlash = true), uriEncode(v, encodeSlash = true)) }
        .sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

    /** Canonical headers from (name, value) pairs: lowercase names, trim +
      * collapse inner whitespace runs in values, sort, one per line. */
    def canonicalHeaders(headers: Seq[(String, String)]): (String, String) = {
      val norm = headers.map { case (k, v) => (k.toLowerCase, v.trim.replaceAll("[ \t]+", " ")) }.sortBy(_._1)
      (norm.map { case (k, v) => s"$k:$v\n" }.mkString, norm.map(_._1).mkString(";"))
    }

    def canonicalRequest(method: String, canonicalUri: String, canonicalQueryStr: String,
                         headers: Seq[(String, String)], payloadHash: String): (String, String) = {
      val (ch, signed) = canonicalHeaders(headers)
      (s"$method\n$canonicalUri\n$canonicalQueryStr\n$ch\n$signed\n$payloadHash", signed)
    }

    def stringToSign(amzDateTime: String, scope: String, canonicalRequestHash: String): String =
      s"AWS4-HMAC-SHA256\n$amzDateTime\n$scope\n$canonicalRequestHash"

    def signingKey(secret: String, date: String, region: String, service: String): Array[Byte] = {
      val kDate = hmac(("AWS4" + secret).getBytes(UTF_8), date)
      hmac(hmac(hmac(kDate, region), service), "aws4_request")
    }

    private val amzFmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
    def amzNow(): String = amzFmt.format(Instant.now())

    /** Full client-side signature: returns the Authorization header value.
      * `canonicalUri` must be the already-encoded path as it will appear
      * on the request line; `headers` must include host and x-amz-date. */
    def authorization(creds: Credentials, region: String, service: String,
                      method: String, canonicalUri: String, query: Seq[(String, String)],
                      headers: Seq[(String, String)], payloadHash: String,
                      amzDateTime: String): String = {
      val date = amzDateTime.substring(0, 8)
      val scope = s"$date/$region/$service/aws4_request"
      val (cr, signed) = canonicalRequest(method, canonicalUri, canonicalQuery(query), headers, payloadHash)
      val sts = stringToSign(amzDateTime, scope, sha256Hex(cr.getBytes(UTF_8)))
      val sig = hex(hmacSha256(signingKey(creds.secretKey, date, region, service), sts.getBytes(UTF_8)))
      s"AWS4-HMAC-SHA256 Credential=${creds.accessKey}/$scope, SignedHeaders=$signed, Signature=$sig"
    }

    /** Fixture-side verification: recompute the signature from the raw
      * request components and the SignedHeaders the client declared.
      * Returns None on success, Some(reason) on failure — the fixtures
      * turn that into 403 SignatureDoesNotMatch, so an encoding slip in
      * the client signer cannot silently pass the gate. */
    def verify(secretFor: String => Option[String], method: String, rawPath: String,
               rawQuery: String, requestHeaders: Map[String, String], payloadHash: String): Option[String] = {
      val auth = requestHeaders.getOrElse("authorization", return Some("missing Authorization"))
      val re = "AWS4-HMAC-SHA256 Credential=([^/]+)/(\\d{8})/([^/]+)/([^/]+)/aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)".r
      auth match {
        case re(ak, date, region, service, signedList, gotSig) =>
          val secret = secretFor(ak).getOrElse(return Some(s"unknown access key $ak"))
          val signed = signedList.split(';').toSeq
          val hdrs = signed.map(h => h -> requestHeaders.getOrElse(h, return Some(s"signed header $h absent")))
          // canonical query: the raw query's k=v pairs re-sorted (values
          // arrive already encoded; spec says sort by encoded form)
          val cq =
            if (rawQuery == null || rawQuery.isEmpty) ""
            else rawQuery.split('&').toSeq.map { p =>
              val i = p.indexOf('=')
              if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
            }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
          val (cr, _) = canonicalRequest(method, if (rawPath.isEmpty) "/" else rawPath, cq, hdrs, payloadHash)
          val amzDateTime = requestHeaders.getOrElse("x-amz-date", return Some("missing x-amz-date"))
          val sts = stringToSign(amzDateTime, s"$date/$region/$service/aws4_request", sha256Hex(cr.getBytes(UTF_8)))
          val want = hex(hmacSha256(signingKey(secret, date, region, service), sts.getBytes(UTF_8)))
          if (want == gotSig) None else Some(s"signature mismatch (want $want got $gotSig)")
        case _ => Some("malformed Authorization header")
      }
    }
  }

  // ----------------------------------------------------------------- HTTP
  final case class HttpResp(status: Int, headers: Map[String, String], body: Array[Byte]) {
    def header(k: String): Option[String] = headers.get(k.toLowerCase)
    def bodyStr: String = new String(body, UTF_8)
  }

  /** One blocking JDK HttpClient per cloud client instance — the same
    * per-partition lifecycle as the `http` processor (QueriesExt
    * proc_http): connection count scales with partitions, never rows. */
  final class Http extends AutoCloseable {
    private val c = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
    def request(method: String, url: String, headers: Seq[(String, String)],
                body: Array[Byte]): HttpResp = {
      val b = java.net.http.HttpRequest.newBuilder(URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
      headers.foreach { case (k, v) =>
        // the JDK client owns these; it sets Host/Content-Length itself
        if (!k.equalsIgnoreCase("host") && !k.equalsIgnoreCase("content-length")) b.header(k, v)
      }
      b.method(method,
        if (body.isEmpty) java.net.http.HttpRequest.BodyPublishers.noBody()
        else java.net.http.HttpRequest.BodyPublishers.ofByteArray(body))
      val r = c.send(b.build(), java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      val hs = {
        import scala.jdk.CollectionConverters._
        r.headers().map().asScala.map { case (k, vs) => k.toLowerCase -> vs.asScala.mkString(",") }.toMap
      }
      HttpResp(r.statusCode(), hs, r.body())
    }
    override def close(): Unit = () // JDK client has no close; GC'd with the holder
  }

  /** A signed AWS service client: stamps host / x-amz-date /
    * x-amz-content-sha256 / Authorization on every request. `endpoint` is
    * "http://127.0.0.1:port" (the fixture; at scale only this string and
    * the credentials change — the reference's `endpoint` config field,
    * client_factory.go). */
  final class AwsHttp(endpoint: String, region: String, service: String,
                      creds: SigV4.Credentials) extends AutoCloseable {
    private val http = new Http
    private val hostHeader = URI.create(endpoint).getAuthority

    def request(method: String, path: String, query: Seq[(String, String)] = Nil,
                extraHeaders: Seq[(String, String)] = Nil,
                body: Array[Byte] = Array.emptyByteArray): HttpResp = {
      val amzDateTime = SigV4.amzNow()
      val payloadHash = SigV4.sha256Hex(body)
      val baseHeaders = Seq("host" -> hostHeader, "x-amz-date" -> amzDateTime,
        "x-amz-content-sha256" -> payloadHash) ++ extraHeaders.map { case (k, v) => (k.toLowerCase, v) }
      val auth = SigV4.authorization(creds, region, service, method, path, query,
        baseHeaders, payloadHash, amzDateTime)
      val qs = if (query.isEmpty) ""
        else "?" + query.map { case (k, v) =>
          s"${SigV4.uriEncode(k, encodeSlash = true)}=${SigV4.uriEncode(v, encodeSlash = true)}" }.mkString("&")
      http.request(method, s"$endpoint$path$qs",
        baseHeaders ++ Seq("authorization" -> auth), body)
    }
    override def close(): Unit = http.close()
  }

  // -------------------------------------------------- fixture-side plumbing
  /** Shared HttpServer scaffolding for the Mini* cloud fixtures (MiniS3,
    * MiniSqs, MiniKinesis, MiniDynamo, MiniLambda): loopback bind, daemon
    * dispatcher (started from a daemon thread so the JDK accept thread
    * inherits daemon=true — see proc_http's wedge note), and SigV4
    * verification on every exchange before the handler runs. */
  abstract class MiniAwsService(val serviceName: String, creds: SigV4.Credentials) {
    @volatile private var server: com.sun.net.httpserver.HttpServer = _
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"

    /** handle one verified exchange: (method, rawPath, rawQuery, headers-lc, body)
      * → (status, responseHeaders, responseBody) */
    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte])

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        val body = x.getRequestBody.readAllBytes()
        val hdrs = {
          import scala.jdk.CollectionConverters._
          x.getRequestHeaders.asScala.map { case (k, vs) => k.toLowerCase -> vs.asScala.mkString(",") }.toMap
        }
        val (status, respHeaders, respBody) = try {
          val payloadHash = hdrs.getOrElse("x-amz-content-sha256", SigV4.sha256Hex(body))
          SigV4.verify(ak => if (ak == creds.accessKey) Some(creds.secretKey) else None,
            x.getRequestMethod, x.getRequestURI.getRawPath, x.getRequestURI.getRawQuery,
            hdrs, payloadHash) match {
            case Some(reason) =>
              (403, Seq("Content-Type" -> "application/xml"),
                s"<Error><Code>SignatureDoesNotMatch</Code><Message>$reason</Message></Error>".getBytes(UTF_8))
            case None =>
              handle(x.getRequestMethod, x.getRequestURI.getRawPath,
                Option(x.getRequestURI.getRawQuery).getOrElse(""), hdrs, body)
          }
        } catch {
          case e: Throwable =>
            (500, Seq("Content-Type" -> "application/xml"),
              s"<Error><Code>InternalError</Code><Message>${e.getMessage}</Message></Error>".getBytes(UTF_8))
        }
        respHeaders.foreach { case (k, v) => x.getResponseHeaders.add(k, v) }
        if (x.getRequestMethod == "HEAD") x.sendResponseHeaders(status, -1)
        else x.sendResponseHeaders(status, if (respBody.isEmpty) -1 else respBody.length.toLong)
        if (x.getRequestMethod != "HEAD" && respBody.nonEmpty) x.getResponseBody.write(respBody)
        x.close()
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
        (r: Runnable) => { val th = new Thread(r); th.setDaemon(true); th }))
      val starter = new Thread(() => server.start())
      starter.setDaemon(true); starter.start(); starter.join()
      this
    }
    def stop(): Unit = if (server != null) server.stop(0)
  }

  /** shared test credentials for the fixtures (the public doc-example key id) */
  val testCreds: SigV4.Credentials = SigV4.Credentials("AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
  val testRegion = "us-east-1"
}
