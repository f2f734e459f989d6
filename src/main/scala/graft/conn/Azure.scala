package graft.conn

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.atomic.AtomicLong

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.collection.concurrent.{TrieMap => CTrieMap}

import graft.conn.Aws.Http

/** Azure Storage connector family — Blob and Queue — over the PUBLIC
  * REST APIs with Shared Key authorization: the documented
  * string-to-sign (VERB + standard headers + CanonicalizedHeaders of the
  * sorted x-ms-* set + CanonicalizedResource of /account/path plus
  * sorted query params), HMAC-SHA256 under the base64-decoded account
  * key, `Authorization: SharedKey account:signature`. The fixture
  * recomputes and rejects mismatches, so the canonicalization is
  * honest on both ends.
  *
  * Reference surface being re-expressed:
  *  - input_blob_storage.go / output_blob_storage.go — container walk +
  *    download, per-message block-blob writes at interpolated paths.
  *  - input_queue_storage.go / output_queue_storage.go — queue messages
  *    (base64 text bodies), visibility-timeout redelivery with
  *    DequeueCount, delete by (MessageId, PopReceipt).
  * The reference wraps github.com/Azure/azure-sdk-for-go; the auth
  * scheme and XML wire shapes here come from the public service docs.
  */
object Azure {

  final case class Account(name: String, base64Key: String) {
    def keyBytes: Array[Byte] = java.util.Base64.getDecoder.decode(base64Key)
  }
  def testAccount: Account = Account("devaccount",
    java.util.Base64.getEncoder.encodeToString("graft-azure-shared-key-material-0123".getBytes(UTF_8)))

  private val rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)
  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ------------------------------------------------------ SharedKey auth
  object SharedKey {
    private def hmac(key: Array[Byte], data: String): Array[Byte] = {
      val mac = Mac.getInstance("HmacSHA256")
      mac.init(new SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(data.getBytes(UTF_8))
    }

    /** the Blob/Queue-service string-to-sign (2015-02-21+ rules:
      * Content-Length is "" when zero). `headers` are lowercase-keyed. */
    def stringToSign(verb: String, path: String, query: Seq[(String, String)],
                     headers: Map[String, String], contentLength: Long, account: String): String = {
      def h(k: String) = headers.getOrElse(k, "")
      val std = Seq(
        if (contentLength > 0) contentLength.toString else "",
        h("content-md5"), h("content-type"), "" /* Date: empty, x-ms-date used */,
        h("if-modified-since"), h("if-match"), h("if-none-match"),
        h("if-unmodified-since"), h("range"))
      val canonHeaders = headers.toSeq.filter(_._1.startsWith("x-ms-"))
        .sortBy(_._1).map { case (k, v) => s"$k:$v\n" }.mkString
      val canonResource = s"/$account$path" + query.map { case (k, v) => (k.toLowerCase, v) }
        .sortBy(_._1).map { case (k, v) => s"\n$k:$v" }.mkString
      verb + "\n" + h("content-encoding") + "\n" + h("content-language") + "\n" +
        std.mkString("\n") + "\n" + canonHeaders + canonResource
    }

    def signature(account: Account, sts: String): String =
      java.util.Base64.getEncoder.encodeToString(hmac(account.keyBytes, sts))

    def authHeader(account: Account, sts: String): String =
      s"SharedKey ${account.name}:${signature(account, sts)}"

    /** the TABLE-service string-to-sign (a different, documented shape
      * from blob/queue: VERB, Content-MD5, Content-Type, Date, then a
      * canonicalized resource of /account/path with only the `comp`
      * query parameter — $filter/$top never sign) */
    def tableStringToSign(verb: String, path: String, query: Seq[(String, String)],
                          headers: Map[String, String], account: String): String = {
      def h(k: String) = headers.getOrElse(k, "")
      val comp = query.collectFirst { case ("comp", v) => s"?comp=$v" }.getOrElse("")
      s"$verb\n${h("content-md5")}\n${h("content-type")}\n${h("x-ms-date")}\n/$account$path$comp"
    }
  }

  // -------------------------------------------------------------- client
  /** signed Azure Storage REST client shared by blob and queue surfaces */
  final class AzHttp(endpoint: String, account: Account) extends AutoCloseable {
    private val http = new Http
    def request(method: String, path: String, query: Seq[(String, String)] = Nil,
                extraHeaders: Seq[(String, String)] = Nil,
                body: Array[Byte] = Array.emptyByteArray): Aws.HttpResp = {
      val base = Seq(
        "x-ms-date" -> rfc1123.format(Instant.now()),
        "x-ms-version" -> "2021-08-06") ++ extraHeaders.map { case (k, v) => (k.toLowerCase, v) }
      val sts = SharedKey.stringToSign(method, path, query, base.toMap, body.length.toLong, account.name)
      val qs = if (query.isEmpty) ""
        else "?" + query.map { case (k, v) =>
          s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
      http.request(method, s"$endpoint$path$qs",
        base ++ Seq("authorization" -> SharedKey.authHeader(account, sts)), body)
    }
    override def close(): Unit = http.close()
  }

  /** Table-service client (output_table_storage.go's INSERT /
    * INSERT_MERGE / INSERT_REPLACE / DELETE transaction verbs;
    * input_table_storage.go's $filter queries with continuation) —
    * signs the table-service SharedKey flavor. */
  final class TableClient(endpoint: String, account: Account) extends AutoCloseable {
    import scala.collection.immutable.VectorMap
    private val http = new Http

    private def request(method: String, path: String, query: Seq[(String, String)] = Nil,
                        body: Array[Byte] = Array.emptyByteArray,
                        extraHeaders: Seq[(String, String)] = Nil): Aws.HttpResp = {
      val base = Seq(
        "x-ms-date" -> rfc1123.format(Instant.now()),
        "x-ms-version" -> "2021-08-06",
        "accept" -> "application/json;odata=nometadata") ++
        (if (body.nonEmpty) Seq("content-type" -> "application/json") else Nil) ++
        extraHeaders.map { case (k, v) => (k.toLowerCase, v) }
      val sts = SharedKey.tableStringToSign(method, path, query, base.toMap, account.name)
      val qs = if (query.isEmpty) ""
        else "?" + query.map { case (k, v) =>
          s"$k=${java.net.URLEncoder.encode(v, "UTF-8")}" }.mkString("&")
      http.request(method, s"$endpoint$path$qs",
        base ++ Seq("authorization" -> SharedKey.authHeader(account, sts)), body)
    }

    private def entityPath(table: String, pk: String, rk: String) =
      s"/$table(PartitionKey='$pk',RowKey='$rk')"

    def createTable(name: String): Unit = {
      val r = request("POST", "/Tables",
        body = Aws.Json.render(Aws.Json.obj("TableName" -> name)).getBytes(UTF_8))
      require(r.status == 201, s"createTable: ${r.status} ${r.bodyStr}")
    }

    /** INSERT — false when the entity already exists (409) */
    def insert(table: String, pk: String, rk: String, props: VectorMap[String, Any]): Boolean = {
      val r = request("POST", s"/$table",
        body = Aws.Json.render(props.updated("PartitionKey", pk).updated("RowKey", rk)).getBytes(UTF_8))
      if (r.status == 409) false
      else { require(r.status == 201, s"insert: ${r.status} ${r.bodyStr}"); true }
    }

    /** INSERT_MERGE / UPDATE_MERGE */
    def merge(table: String, pk: String, rk: String, props: VectorMap[String, Any]): Unit = {
      val r = request("MERGE", entityPath(table, pk, rk),
        body = Aws.Json.render(props).getBytes(UTF_8))
      require(r.status == 204, s"merge: ${r.status} ${r.bodyStr}")
    }

    /** INSERT_REPLACE / UPDATE_REPLACE */
    def replace(table: String, pk: String, rk: String, props: VectorMap[String, Any]): Unit = {
      val r = request("PUT", entityPath(table, pk, rk),
        body = Aws.Json.render(props).getBytes(UTF_8))
      require(r.status == 204, s"replace: ${r.status} ${r.bodyStr}")
    }

    def delete(table: String, pk: String, rk: String): Boolean = {
      val r = request("DELETE", entityPath(table, pk, rk),
        extraHeaders = Seq("if-match" -> "*"))
      r.status == 204
    }

    def get(table: String, pk: String, rk: String): Option[VectorMap[String, Any]] = {
      val r = request("GET", entityPath(table, pk, rk))
      if (r.status == 404) None
      else { require(r.status == 200, s"get: ${r.status}"); Some(Aws.Json.asObj(Aws.Json.parse(r.bodyStr))) }
    }

    /** query with the documented OData filter subset; pages of `top`
      * follow the x-ms-continuation headers — no call exceeds `top` */
    def query(table: String, filter: Option[String] = None, top: Int = 1000): Vector[VectorMap[String, Any]] = {
      val out = Vector.newBuilder[VectorMap[String, Any]]
      var cont: Option[(String, String)] = None
      var more = true
      while (more) {
        val q = Seq("$top" -> top.toString) ++ filter.map("$filter" -> _)
        val hdrs = cont.toSeq.flatMap { case (pk, rk) => Seq(
          "x-ms-continuation-nextpartitionkey" -> pk,
          "x-ms-continuation-nextrowkey" -> rk) }
        val r = request("GET", s"/$table", q, extraHeaders = hdrs)
        require(r.status == 200, s"query: ${r.status} ${r.bodyStr}")
        Aws.Json.asArr(Aws.Json.asObj(Aws.Json.parse(r.bodyStr))("value"))
          .foreach(e => out += Aws.Json.asObj(e))
        cont = for {
          pk <- r.header("x-ms-continuation-nextpartitionkey")
          rk <- r.header("x-ms-continuation-nextrowkey")
        } yield (pk, rk)
        more = cont.isDefined
      }
      out.result()
    }

    override def close(): Unit = http.close()
  }

  // ------------------------------------------------------------- fixture
  private final class QMsg(val id: String, val text: String, val insertedTs: Long) {
    @volatile var visibleAt: Long = 0L
    @volatile var popReceipt: String = ""
    @volatile var dequeueCount: Int = 0
    @volatile var deleted: Boolean = false
  }

  /** In-memory Azure Storage (blob containers + queues) verifying the
    * SharedKey signature on every request. */
  final class MiniAzure(account: Account = testAccount) {
    private val blobs = new CTrieMap[(String, String), (Array[Byte], String, Long)]() // (container, name) -> (bytes, contentType, lastModified)
    private val containers = new CTrieMap[String, Unit]()
    private val queues = new CTrieMap[String, java.util.concurrent.ConcurrentLinkedQueue[QMsg]]()
    private val tables = new CTrieMap[String, Unit]()
    private val entities = new CTrieMap[(String, String, String), scala.collection.immutable.VectorMap[String, Any]]() // (table, pk, rk) -> props
    private val seq = new AtomicLong(0)
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def blobCount(container: String): Int = blobs.keys.count(_._1 == container)

    private def pctDecode(s: String): String = URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")
    private def parseQuery(q: String): Seq[(String, String)] =
      if (q == null || q.isEmpty) Nil
      else q.split('&').toSeq.map { p =>
        val i = p.indexOf('=')
        if (i < 0) (p, "") else (p.substring(0, i), URLDecoder.decode(p.substring(i + 1), "UTF-8"))
      }

    /** the OData filter subset the reference input documents
      * (input_table_storage.go:70 — `eq ne gt lt ge le` joined by and):
      * `PartitionKey eq 'foo' and Value gt 100` */
    private def parseODataFilter(s: String): scala.collection.immutable.VectorMap[String, Any] => Boolean = {
      val condRe = "(\\w+)\\s+(eq|ne|gt|lt|ge|le)\\s+('[^']*'|[-0-9.]+)".r
      def toNum(v: Any): Double = v match {
        case l: Long => l.toDouble; case d: Double => d; case i: Int => i.toDouble
        case other => other.toString.toDouble
      }
      val conds: Vector[scala.collection.immutable.VectorMap[String, Any] => Boolean] =
        s.split("(?i)\\s+and\\s+").toVector.map {
          case condRe(prop, op, raw) =>
            val strVal = if (raw.startsWith("'")) Some(raw.substring(1, raw.length - 1)) else None
            (e: scala.collection.immutable.VectorMap[String, Any]) => e.get(prop).exists { x =>
              val cmp = strVal match {
                case Some(v) => String.valueOf(x).compareTo(v)
                case None => toNum(x).compareTo(raw.toDouble)
              }
              op match {
                case "eq" => cmp == 0; case "ne" => cmp != 0
                case "gt" => cmp > 0; case "lt" => cmp < 0
                case "ge" => cmp >= 0; case "le" => cmp <= 0
              }
            }
          case other => throw new IllegalArgumentException(s"unsupported filter: $other")
        }
      e => conds.forall(_(e))
    }

    private def xml(status: Int, body: String): (Int, Seq[(String, String)], Array[Byte]) =
      (status, Seq("Content-Type" -> "application/xml"), body.getBytes(UTF_8))
    private def errXml(status: Int, code: String): (Int, Seq[(String, String)], Array[Byte]) =
      xml(status, s"<?xml version=\"1.0\" encoding=\"utf-8\"?><Error><Code>$code</Code></Error>")

    private def handle(method: String, rawPath: String, rawQuery: String,
                       headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      // ---- SharedKey verification against the canonical reconstruction.
      // The canonicalized resource uses the path AS IT APPEARS on the
      // request line (still percent-encoded) — the client signs the same
      // string it puts in the URL, so both ends agree without a decode.
      val query = parseQuery(rawQuery)
      val auth = headers.getOrElse("authorization", "")
      val expectSts = SharedKey.stringToSign(method, rawPath, query, headers,
        body.length.toLong, account.name)
      val want = SharedKey.authHeader(account, expectSts)
      // table requests sign the table-service flavor; both are exact
      // HMACs under the account key, so accepting either weakens nothing
      val wantTable = SharedKey.authHeader(account,
        SharedKey.tableStringToSign(method, rawPath, query, headers, account.name))
      if (auth != want && auth != wantTable) return errXml(403, "AuthenticationFailed")
      val q = query.toMap
      val path = pctDecode(rawPath).stripPrefix("/")
      val slash = path.indexOf('/')
      val (first, rest) = if (slash < 0) (path, "") else (path.substring(0, slash), path.substring(slash + 1))

      // ---------------- table surface (OData JSON): /Tables,
      //                  /{table}, /{table}(PartitionKey='p',RowKey='r')
      val entityRe = "([A-Za-z0-9]+)\\(PartitionKey='([^']*)',RowKey='([^']*)'\\)".r
      def jsonResp(status: Int, v: Any): (Int, Seq[(String, String)], Array[Byte]) =
        (status, Seq("Content-Type" -> "application/json"),
          if (v == null) Array.emptyByteArray
          else Aws.Json.render(v).getBytes(UTF_8))
      def odataErr(status: Int, code: String): (Int, Seq[(String, String)], Array[Byte]) =
        jsonResp(status, Aws.Json.obj("odata.error" -> Aws.Json.obj("code" -> code)))
      if (path == "Tables" && method == "POST") {
        val name = Aws.Json.str(Aws.Json.asObj(Aws.Json.parse(new String(body, UTF_8))), "TableName")
        tables.putIfAbsent(name, ())
        return jsonResp(201, Aws.Json.obj("TableName" -> name))
      }
      path match {
        case entityRe(table, pk, rk) =>
          if (!tables.contains(table)) return odataErr(404, "TableNotFound")
          val key = (table, pk, rk)
          return (method match {
            case "MERGE" => // insert-or-merge / update-merge
              val props = Aws.Json.asObj(Aws.Json.parse(new String(body, UTF_8)))
              entities.put(key, entities.get(key)
                .map(_ ++ props).getOrElse(
                  props.updated("PartitionKey", pk).updated("RowKey", rk)))
              (204, Nil, Array.emptyByteArray)
            case "PUT" => // insert-or-replace
              val props = Aws.Json.asObj(Aws.Json.parse(new String(body, UTF_8)))
              entities.put(key, props.updated("PartitionKey", pk).updated("RowKey", rk))
              (204, Nil, Array.emptyByteArray)
            case "DELETE" =>
              if (entities.remove(key).isDefined) (204, Nil, Array.emptyByteArray)
              else odataErr(404, "ResourceNotFound")
            case "GET" =>
              entities.get(key).map(e => jsonResp(200, e))
                .getOrElse(odataErr(404, "ResourceNotFound"))
            case _ => odataErr(400, "InvalidOperation")
          })
        case t if tables.contains(t) && rest.isEmpty =>
          method match {
            case "POST" => // insert entity; 409 EntityAlreadyExists
              val props = Aws.Json.asObj(Aws.Json.parse(new String(body, UTF_8)))
              val pk = Aws.Json.str(props, "PartitionKey")
              val rk = Aws.Json.str(props, "RowKey")
              return (if (entities.putIfAbsent((t, pk, rk), props).isDefined)
                odataErr(409, "EntityAlreadyExists")
              else jsonResp(201, props))
            case "GET" => // query with $filter/$top + continuation headers
              val filter = q.get("$filter").map(parseODataFilter).getOrElse((_: scala.collection.immutable.VectorMap[String, Any]) => true)
              val top = q.get("$top").map(_.toInt).getOrElse(1000)
              val afterPk = headers.getOrElse("x-ms-continuation-nextpartitionkey", q.getOrElse("NextPartitionKey", ""))
              val afterRk = headers.getOrElse("x-ms-continuation-nextrowkey", q.getOrElse("NextRowKey", ""))
              val all = entities.toSeq.collect { case ((`t`, pk, rk), e) => ((pk, rk), e) }
                .filter { case ((pk, rk), e) =>
                  Ordering[(String, String)].compare((pk, rk), (afterPk, afterRk)) > 0 && filter(e)
                }.sortBy(_._1)
              val page = all.take(top)
              val hdrs = if (all.size > top)
                Seq("x-ms-continuation-NextPartitionKey" -> page.last._1._1,
                    "x-ms-continuation-NextRowKey" -> page.last._1._2)
              else Nil
              val bodyJson = Aws.Json.render(
                Aws.Json.obj("value" -> page.toVector.map(_._2: Any))).getBytes(UTF_8)
              return (200, hdrs ++ Seq("Content-Type" -> "application/json"), bodyJson)
            case _ => return odataErr(400, "InvalidOperation")
          }
        case _ => () // fall through to queue/blob surfaces
      }

      // ---------------- queue surface: /{queue} and /{queue}/messages[/id]
      if (rest == "messages" || rest.startsWith("messages/")) {
        val queue = queues.getOrElse(first, return errXml(404, "QueueNotFound"))
        (method, rest) match {
          case ("POST", "messages") => // enqueue (visibilitytimeout optional)
            val text = {
              val b = new String(body, UTF_8)
              val m = "<MessageText>(.*)</MessageText>".r.findFirstMatchIn(b)
              m.map(_.group(1)).getOrElse("")
            }
            val msg = new QMsg(s"am-${seq.incrementAndGet()}", text, System.currentTimeMillis())
            msg.visibleAt = System.currentTimeMillis() +
              q.get("visibilitytimeout").map(_.toLong * 1000).getOrElse(0L)
            queue.add(msg)
            xml(201, s"<?xml version=\"1.0\" encoding=\"utf-8\"?><QueueMessagesList><QueueMessage><MessageId>${msg.id}</MessageId><PopReceipt>first</PopReceipt></QueueMessage></QueueMessagesList>")

          case ("GET", "messages") => // dequeue with visibility lease
            val max = q.get("numofmessages").map(_.toInt).getOrElse(1)
            val visMs = q.get("visibilitytimeout").map(_.toLong * 1000).getOrElse(30000L)
            val now = System.currentTimeMillis()
            val picked = queue.toArray(Array.empty[QMsg]).iterator
              .filter(m => !m.deleted && m.visibleAt <= now).take(max).toList
            picked.foreach { m =>
              m.visibleAt = now + visMs
              m.dequeueCount += 1
              m.popReceipt = s"pr-${m.id}-${m.dequeueCount}-${seq.incrementAndGet()}"
            }
            val items = picked.map { m =>
              s"<QueueMessage><MessageId>${m.id}</MessageId><PopReceipt>${m.popReceipt}</PopReceipt><DequeueCount>${m.dequeueCount}</DequeueCount><InsertionTime>${rfc1123.format(Instant.ofEpochMilli(m.insertedTs))}</InsertionTime><MessageText>${xmlEscape(m.text)}</MessageText></QueueMessage>"
            }.mkString
            xml(200, s"<?xml version=\"1.0\" encoding=\"utf-8\"?><QueueMessagesList>$items</QueueMessagesList>")

          case ("DELETE", _) => // /queue/messages/{id}?popreceipt=
            val id = rest.stripPrefix("messages/")
            val pr = q.getOrElse("popreceipt", "")
            queue.toArray(Array.empty[QMsg]).find(m => m.id == id && !m.deleted) match {
              case Some(m) if m.popReceipt == pr => m.deleted = true; (204, Nil, Array.emptyByteArray)
              case Some(_) => errXml(400, "PopReceiptMismatch")
              case None => errXml(404, "MessageNotFound")
            }
          case _ => errXml(400, "InvalidOperation")
        }
      } else (method, rest) match {
        // ---------------- queue create: PUT /{queue} (no restype param)
        case ("PUT", "") if !q.contains("restype") =>
          queues.putIfAbsent(first, new java.util.concurrent.ConcurrentLinkedQueue[QMsg]())
          (201, Nil, Array.emptyByteArray)

        // ---------------- blob container create: PUT /{container}?restype=container
        case ("PUT", "") if q.get("restype").contains("container") =>
          containers.putIfAbsent(first, ()); (201, Nil, Array.emptyByteArray)

        // ---------------- blob list: GET /{container}?restype=container&comp=list
        case ("GET", "") if q.get("comp").contains("list") =>
          val prefix = q.getOrElse("prefix", "")
          val marker = q.getOrElse("marker", "")
          val max = q.get("maxresults").map(_.toInt).getOrElse(5000)
          val all = blobs.toSeq.collect {
            case ((c, n), (bytes, ct, lm)) if c == first && n.startsWith(prefix) && n > marker => (n, bytes, ct, lm)
          }.sortBy(_._1)
          val page = all.take(max)
          val items = page.map { case (n, bytes, ct, lm) =>
            s"<Blob><Name>${xmlEscape(n)}</Name><Properties><Last-Modified>${rfc1123.format(Instant.ofEpochMilli(lm))}</Last-Modified><Content-Length>${bytes.length}</Content-Length><Content-Type>${xmlEscape(ct)}</Content-Type></Properties></Blob>"
          }.mkString
          val next = if (all.size > max) s"<NextMarker>${xmlEscape(page.last._1)}</NextMarker>" else "<NextMarker/>"
          xml(200, s"<?xml version=\"1.0\" encoding=\"utf-8\"?><EnumerationResults><Blobs>$items</Blobs>$next</EnumerationResults>")

        // ---------------- blob put: PUT /{container}/{blob} with x-ms-blob-type
        case ("PUT", name) if name.nonEmpty =>
          if (!headers.contains("x-ms-blob-type")) errXml(400, "MissingRequiredHeader")
          else {
            blobs.put((first, name), (body,
              headers.getOrElse("content-type", "application/octet-stream"), System.currentTimeMillis()))
            (201, Nil, Array.emptyByteArray)
          }

        case ("GET" | "HEAD", name) if name.nonEmpty =>
          blobs.get((first, name)) match {
            case Some((bytes, ct, lm)) =>
              (200, Seq("Content-Type" -> ct,
                "Last-Modified" -> rfc1123.format(Instant.ofEpochMilli(lm))),
                if (method == "HEAD") Array.emptyByteArray else bytes)
            case None => errXml(404, "BlobNotFound")
          }

        case ("DELETE", name) if name.nonEmpty =>
          if (blobs.remove((first, name)).isDefined) (202, Nil, Array.emptyByteArray)
          else errXml(404, "BlobNotFound")

        case _ => errXml(400, "InvalidOperation")
      }
    }

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        val body = x.getRequestBody.readAllBytes()
        val hdrs = {
          import scala.jdk.CollectionConverters._
          x.getRequestHeaders.asScala.map { case (k, vs) => k.toLowerCase -> vs.asScala.mkString(",") }.toMap
        }
        val (status, respHeaders, respBody) = try handle(x.getRequestMethod,
          x.getRequestURI.getRawPath, Option(x.getRequestURI.getRawQuery).getOrElse(""), hdrs, body)
        catch { case e: Throwable => (500, Seq("Content-Type" -> "application/xml"),
          s"<Error><Message>${String.valueOf(e.getMessage)}</Message></Error>".getBytes(UTF_8)) }
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

  // --------------------------------------------------------- blob client
  final case class BlobInfo(name: String, size: Long, contentType: String)

  final class BlobClient(endpoint: String, account: Account = testAccount) extends AutoCloseable {
    private val az = new AzHttp(endpoint, account)
    private def blobPath(container: String, name: String) =
      s"/$container/${Aws.SigV4.uriEncode(name, encodeSlash = false)}"

    def createContainer(container: String): Unit = {
      val r = az.request("PUT", s"/$container", Seq("restype" -> "container"))
      require(r.status == 201, s"create container: ${r.status} ${r.bodyStr}")
    }
    def put(container: String, name: String, bytes: Array[Byte],
            contentType: String = "application/octet-stream"): Unit = {
      val r = az.request("PUT", blobPath(container, name),
        extraHeaders = Seq("x-ms-blob-type" -> "BlockBlob", "content-type" -> contentType),
        body = bytes)
      require(r.status == 201, s"put blob $name: ${r.status} ${r.bodyStr}")
    }
    def get(container: String, name: String): Option[Array[Byte]] = {
      val r = az.request("GET", blobPath(container, name))
      if (r.status == 404) None
      else { require(r.status == 200, s"get blob $name: ${r.status} ${r.bodyStr}"); Some(r.body) }
    }
    def delete(container: String, name: String): Boolean =
      az.request("DELETE", blobPath(container, name)).status == 202

    def list(container: String, prefix: String = "", pageSize: Int = 5000): Seq[BlobInfo] = {
      val out = Vector.newBuilder[BlobInfo]
      var marker = ""
      var more = true
      while (more) {
        val q = Seq("restype" -> "container", "comp" -> "list", "maxresults" -> pageSize.toString) ++
          (if (prefix.nonEmpty) Seq("prefix" -> prefix) else Nil) ++
          (if (marker.nonEmpty) Seq("marker" -> marker) else Nil)
        val r = az.request("GET", s"/$container", q)
        require(r.status == 200, s"list: ${r.status} ${r.bodyStr}")
        val x = scala.xml.XML.loadString(r.bodyStr)
        (x \ "Blobs" \ "Blob").foreach { bl =>
          out += BlobInfo((bl \ "Name").text,
            (bl \ "Properties" \ "Content-Length").text.toLong,
            (bl \ "Properties" \ "Content-Type").text)
        }
        val nm = (x \ "NextMarker").text
        if (nm.nonEmpty) marker = nm else more = false
      }
      out.result()
    }
    override def close(): Unit = az.close()
  }

  // -------------------------------------------------------- queue client
  final case class QueueMsg(messageId: String, popReceipt: String, text: String, dequeueCount: Long)

  final class QueueClient(endpoint: String, account: Account = testAccount) extends AutoCloseable {
    private val az = new AzHttp(endpoint, account)

    def createQueue(queue: String): Unit = {
      val r = az.request("PUT", s"/$queue")
      require(r.status == 201, s"create queue: ${r.status} ${r.bodyStr}")
    }
    /** message text rides base64 — the convention the reference's queue
      * output uses for binary-safe bodies */
    def enqueue(queue: String, body: Array[Byte], visibilitySec: Long = 0): Unit = {
      val b64 = java.util.Base64.getEncoder.encodeToString(body)
      val q = if (visibilitySec > 0) Seq("visibilitytimeout" -> visibilitySec.toString) else Nil
      val r = az.request("POST", s"/$queue/messages", q,
        Seq("content-type" -> "application/xml"),
        s"<QueueMessage><MessageText>$b64</MessageText></QueueMessage>".getBytes(UTF_8))
      require(r.status == 201, s"enqueue: ${r.status} ${r.bodyStr}")
    }
    def dequeue(queue: String, max: Int = 1, visibilitySec: Long = 30): Seq[QueueMsg] = {
      val r = az.request("GET", s"/$queue/messages",
        Seq("numofmessages" -> max.toString, "visibilitytimeout" -> visibilitySec.toString))
      require(r.status == 200, s"dequeue: ${r.status} ${r.bodyStr}")
      val x = scala.xml.XML.loadString(r.bodyStr)
      (x \ "QueueMessage").map { m =>
        QueueMsg((m \ "MessageId").text, (m \ "PopReceipt").text,
          (m \ "MessageText").text, (m \ "DequeueCount").text.toLong)
      }
    }
    def decodeBody(m: QueueMsg): Array[Byte] = java.util.Base64.getDecoder.decode(m.text)
    def delete(queue: String, m: QueueMsg): Unit = {
      val r = az.request("DELETE", s"/$queue/messages/${m.messageId}", Seq("popreceipt" -> m.popReceipt))
      require(r.status == 204, s"delete message: ${r.status} ${r.bodyStr}")
    }
    override def close(): Unit = az.close()
  }
}
