package graft.conn

import java.net.{InetSocketAddress, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap

import graft.conn.Aws.{Http, Json}
import graft.conn.Aws.SigV4.uriEncode

/** Google Cloud connector family — Pub/Sub and Cloud Storage — over the
  * PUBLIC REST APIs with the real service-account OAuth2 flow:
  * an RS256-signed JWT assertion (iss = client_email, aud = token_uri,
  * bounded exp) exchanged at the token endpoint for a Bearer token
  * (grant_type urn:ietf:params:oauth:grant-type:jwt-bearer — the
  * documented "Using OAuth 2.0 for Server to Server Applications" flow).
  * The fixture VERIFIES the assertion signature with the account's
  * public key before minting a token, and every API call must carry a
  * live Bearer token.
  *
  * Reference surface being re-expressed:
  *  - input_pubsub.go / output_pubsub.go — publish with attributes;
  *    streaming pull + ack with an ack-deadline redelivery contract.
  *  - input_cloud_storage.go / output_cloud_storage.go /
  *    cache_cloud_storage.go — bucket walk + download, per-message
  *    object writes, bucket-as-KV-cache.
  * The reference wraps cloud.google.com/go/{pubsub,storage}; the REST
  * protocol and auth flow here are implemented from the public docs.
  */
object Gcp {

  final case class ServiceAccount(clientEmail: String, privateKeyPem: String)

  // ---------------------------------------------------------- PEM helpers
  def generateKeyPair(): (String, String) = { // (privatePkcs8Pem, publicX509Pem)
    val kpg = java.security.KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048)
    val kp = kpg.generateKeyPair()
    def pem(label: String, der: Array[Byte]) =
      s"-----BEGIN $label-----\n" +
        java.util.Base64.getMimeEncoder(64, "\n".getBytes(UTF_8)).encodeToString(der) +
        s"\n-----END $label-----\n"
    (pem("PRIVATE KEY", kp.getPrivate.getEncoded), pem("PUBLIC KEY", kp.getPublic.getEncoded))
  }

  // ------------------------------------------------------------- fixture
  private final class PsMsg(val id: String, val data: Array[Byte],
                            val attrs: Map[String, String], val publishTs: Long) {
    @volatile var leasedUntil: Long = 0L
    @volatile var acked: Boolean = false
    @volatile var ackId: String = ""
    @volatile var deliveries: Int = 0
  }

  /** One loopback server hosting the token endpoint, Pub/Sub and GCS.
    * `ackDeadlineMs` plays the subscription's ackDeadlineSeconds
    * (fixture default short so specs can watch redelivery). */
  final class MiniGcp(account: ServiceAccount, accountPublicKeyPem: String,
                      ackDeadlineMs: Long = 400) {
    private val topics = new CTrieMap[String, java.util.concurrent.ConcurrentLinkedQueue[PsMsg]]()
    private val subs = new CTrieMap[String, String]() // subscription -> topic
    private val objects = new CTrieMap[(String, String), (Array[Byte], String, Long)]() // (bucket,name) -> (bytes, contentType, updated)
    private val tokens = new CTrieMap[String, Long]() // token -> expiry
    private val seq = new AtomicLong(0)

    // ---- BigQuery state: tables keyed "project.dataset.table", jobs
    //      hold a finished result set for getQueryResults paging
    private final class BqTable(val schema: Vector[(String, String)]) {
      val rows = new scala.collection.mutable.ArrayBuffer[Vector[Any]]()
      val insertIds = scala.collection.mutable.Set[String]()
    }
    private val bqTables = new CTrieMap[String, BqTable]()
    private val bqJobs = new CTrieMap[String, (Vector[(String, String)], Vector[Vector[Any]])]()

    /** fixture-side DDL: register an empty table with a typed schema
      * (types: STRING | INT64 | FLOAT64 | BOOL) */
    def createBqTable(fqTable: String, schema: Seq[(String, String)]): Unit =
      bqTables.putIfAbsent(fqTable, new BqTable(schema.toVector))
    def bqRowCount(fqTable: String): Int =
      bqTables.get(fqTable).map(t => t.synchronized(t.rows.size)).getOrElse(0)
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def tokenUri: String = s"$endpoint/token"

    def createTopic(name: String): Unit =
      topics.putIfAbsent(name, new java.util.concurrent.ConcurrentLinkedQueue[PsMsg]())
    def createSubscription(name: String, topic: String): Unit = subs.putIfAbsent(name, topic)
    def objectCount(bucket: String): Int = objects.keys.count(_._1 == bucket)
    def issuedTokens: Int = tokens.size

    private def json(status: Int, body: VectorMap[String, Any]): (Int, String, Array[Byte]) =
      (status, "application/json", Json.render(body).getBytes(UTF_8))
    private def err(status: Int, msg: String): (Int, String, Array[Byte]) =
      json(status, Json.obj("error" -> Json.obj("code" -> status.toLong, "message" -> msg)))

    private def handleToken(body: Array[Byte]): (Int, String, Array[Byte]) = {
      val form = new String(body, UTF_8).split('&').map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> URLDecoder.decode(v, "UTF-8")
      }.toMap
      if (!form.get("grant_type").contains("urn:ietf:params:oauth:grant-type:jwt-bearer"))
        return err(400, "unsupported grant_type")
      val assertion = form.getOrElse("assertion", return err(400, "missing assertion"))
      // verify the RS256 signature with the account's PUBLIC key
      val claimsJson = graft.functions.Crypto.parseJwtPk("RS256")(assertion, accountPublicKeyPem)
      if (claimsJson == null) return err(401, "invalid_grant: bad signature")
      val claims = Json.asObj(Json.parse(claimsJson))
      if (!Json.strOpt(claims, "iss").contains(account.clientEmail))
        return err(401, s"invalid_grant: unknown iss")
      if (!Json.strOpt(claims, "aud").contains(tokenUri))
        return err(401, "invalid_grant: aud mismatch")
      if (Json.long(claims, "exp") <= System.currentTimeMillis() / 1000)
        return err(401, "invalid_grant: assertion expired")
      val tok = s"ya29.${seq.incrementAndGet()}.${java.util.UUID.randomUUID().toString.take(8)}"
      tokens.put(tok, System.currentTimeMillis() + 3600 * 1000)
      json(200, Json.obj("access_token" -> tok, "expires_in" -> 3600L, "token_type" -> "Bearer"))
    }

    private def authorized(headers: Map[String, String]): Boolean =
      headers.get("authorization").filter(_.startsWith("Bearer ")).map(_.stripPrefix("Bearer "))
        .exists(t => tokens.get(t).exists(_ > System.currentTimeMillis()))

    // query params arrive URLEncoder-style ('+' means space); path
    // segments arrive uriEncode-style (every '+' is literal, spaces are
    // %20) — two different decoders, or "a+b.txt" round-trips wrong
    private def pctDecode(s: String): String = URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

    private def parseQuery(q: String): Map[String, String] =
      if (q == null || q.isEmpty) Map.empty
      else q.split('&').toSeq.map { p =>
        val i = p.indexOf('=')
        if (i < 0) (p, "") else (p.substring(0, i), URLDecoder.decode(p.substring(i + 1), "UTF-8"))
      }.toMap

    // ---- BigQuery: the restricted SQL shape input_bigquery_select.go
    //      generates (squirrel: SELECT cols FROM `t` WHERE ... ? ...),
    //      plus ORDER BY / LIMIT suffixes
    private val bqSelectRe =
      ("(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+`([^`]+)`" +
        "(?:\\s+WHERE\\s+(.+?))?(?:\\s+ORDER\\s+BY\\s+(\\w+)(\\s+DESC|\\s+ASC)?)?" +
        "(?:\\s+LIMIT\\s+(\\d+))?\\s*$").r
    private val bqCondRe = "(?s)^\\s*(\\w+)\\s*(=|!=|<>|<=|>=|<|>)\\s*\\?\\s*$".r

    private def bqNum(v: Any): Option[Double] = v match {
      case l: Long => Some(l.toDouble)
      case d: Double => Some(d)
      case i: Int => Some(i.toDouble)
      case _ => None
    }
    private def bqCompare(a: Any, b: Any): Int = (bqNum(a), bqNum(b)) match {
      case (Some(x), Some(y)) => x.compareTo(y)
      case _ => String.valueOf(a).compareTo(String.valueOf(b))
    }

    private def bqEval(sql: String, params: Vector[Any]): Either[String, (Vector[(String, String)], Vector[Vector[Any]])] =
      sql match {
        case bqSelectRe(colsS, table, whereS, orderCol, orderDir, limitS) =>
          bqTables.get(table) match {
            case None => Left(s"Not found: Table $table")
            case Some(t) =>
              val cols = colsS.split(',').map(_.trim).toVector
              val schemaIdx = t.schema.map(_._1).zipWithIndex.toMap
              val missing = cols.filterNot(schemaIdx.contains)
              if (missing.nonEmpty) return Left(s"Unrecognized name: ${missing.head}")
              val conds = Option(whereS).map(_.split("(?i)\\s+AND\\s+").toVector).getOrElse(Vector.empty)
              if (conds.size != params.size)
                return Left(s"expected ${conds.size} positional parameters, got ${params.size}")
              val tests: Vector[Vector[Any] => Boolean] = conds.zip(params).map {
                case (bqCondRe(col, op), arg) =>
                  val i = schemaIdx.getOrElse(col, return Left(s"Unrecognized name: $col"))
                  (row: Vector[Any]) => {
                    val c = bqCompare(row(i), arg)
                    op match {
                      case "=" => c == 0
                      case "!=" | "<>" => c != 0
                      case "<" => c < 0
                      case "<=" => c <= 0
                      case ">" => c > 0
                      case ">=" => c >= 0
                    }
                  }
                case (other, _) => return Left(s"unsupported condition: $other")
              }
              var rows = t.synchronized(t.rows.toVector).filter(r => tests.forall(_(r)))
              Option(orderCol).foreach { oc =>
                val i = schemaIdx.getOrElse(oc, return Left(s"Unrecognized name: $oc"))
                val asc = Option(orderDir).forall(!_.trim.equalsIgnoreCase("DESC"))
                rows = rows.sortWith((a, b) =>
                  if (asc) bqCompare(a(i), b(i)) < 0 else bqCompare(a(i), b(i)) > 0)
              }
              Option(limitS).foreach(l => rows = rows.take(l.toInt))
              val proj = cols.map(schemaIdx)
              Right((cols.map(c => t.schema(schemaIdx(c))), rows.map(r => proj.map(r))))
          }
        case _ => Left(s"unsupported query shape: $sql")
      }

    private def bqPage(jobId: String, schema: Vector[(String, String)],
                       rows: Vector[Vector[Any]], offset: Int, max: Int): VectorMap[String, Any] = {
      val page = rows.slice(offset, offset + max)
      var resp = Json.obj(
        "kind" -> "bigquery#queryResponse", "jobComplete" -> true,
        "jobReference" -> Json.obj("jobId" -> jobId),
        "schema" -> Json.obj("fields" -> schema.map { case (n, tpe) =>
          Json.obj("name" -> n, "type" -> tpe): Any }),
        "totalRows" -> rows.size.toString,
        "rows" -> page.map { r =>
          Json.obj("f" -> r.map(v => Json.obj("v" -> String.valueOf(v)): Any)): Any
        })
      if (offset + max < rows.size)
        resp = resp.updated("pageToken", (offset + max).toString)
      resp
    }

    private val publishRe = "/v1/projects/([^/]+)/topics/([^/:]+):publish".r
    private val pullRe = "/v1/projects/([^/]+)/subscriptions/([^/:]+):pull".r
    private val ackRe = "/v1/projects/([^/]+)/subscriptions/([^/:]+):acknowledge".r
    private val bqInsertAllRe = "/bigquery/v2/projects/([^/]+)/datasets/([^/]+)/tables/([^/]+)/insertAll".r
    private val bqQueryRe = "/bigquery/v2/projects/([^/]+)/queries".r
    private val bqQueryPageRe = "/bigquery/v2/projects/([^/]+)/queries/([^/]+)".r
    private val uploadRe = "/upload/storage/v1/b/([^/]+)/o".r
    private val objectRe = "/storage/v1/b/([^/]+)/o/(.+)".r
    private val listRe = "/storage/v1/b/([^/]+)/o".r

    private def handle(method: String, rawPath: String, rawQuery: String,
                       headers: Map[String, String], body: Array[Byte]): (Int, String, Array[Byte]) = {
      if (rawPath == "/token") return handleToken(body)
      if (!authorized(headers)) return err(401, "missing or expired Bearer token")
      val q = parseQuery(rawQuery)

      (method, rawPath) match {
        // ---------------- Pub/Sub
        case ("POST", publishRe(_, topic)) => topics.get(topic) match {
          case Some(queue) =>
            val msgs = Json.asArr(Json.asObj(Json.parse(new String(body, UTF_8)))("messages")).map(Json.asObj)
            val ids = msgs.map { m =>
              val id = s"ps-${seq.incrementAndGet()}"
              val attrs = m.get("attributes").map(a => Json.asObj(a).map {
                case (k, v) => k -> v.asInstanceOf[String] }.toMap).getOrElse(Map.empty[String, String])
              queue.add(new PsMsg(id,
                java.util.Base64.getDecoder.decode(Json.strOpt(m, "data").getOrElse("")),
                attrs, System.currentTimeMillis()))
              id: Any
            }
            json(200, Json.obj("messageIds" -> ids))
          case None => err(404, s"topic $topic not found")
        }

        case ("POST", pullRe(_, sub)) => subs.get(sub).flatMap(topics.get) match {
          case Some(queue) =>
            val max = Json.long(Json.asObj(Json.parse(new String(body, UTF_8))), "maxMessages", 10).toInt
            val now = System.currentTimeMillis()
            val picked = queue.toArray(Array.empty[PsMsg]).iterator
              .filter(m => !m.acked && m.leasedUntil <= now).take(max).toList
            picked.foreach { m =>
              m.leasedUntil = now + ackDeadlineMs
              m.deliveries += 1
              m.ackId = s"ack-${m.id}-${m.deliveries}"
            }
            json(200, Json.obj("receivedMessages" -> picked.toVector.map { m =>
              Json.obj("ackId" -> m.ackId, "deliveryAttempt" -> m.deliveries.toLong,
                "message" -> Json.obj(
                  "data" -> java.util.Base64.getEncoder.encodeToString(m.data),
                  "attributes" -> VectorMap(m.attrs.toSeq.map { case (k, v) => k -> (v: Any) }: _*),
                  "messageId" -> m.id,
                  "publishTime" -> java.time.Instant.ofEpochMilli(m.publishTs).toString)): Any
            }))
          case None => err(404, s"subscription $sub not found")
        }

        case ("POST", ackRe(_, sub)) => subs.get(sub).flatMap(topics.get) match {
          case Some(queue) =>
            val ids = Json.asArr(Json.asObj(Json.parse(new String(body, UTF_8)))("ackIds"))
              .map(_.asInstanceOf[String]).toSet
            queue.toArray(Array.empty[PsMsg]).foreach { m =>
              if (ids.contains(m.ackId)) m.acked = true // ackId must be CURRENT (expired leases rotate it)
            }
            json(200, Json.obj())
          case None => err(404, s"subscription $sub not found")
        }

        // ---------------- BigQuery (REST v2)
        // tabledata.insertAll — the streaming-insert API output_bigquery
        // rides (bigquery.Inserter); best-effort dedup on insertId
        case ("POST", bqInsertAllRe(project, dataset, tableName)) =>
          bqTables.get(s"$project.$dataset.$tableName") match {
            case None => err(404, s"Not found: Table $project.$dataset.$tableName")
            case Some(t) =>
              val rows = Json.asArr(Json.asObj(Json.parse(new String(body, UTF_8)))("rows")).map(Json.asObj)
              t.synchronized {
                rows.foreach { r =>
                  val dup = Json.strOpt(r, "insertId").exists(id => !t.insertIds.add(id))
                  if (!dup) {
                    val j = Json.asObj(r("json"))
                    t.rows += t.schema.map { case (col, tpe) =>
                      val v = j.getOrElse(col, null)
                      (tpe, v) match {
                        case (_, null) => null
                        case ("INT64", x: Long) => x
                        case ("INT64", x: Double) => x.toLong
                        case ("INT64", x: String) => x.toLong
                        case ("FLOAT64", x: Long) => x.toDouble
                        case ("FLOAT64", x: Double) => x
                        case ("FLOAT64", x: String) => x.toDouble
                        case ("BOOL", x: Boolean) => x
                        case (_, x) => String.valueOf(x)
                      }
                    }
                  }
                }
              }
              json(200, Json.obj("kind" -> "bigquery#tableDataInsertAllResponse"))
          }

        // jobs.query — the SELECT surface input_bigquery_select.go
        // generates (columns/table/where-with-?-params), first page
        case ("POST", bqQueryRe(_)) =>
          val req = Json.asObj(Json.parse(new String(body, UTF_8)))
          val sql = Json.str(req, "query")
          val maxResults = Json.long(req, "maxResults", 1000).toInt
          val params = req.get("queryParameters").map(Json.asArr).getOrElse(Vector.empty).map { p =>
            val pm = Json.asObj(p)
            val tpe = Json.str(Json.asObj(pm("parameterType")), "type")
            val v = Json.str(Json.asObj(pm("parameterValue")), "value")
            tpe match {
              case "INT64" => v.toLong
              case "FLOAT64" => v.toDouble
              case "BOOL" => (v.toBoolean: Any)
              case _ => v
            }
          }
          bqEval(sql, params.toVector) match {
            case Left(msg) => err(400, msg)
            case Right((schema, rows)) =>
              val jobId = s"job_${seq.incrementAndGet()}"
              bqJobs.put(jobId, (schema, rows))
              json(200, bqPage(jobId, schema, rows, 0, maxResults))
          }

        // jobs.getQueryResults — subsequent pages by pageToken offset
        case ("GET", bqQueryPageRe(_, jobId)) =>
          bqJobs.get(jobId) match {
            case None => err(404, s"Not found: Job $jobId")
            case Some((schema, rows)) =>
              val offset = q.getOrElse("pageToken", "0").toInt
              val max = q.get("maxResults").map(_.toInt).getOrElse(1000)
              json(200, bqPage(jobId, schema, rows, offset, max))
          }

        // ---------------- Cloud Storage (JSON API)
        case ("POST", uploadRe(bucket)) if q.get("uploadType").contains("media") =>
          val name = q.getOrElse("name", return err(400, "missing name"))
          objects.put((bucket, name),
            (body, headers.getOrElse("content-type", "application/octet-stream"), System.currentTimeMillis()))
          json(200, Json.obj("name" -> name, "bucket" -> bucket, "size" -> body.length.toString))

        case ("GET", objectRe(bucket, enc)) =>
          val name = pctDecode(enc)
          objects.get((bucket, name)) match {
            case Some((bytes, ct, updated)) =>
              if (q.get("alt").contains("media")) (200, ct, bytes)
              else json(200, Json.obj("name" -> name, "bucket" -> bucket,
                "size" -> bytes.length.toString, "contentType" -> ct,
                "updated" -> java.time.Instant.ofEpochMilli(updated).toString))
            case None => err(404, s"object $name not found")
          }

        case ("DELETE", objectRe(bucket, enc)) =>
          if (objects.remove((bucket, pctDecode(enc))).isDefined) (204, "application/json", Array.emptyByteArray)
          else err(404, "not found")

        case ("GET", listRe(bucket)) =>
          val prefix = q.getOrElse("prefix", "")
          val after = q.getOrElse("pageToken", "")
          val max = q.get("maxResults").map(_.toInt).getOrElse(1000)
          val all = objects.toSeq.collect {
            case ((b, n), (bytes, ct, up)) if b == bucket && n.startsWith(prefix) && n > after => (n, bytes, ct, up)
          }.sortBy(_._1)
          val page = all.take(max)
          var resp = Json.obj("items" -> page.toVector.map { case (n, bytes, ct, up) =>
            Json.obj("name" -> n, "size" -> bytes.length.toString, "contentType" -> ct,
              "updated" -> java.time.Instant.ofEpochMilli(up).toString): Any
          })
          if (all.size > max) resp = resp.updated("nextPageToken", page.last._1)
          json(200, resp)

        case _ => err(400, s"unhandled $method $rawPath")
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
        val (status, ct, respBody) = try handle(x.getRequestMethod, x.getRequestURI.getRawPath,
          Option(x.getRequestURI.getRawQuery).getOrElse(""), hdrs, body)
        catch { case e: Throwable => (500, "application/json",
          Json.render(Json.obj("error" -> Json.obj("message" -> String.valueOf(e.getMessage)))).getBytes(UTF_8)) }
        x.getResponseHeaders.add("Content-Type", ct)
        x.sendResponseHeaders(status, if (respBody.isEmpty) -1 else respBody.length.toLong)
        if (respBody.nonEmpty) x.getResponseBody.write(respBody)
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

  // --------------------------------------------------------- auth client
  /** one token per client, refreshed when near expiry — the documented
    * server-to-server flow */
  final class TokenSource(endpoint: String, sa: ServiceAccount, scope: String) {
    private val http = new Http
    @volatile private var token: String = _
    @volatile private var expiresAt: Long = 0

    def bearer(): String = {
      val now = System.currentTimeMillis()
      if (token == null || now > expiresAt - 60 * 1000) synchronized {
        if (token == null || now > expiresAt - 60 * 1000) {
          val iat = now / 1000
          val claims = Json.render(Json.obj("iss" -> sa.clientEmail, "scope" -> scope,
            "aud" -> s"$endpoint/token", "iat" -> iat, "exp" -> (iat + 3600)))
          val jwt = graft.functions.Crypto.signJwtPk("RS256")(claims, sa.privateKeyPem)
          val form = s"grant_type=${URLEncoder.encode("urn:ietf:params:oauth:grant-type:jwt-bearer", "UTF-8")}&assertion=${URLEncoder.encode(jwt, "UTF-8")}"
          val r = http.request("POST", s"$endpoint/token",
            Seq("content-type" -> "application/x-www-form-urlencoded"), form.getBytes(UTF_8))
          require(r.status == 200, s"token exchange: ${r.status} ${r.bodyStr}")
          val m = Json.asObj(Json.parse(r.bodyStr))
          token = Json.str(m, "access_token")
          expiresAt = now + Json.long(m, "expires_in") * 1000
        }
      }
      token
    }
  }

  final case class PulledMsg(ackId: String, messageId: String, data: Array[Byte],
                             attributes: Map[String, String], deliveryAttempt: Long)

  final class PubSubClient(endpoint: String, sa: ServiceAccount,
                           project: String = "graft") extends AutoCloseable {
    private val http = new Http
    private val tokens = new TokenSource(endpoint, sa, "https://www.googleapis.com/auth/pubsub")

    private def post(path: String, body: VectorMap[String, Any]): VectorMap[String, Any] = {
      val r = http.request("POST", s"$endpoint$path",
        Seq("content-type" -> "application/json", "authorization" -> s"Bearer ${tokens.bearer()}"),
        Json.render(body).getBytes(UTF_8))
      require(r.status == 200, s"$path: ${r.status} ${r.bodyStr}")
      Json.asObj(Json.parse(r.bodyStr))
    }

    def publish(topic: String, msgs: Seq[(Array[Byte], Map[String, String])]): Seq[String] =
      Json.asArr(post(s"/v1/projects/$project/topics/$topic:publish",
        Json.obj("messages" -> msgs.toVector.map { case (data, attrs) =>
          var m = Json.obj("data" -> java.util.Base64.getEncoder.encodeToString(data))
          if (attrs.nonEmpty) m = m.updated("attributes",
            VectorMap(attrs.toSeq.map { case (k, v) => k -> (v: Any) }: _*))
          m: Any
        }))("messageIds")).map(_.asInstanceOf[String])

    def pull(subscription: String, maxMessages: Int = 10): Seq[PulledMsg] =
      post(s"/v1/projects/$project/subscriptions/$subscription:pull",
        Json.obj("maxMessages" -> maxMessages.toLong)).get("receivedMessages") match {
        case Some(arr: Vector[Any @unchecked]) => arr.map { v =>
          val rm = Json.asObj(v)
          val m = Json.asObj(rm("message"))
          PulledMsg(Json.str(rm, "ackId"), Json.str(m, "messageId"),
            java.util.Base64.getDecoder.decode(Json.strOpt(m, "data").getOrElse("")),
            m.get("attributes").map(a => Json.asObj(a).map { case (k, av) =>
              k -> av.asInstanceOf[String] }.toMap).getOrElse(Map.empty),
            Json.long(rm, "deliveryAttempt", 1))
        }
        case _ => Nil
      }

    def acknowledge(subscription: String, ackIds: Seq[String]): Unit =
      if (ackIds.nonEmpty) {
        post(s"/v1/projects/$project/subscriptions/$subscription:acknowledge",
          Json.obj("ackIds" -> ackIds.toVector.map(a => a: Any))); ()
      }

    override def close(): Unit = http.close()
  }

  final class GcsClient(endpoint: String, sa: ServiceAccount) extends AutoCloseable {
    private val http = new Http
    private val tokens = new TokenSource(endpoint, sa, "https://www.googleapis.com/auth/devstorage.read_write")
    private def auth = "authorization" -> s"Bearer ${tokens.bearer()}"

    def insert(bucket: String, name: String, bytes: Array[Byte],
               contentType: String = "application/octet-stream"): Unit = {
      val r = http.request("POST",
        s"$endpoint/upload/storage/v1/b/$bucket/o?uploadType=media&name=${URLEncoder.encode(name, "UTF-8")}",
        Seq("content-type" -> contentType, auth), bytes)
      require(r.status == 200, s"insert $name: ${r.status} ${r.bodyStr}")
    }

    def get(bucket: String, name: String): Option[Array[Byte]] = {
      val r = http.request("GET",
        s"$endpoint/storage/v1/b/$bucket/o/${uriEncode(name, encodeSlash = true)}?alt=media",
        Seq(auth), Array.emptyByteArray)
      if (r.status == 404) None
      else { require(r.status == 200, s"get $name: ${r.status} ${r.bodyStr}"); Some(r.body) }
    }

    def delete(bucket: String, name: String): Boolean =
      http.request("DELETE", s"$endpoint/storage/v1/b/$bucket/o/${uriEncode(name, encodeSlash = true)}",
        Seq(auth), Array.emptyByteArray).status == 204

    def list(bucket: String, prefix: String = "", pageSize: Int = 1000): Seq[String] = {
      val out = Vector.newBuilder[String]
      var token = ""
      var more = true
      while (more) {
        val r = http.request("GET",
          s"$endpoint/storage/v1/b/$bucket/o?prefix=${URLEncoder.encode(prefix, "UTF-8")}&maxResults=$pageSize" +
            (if (token.nonEmpty) s"&pageToken=${URLEncoder.encode(token, "UTF-8")}" else ""),
          Seq(auth), Array.emptyByteArray)
        require(r.status == 200, s"list: ${r.status} ${r.bodyStr}")
        val m = Json.asObj(Json.parse(r.bodyStr))
        m.get("items").foreach(items =>
          Json.asArr(items).foreach(i => out += Json.str(Json.asObj(i), "name")))
        Json.strOpt(m, "nextPageToken") match {
          case Some(t) => token = t
          case None => more = false
        }
      }
      out.result()
    }
    override def close(): Unit = http.close()
  }

  /** BigQuery client (input_bigquery_select.go / processor_bigquery_
    * select.go build `SELECT cols FROM \`t\` WHERE ...?...` and stream
    * rows; output_bigquery.go streams inserts) over the public REST v2
    * surface: jobs.query with positional parameters + getQueryResults
    * paging, and tabledata.insertAll with insertId dedup. The reference
    * wraps cloud.google.com/go/bigquery. */
  final class BigQueryClient(endpoint: String, sa: ServiceAccount,
                             project: String = "graft") extends AutoCloseable {
    private val http = new Http
    private val tokens = new TokenSource(endpoint, sa, "https://www.googleapis.com/auth/bigquery")
    private def auth = "authorization" -> s"Bearer ${tokens.bearer()}"

    private def call(method: String, path: String, body: Array[Byte]): VectorMap[String, Any] = {
      val r = http.request(method, s"$endpoint$path",
        Seq("content-type" -> "application/json", auth), body)
      require(r.status == 200, s"$path: ${r.status} ${r.bodyStr}")
      Json.asObj(Json.parse(r.bodyStr))
    }

    /** streaming insert (tabledata.insertAll); rows are column->value */
    def insertAll(datasetTable: String, rows: Seq[VectorMap[String, Any]],
                  insertIdOf: VectorMap[String, Any] => Option[String] = _ => None): Unit = {
      val Array(dataset, table) = datasetTable.split('.')
      call("POST", s"/bigquery/v2/projects/$project/datasets/$dataset/tables/$table/insertAll",
        Json.render(Json.obj("rows" -> rows.toVector.map { r =>
          var entry = Json.obj("json" -> r)
          insertIdOf(r).foreach(id => entry = entry.updated("insertId", id))
          entry: Any
        })).getBytes(UTF_8)); ()
    }

    final case class QueryResult(columns: Vector[String], types: Vector[String],
                                 rows: Iterator[Vector[String]])

    /** jobs.query with positional ?-parameters; rows stream page by
      * page through getQueryResults — no call exceeds `pageSize` */
    def query(sql: String, params: Seq[Any] = Nil, pageSize: Int = 500): QueryResult = {
      val qps = params.toVector.map { p =>
        val tpe = p match {
          case _: Long | _: Int => "INT64"
          case _: Double => "FLOAT64"
          case _: Boolean => "BOOL"
          case _ => "STRING"
        }
        Json.obj("parameterType" -> Json.obj("type" -> tpe),
          "parameterValue" -> Json.obj("value" -> String.valueOf(p))): Any
      }
      var req = Json.obj("query" -> sql, "useLegacySql" -> false,
        "maxResults" -> pageSize.toLong)
      if (qps.nonEmpty) req = req.updated("parameterMode", "POSITIONAL")
        .updated("queryParameters", qps)
      val first = call("POST", s"/bigquery/v2/projects/$project/queries",
        Json.render(req).getBytes(UTF_8))
      val jobId = Json.str(Json.asObj(first("jobReference")), "jobId")
      val fields = Json.asArr(Json.asObj(first("schema"))("fields")).map(Json.asObj)
      def pageRows(resp: VectorMap[String, Any]): Vector[Vector[String]] =
        resp.get("rows").map(Json.asArr).getOrElse(Vector.empty).map { r =>
          Json.asArr(Json.asObj(r)("f")).map(f => Json.str(Json.asObj(f), "v"))
        }
      val rows = new Iterator[Vector[String]] {
        private var page = pageRows(first)
        private var token = Json.strOpt(first, "pageToken")
        private var i = 0
        def hasNext: Boolean = {
          if (i >= page.size && token.isDefined) {
            val resp = call("GET",
              s"/bigquery/v2/projects/$project/queries/$jobId?pageToken=${token.get}&maxResults=$pageSize",
              Array.emptyByteArray)
            page = pageRows(resp); token = Json.strOpt(resp, "pageToken"); i = 0
          }
          i < page.size
        }
        def next(): Vector[String] = { val r = page(i); i += 1; r }
      }
      QueryResult(fields.map(Json.str(_, "name")), fields.map(Json.str(_, "type")), rows)
    }

    override def close(): Unit = http.close()
  }

  /** cache_cloud_storage.go: the bucket as a KV resource. */
  final class GcsCache(endpoint: String, sa: ServiceAccount, bucket: String, prefix: String = "")
      extends graft.operators.CacheBackends.KvBackend {
    private val c = new GcsClient(endpoint, sa)
    def get(key: String): Option[Array[Byte]] = c.get(bucket, prefix + key)
    def set(key: String, value: Array[Byte], ttlMs: Long = 0): Unit = c.insert(bucket, prefix + key, value)
    def add(key: String, value: Array[Byte], ttlMs: Long = 0): Boolean =
      if (c.get(bucket, prefix + key).isDefined) false else { c.insert(bucket, prefix + key, value); true }
    def delete(key: String): Unit = { c.delete(bucket, prefix + key); () }
    override def close(): Unit = c.close()
  }
}
