package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap

import graft.conn.Aws.{Http, Json}

/** Azure Cosmos DB (SQL API) for input_cosmosdb.go / output_cosmosdb.go
  * (the reference wraps azcosmos), over the PUBLIC REST surface:
  *
  *  - master-key auth exactly as documented ("Access control in the
  *    Azure Cosmos DB SQL API"): the string-to-sign
  *    `verb\nresourceType\nresourceLink\nx-ms-date\n\n` (all lowercase
  *    verb/date), HMAC-SHA256 under the base64-decoded key,
  *    `Authorization = urlencode("type=master&ver=1.0&sig=" + b64)`.
  *    The fixture recomputes and 401s mismatches.
  *  - document create (POST …/docs) with the partition key riding
  *    `x-ms-documentdb-partitionkey: ["v"]`, upsert via
  *    `x-ms-documentdb-is-upsert`, 409 on conflicting ids.
  *  - queries: POST with `x-ms-documentdb-isquery: true`, content type
  *    `application/query+json`, body `{"query": …, "parameters":
  *    [{"name":"@p","value":…}]}` — evaluated WITHIN one partition key
  *    (the reference input documents exactly that restriction:
  *    cross-partition queries unsupported, PartitionKey known in
  *    advance). Pages bound by `x-ms-max-item-count` and continue via
  *    `x-ms-continuation`.
  *
  * The SQL subset is the reference's own example shape:
  * `SELECT c.a, c.b | * FROM container AS c WHERE c.x = @p [AND …]`
  * with `= != < <= > >=` and string/number literals or @parameters.
  */
object Cosmos {

  final case class Account(endpointKeyB64: String)
  def testKey: String =
    java.util.Base64.getEncoder.encodeToString("graft-cosmos-master-key-material-000".getBytes(UTF_8))

  private val rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)

  /** the documented master-key token for one request */
  def authToken(keyB64: String, verb: String, resourceType: String,
                resourceLink: String, xMsDate: String): String = {
    val sts = s"${verb.toLowerCase}\n${resourceType.toLowerCase}\n$resourceLink\n${xMsDate.toLowerCase}\n\n"
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(java.util.Base64.getDecoder.decode(keyB64), "HmacSHA256"))
    val sig = java.util.Base64.getEncoder.encodeToString(mac.doFinal(sts.getBytes(UTF_8)))
    java.net.URLEncoder.encode(s"type=master&ver=1.0&sig=$sig", "UTF-8")
  }

  // ------------------------------------------------------------- fixture
  /** in-memory account: one database, containers keyed by name, docs
    * keyed (container, partitionKey, id) */
  final class MiniCosmos(masterKeyB64: String = testKey) {
    private val containers = new CTrieMap[String, Unit]()
    private val docs = new CTrieMap[(String, String, String), VectorMap[String, Any]]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def createContainer(name: String): Unit = containers.putIfAbsent(name, ())
    def docCount(container: String): Int = docs.keys.count(_._1 == container)

    private def json(status: Int, v: Any): (Int, Array[Byte]) =
      (status, Json.render(v).getBytes(UTF_8))
    private def err(status: Int, code: String): (Int, Array[Byte]) =
      json(status, Json.obj("code" -> code))

    // the reference's example query shape
    private val selectRe =
      ("(?is)^\\s*SELECT\\s+(.+?)\\s+FROM\\s+(\\w+)\\s+AS\\s+(\\w+)" +
        "(?:\\s+WHERE\\s+(.+?))?\\s*$").r
    private val condRe = "(?s)^\\s*(\\w+)\\.(\\w+)\\s*(=|!=|<=|>=|<|>)\\s*(.+?)\\s*$".r

    private def literal(raw: String, params: Map[String, Any]): Any =
      if (raw.startsWith("@")) params.getOrElse(raw,
        throw new IllegalArgumentException(s"missing parameter $raw"))
      else if (raw.startsWith("\"") && raw.endsWith("\"")) raw.substring(1, raw.length - 1)
      else if (raw.startsWith("'") && raw.endsWith("'")) raw.substring(1, raw.length - 1)
      else if (raw == "true") true else if (raw == "false") false
      else if (raw.contains('.')) raw.toDouble else raw.toLong

    private def num(v: Any): Option[Double] = v match {
      case l: Long => Some(l.toDouble); case d: Double => Some(d)
      case i: Int => Some(i.toDouble); case _ => None
    }
    private def cmp(a: Any, b: Any): Int = (num(a), num(b)) match {
      case (Some(x), Some(y)) => x.compareTo(y)
      case _ => String.valueOf(a).compareTo(String.valueOf(b))
    }

    private def evalQuery(container: String, pk: String, sql: String,
                          params: Map[String, Any]): Vector[VectorMap[String, Any]] =
      sql match {
        case selectRe(projS, from, binding, whereS) =>
          require(from == container, s"query FROM $from does not match container $container")
          val conds: Vector[VectorMap[String, Any] => Boolean] =
            Option(whereS).map(_.split("(?i)\\s+AND\\s+").toVector
              .map[VectorMap[String, Any] => Boolean] {
                case condRe(b, prop, op, raw) =>
                  require(b == binding, s"unknown binding $b")
                  val v = literal(raw, params)
                  (d: VectorMap[String, Any]) => d.get(prop).exists { x =>
                    val c = cmp(x, v)
                    op match {
                      case "=" => c == 0; case "!=" => c != 0
                      case "<" => c < 0; case "<=" => c <= 0
                      case ">" => c > 0; case ">=" => c >= 0
                    }
                  }
                case other => throw new IllegalArgumentException(s"bad condition: $other")
              }).getOrElse(Vector.empty)
          val hits = docs.toSeq.collect {
            case ((`container`, `pk`, id), d) => (id, d)
          }.sortBy(_._1).map(_._2).filter(d => conds.forall(_(d))).toVector
          val proj = projS.trim
          if (proj == "*") hits
          else {
            val items = proj.split(',').toVector.map { it =>
              val m = "(?s)^\\s*(\\w+)\\.(\\w+)\\s*$".r.findFirstMatchIn(it)
                .getOrElse(throw new IllegalArgumentException(s"bad projection: $it"))
              require(m.group(1) == binding, s"unknown binding ${m.group(1)}")
              m.group(2)
            }
            hits.map(d => VectorMap(items.flatMap(k => d.get(k).map(k -> _)): _*))
          }
        case other => throw new IllegalArgumentException(s"unsupported query: $other")
      }

    private val docsRe = "/dbs/([^/]+)/colls/([^/]+)/docs".r

    private def handle(method: String, path: String,
                       headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      // master-key verification against the documented string-to-sign;
      // resourceLink for /docs posts is the COLLECTION link
      val auth = headers.getOrElse("authorization", "")
      val date = headers.getOrElse("x-ms-date", "")
      val resourceLink = path.stripPrefix("/").stripSuffix("/docs")
      val want = authToken(masterKeyB64, method, "docs", resourceLink, date)
      if (auth != want) return (401, Nil,
        Json.render(Json.obj("code" -> "Unauthorized")).getBytes(UTF_8))

      val pk = headers.get("x-ms-documentdb-partitionkey")
        .map(v => Json.asArr(Json.parse(v)).head.toString).getOrElse("")

      (method, path) match {
        case ("POST", docsRe(_, coll)) if !containers.contains(coll) =>
          val (st, b) = err(404, "NotFound"); (st, Nil, b)
        case ("POST", docsRe(_, coll)) if headers.get("x-ms-documentdb-isquery").contains("true") =>
          val req = Json.asObj(Json.parse(new String(body, UTF_8)))
          val sql = Json.str(req, "query")
          val params = req.get("parameters").map(Json.asArr).getOrElse(Vector.empty).map { p =>
            val pm = Json.asObj(p); Json.str(pm, "name") -> pm("value")
          }.toMap
          try {
            val hits = evalQuery(coll, pk, sql, params)
            val max = headers.get("x-ms-max-item-count").map(_.toInt).getOrElse(1000)
            val offset = headers.get("x-ms-continuation").map(_.toInt).getOrElse(0)
            val page = hits.slice(offset, offset + max)
            val cont = if (offset + max < hits.size)
              Seq("x-ms-continuation" -> (offset + max).toString) else Nil
            val (st, b) = json(200, Json.obj("_count" -> page.size.toLong,
              "Documents" -> page.map(d => d: Any)))
            (st, cont, b)
          } catch { case e: IllegalArgumentException =>
            val (st, b) = err(400, String.valueOf(e.getMessage)); (st, Nil, b) }
        case ("POST", docsRe(_, coll)) => // document create / upsert
          val doc = Json.asObj(Json.parse(new String(body, UTF_8)))
          val id = Json.str(doc, "id")
          val upsert = headers.get("x-ms-documentdb-is-upsert").contains("true")
          val key = (coll, pk, id)
          if (upsert) { docs.put(key, doc); val (st, b) = json(200, doc); (st, Nil, b) }
          else if (docs.putIfAbsent(key, doc).isDefined) {
            val (st, b) = err(409, "Conflict"); (st, Nil, b)
          } else { val (st, b) = json(201, doc); (st, Nil, b) }
        case _ =>
          val (st, b) = err(400, s"unhandled $method $path"); (st, Nil, b)
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
        val (status, extra, resp) = try handle(x.getRequestMethod, x.getRequestURI.getPath, hdrs, body)
        catch { case e: Throwable => (500, Nil,
          Json.render(Json.obj("code" -> String.valueOf(e.getMessage))).getBytes(UTF_8)) }
        extra.foreach { case (k, v) => x.getResponseHeaders.add(k, v) }
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(status, if (resp.isEmpty) -1 else resp.length.toLong)
        if (resp.nonEmpty) x.getResponseBody.write(resp)
        x.close()
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
        (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))
      server.start()
      this
    }
    def stop(): Unit = if (server != null) server.stop(0)
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, db: String = "graft",
                     masterKeyB64: String = testKey) extends AutoCloseable {
    private val http = new Http

    private def call(verb: String, coll: String, extraHeaders: Seq[(String, String)],
                     body: Array[Byte]): Aws.HttpResp = {
      val date = rfc1123.format(Instant.now()).toLowerCase
      val link = s"dbs/$db/colls/$coll"
      http.request(verb, s"$endpoint/$link/docs",
        Seq("x-ms-date" -> date, "x-ms-version" -> "2018-12-31",
          "authorization" -> authToken(masterKeyB64, verb, "docs", link, date)) ++ extraHeaders,
        body)
    }

    private def pkHeader(pk: String) =
      "x-ms-documentdb-partitionkey" -> Json.render(Vector[Any](pk))

    /** output_cosmosdb.go Create; Conflict → false */
    def create(coll: String, pk: String, doc: VectorMap[String, Any]): Boolean = {
      val r = call("POST", coll, Seq(pkHeader(pk), "content-type" -> "application/json"),
        Json.render(doc).getBytes(UTF_8))
      if (r.status == 409) false
      else { require(r.status == 201, s"create: ${r.status} ${r.bodyStr}"); true }
    }

    def upsert(coll: String, pk: String, doc: VectorMap[String, Any]): Unit = {
      val r = call("POST", coll, Seq(pkHeader(pk), "content-type" -> "application/json",
        "x-ms-documentdb-is-upsert" -> "true"), Json.render(doc).getBytes(UTF_8))
      require(r.status == 200 || r.status == 201, s"upsert: ${r.status} ${r.bodyStr}")
    }

    /** the input's parameterized per-partition-key query; pages bound
      * by maxItemCount and followed via x-ms-continuation */
    def query(coll: String, pk: String, sql: String,
              params: Map[String, Any] = Map.empty,
              maxItemCount: Int = 100): Vector[VectorMap[String, Any]] = {
      val out = Vector.newBuilder[VectorMap[String, Any]]
      var cont: Option[String] = None
      var more = true
      while (more) {
        val req = Json.obj("query" -> sql,
          "parameters" -> params.toVector.map { case (k, v) =>
            Json.obj("name" -> k, "value" -> v): Any })
        val r = call("POST", coll, Seq(pkHeader(pk),
          "content-type" -> "application/query+json",
          "x-ms-documentdb-isquery" -> "true",
          "x-ms-max-item-count" -> maxItemCount.toString) ++
          cont.map("x-ms-continuation" -> _), Json.render(req).getBytes(UTF_8))
        require(r.status == 200, s"query: ${r.status} ${r.bodyStr}")
        Json.asArr(Json.asObj(Json.parse(r.bodyStr))("Documents"))
          .foreach(d => out += Json.asObj(d))
        cont = r.header("x-ms-continuation")
        more = cont.isDefined
      }
      out.result()
    }

    override def close(): Unit = http.close()
  }
}
