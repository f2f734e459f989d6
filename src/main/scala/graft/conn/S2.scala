package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap
import scala.collection.mutable.ArrayBuffer

import graft.conn.Aws.{Http, Json}

/** S2 (s2.dev) streams for the s2 input/output
  * (internal/impl/s2/{input,output}.go — the reference wraps
  * s2-sdk-go), over the service's PUBLIC REST shape: Bearer-token auth,
  * append-only streams in a basin with strictly increasing sequence
  * numbers, batch appends returning the assigned [start, end) seq-num
  * window, seq-num-cursored reads in bounded pages, stream listing by
  * prefix (the reference input's "streams: my-favorite-prefix/" mode),
  * and `tail` giving the next seq num to be assigned — the resume
  * cursor the reference checkpoints in its seq-num cache.
  */
object S2 {

  final case class Record(seqNum: Long, body: String, headers: Vector[(String, String)])
  final case class AppendAck(startSeqNum: Long, endSeqNum: Long)

  // ------------------------------------------------------------- fixture
  /** one basin: streams created on first append, token-gated */
  final class MiniS2(token: String) {
    private val streams = new CTrieMap[String, ArrayBuffer[Record]]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def streamLen(stream: String): Int =
      streams.get(stream).map(s => s.synchronized(s.size)).getOrElse(0)

    private def stream(n: String) = streams.getOrElseUpdate(n, new ArrayBuffer[Record]())

    private def json(status: Int, v: Any): (Int, Array[Byte]) =
      (status, Json.render(v).getBytes(UTF_8))

    private def recordJson(r: Record): VectorMap[String, Any] =
      Json.obj("seq_num" -> r.seqNum, "body" -> r.body,
        "headers" -> r.headers.map { case (k, v) => Vector[Any](k, v): Any })

    private val recordsRe = "/v1/streams/(.+)/records".r

    private def handle(method: String, path: String, query: Map[String, String],
                       headers: Map[String, String], body: Array[Byte]): (Int, Array[Byte]) = {
      if (!headers.get("authorization").contains(s"Bearer $token"))
        return json(401, Json.obj("error" -> "unauthenticated"))
      (method, path) match {
        case ("POST", recordsRe(name)) => // batch append
          val req = Json.asObj(Json.parse(new String(body, UTF_8)))
          val recs = Json.asArr(req("records")).map(Json.asObj)
          val st = stream(name)
          st.synchronized {
            val start = st.size.toLong
            recs.foreach { r =>
              val hdrs = r.get("headers").map(Json.asArr).getOrElse(Vector.empty).map { h =>
                val p = Json.asArr(h); (p(0).toString, p(1).toString)
              }
              st += Record(st.size.toLong, Json.str(r, "body"), hdrs.toVector)
            }
            json(200, Json.obj("start_seq_num" -> start, "end_seq_num" -> st.size.toLong))
          }
        case ("GET", recordsRe(name)) => // cursored read, bounded page
          val st = streams.getOrElse(name, return json(404, Json.obj("error" -> "stream not found")))
          val from = query.getOrElse("seq_num", "0").toLong
          val count = query.get("count").map(_.toInt).getOrElse(100)
          val page = st.synchronized(st.slice(from.toInt, from.toInt + count).toVector)
          json(200, Json.obj("batch" -> Json.obj(
            "records" -> page.map(recordJson(_): Any))))
        case ("GET", "/v1/streams") => // list, optionally by prefix
          val prefix = query.getOrElse("prefix", "")
          json(200, Json.obj("streams" -> streams.keys.toVector.sorted
            .filter(_.startsWith(prefix)).map(n => Json.obj("name" -> n): Any)))
        case ("GET", p) if p.endsWith("/tail") && p.startsWith("/v1/streams/") =>
          val name = p.stripPrefix("/v1/streams/").stripSuffix("/tail")
          json(200, Json.obj("next_seq_num" -> streamLen(name).toLong))
        case _ => json(400, Json.obj("error" -> s"unhandled $method $path"))
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
        val q = Option(x.getRequestURI.getQuery).getOrElse("").split('&').filter(_.nonEmpty)
          .map { p => val i = p.indexOf('=')
            if (i < 0) (p, "") else (p.substring(0, i),
              java.net.URLDecoder.decode(p.substring(i + 1), "UTF-8")) }.toMap
        val (status, resp) = try handle(x.getRequestMethod,
          java.net.URLDecoder.decode(x.getRequestURI.getRawPath, "UTF-8"), q, hdrs, body)
        catch { case e: Throwable =>
          (500, Json.render(Json.obj("error" -> String.valueOf(e.getMessage))).getBytes(UTF_8)) }
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
  final class Client(endpoint: String, token: String) extends AutoCloseable {
    private val http = new Http
    private def auth = "authorization" -> s"Bearer $token"
    private def enc(s: String) = java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

    /** batch append; the ack's [start, end) is the assigned window */
    def append(stream: String, records: Seq[(String, Vector[(String, String)])]): AppendAck = {
      val body = Json.render(Json.obj("records" -> records.toVector.map { case (b, hs) =>
        var r = Json.obj("body" -> b)
        if (hs.nonEmpty) r = r.updated("headers", hs.map { case (k, v) => Vector[Any](k, v): Any })
        r: Any
      })).getBytes(UTF_8)
      val r = http.request("POST", s"$endpoint/v1/streams/${enc(stream)}/records",
        Seq("content-type" -> "application/json", auth), body)
      require(r.status == 200, s"append: ${r.status} ${r.bodyStr}")
      val m = Json.asObj(Json.parse(r.bodyStr))
      AppendAck(Json.long(m, "start_seq_num"), Json.long(m, "end_seq_num"))
    }

    /** one bounded page from the seq-num cursor */
    def read(stream: String, seqNum: Long, count: Int = 100): Vector[Record] = {
      val r = http.request("GET",
        s"$endpoint/v1/streams/${enc(stream)}/records?seq_num=$seqNum&count=$count",
        Seq(auth), Array.emptyByteArray)
      require(r.status == 200, s"read: ${r.status} ${r.bodyStr}")
      Json.asArr(Json.asObj(Json.asObj(Json.parse(r.bodyStr))("batch"))("records")).map { rec =>
        val rm = Json.asObj(rec)
        S2.Record(Json.long(rm, "seq_num"), Json.str(rm, "body"),
          rm.get("headers").map(Json.asArr).getOrElse(Vector.empty).map { h =>
            val p = Json.asArr(h); (p(0).toString, p(1).toString)
          }.toVector)
      }
    }

    /** drain a stream from a cursor, page by page */
    def readAll(stream: String, fromSeqNum: Long = 0L, pageSize: Int = 100): Vector[Record] = {
      val out = Vector.newBuilder[Record]
      var cursor = fromSeqNum
      var page = read(stream, cursor, pageSize)
      while (page.nonEmpty) {
        out ++= page
        cursor = page.last.seqNum + 1
        page = read(stream, cursor, pageSize)
      }
      out.result()
    }

    /** stream names, optionally by prefix (the input's prefix mode) */
    def listStreams(prefix: String = ""): Vector[String] = {
      val r = http.request("GET",
        s"$endpoint/v1/streams?prefix=${java.net.URLEncoder.encode(prefix, "UTF-8")}",
        Seq(auth), Array.emptyByteArray)
      require(r.status == 200, s"list: ${r.status} ${r.bodyStr}")
      Json.asArr(Json.asObj(Json.parse(r.bodyStr))("streams"))
        .map(s => Json.str(Json.asObj(s), "name"))
    }

    /** the next seq num to be assigned (the resume cursor) */
    def tail(stream: String): Long = {
      val r = http.request("GET", s"$endpoint/v1/streams/${enc(stream)}/tail",
        Seq(auth), Array.emptyByteArray)
      require(r.status == 200, s"tail: ${r.status} ${r.bodyStr}")
      Json.long(Json.asObj(Json.parse(r.bodyStr)), "next_seq_num")
    }

    override def close(): Unit = http.close()
  }
}
