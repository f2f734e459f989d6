package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}

import graft.conn.Aws.{Http, Json}

/** HDFS connector (impl/hdfs/input.go, output.go) over the PUBLIC
  * WebHDFS REST API, including its signature two-step write path: the
  * namenode answers `op=CREATE` / `op=OPEN` with a 307 redirect to a
  * datanode location and the client re-issues the request there — the
  * fixture plays both roles on one port and the client follows the
  * redirect explicitly (the JDK client never auto-follows 307 PUTs).
  * LISTSTATUS / GETFILESTATUS return the documented FileStatuses JSON.
  * The reference wraps github.com/colinmarc/hdfs (the native RPC
  * protocol); WebHDFS is the publicly documented REST equivalent of the
  * same surface.
  */
object Hdfs {

  final case class FileStatus(pathSuffix: String, length: Long, isDir: Boolean)

  // ------------------------------------------------------------- fixture
  final class MiniHdfs {
    private val files = new CTrieMap[String, Array[Byte]]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def fileCount: Int = files.size

    private def parseQuery(q: String): Map[String, String] =
      if (q == null || q.isEmpty) Map.empty
      else q.split('&').toSeq.map { p =>
        val i = p.indexOf('=')
        if (i < 0) (p, "") else (p.substring(0, i), p.substring(i + 1))
      }.toMap

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/webhdfs/v1", (x: com.sun.net.httpserver.HttpExchange) => {
        val body = x.getRequestBody.readAllBytes()
        val path = x.getRequestURI.getPath.stripPrefix("/webhdfs/v1")
        val q = parseQuery(x.getRequestURI.getRawQuery)
        val op = q.getOrElse("op", "").toUpperCase
        val atDatanode = q.contains("datanode")

        def respond(status: Int, headers: Seq[(String, String)], b: Array[Byte]): Unit = {
          headers.foreach { case (k, v) => x.getResponseHeaders.add(k, v) }
          x.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length.toLong)
          if (b.nonEmpty) x.getResponseBody.write(b)
          x.close()
        }
        def redirect(): Unit = respond(307, Seq("Location" ->
          s"$endpoint/webhdfs/v1$path?${x.getRequestURI.getRawQuery}&datanode=true"), Array.emptyByteArray)
        def jsonResp(status: Int, s: String): Unit =
          respond(status, Seq("Content-Type" -> "application/json"), s.getBytes(UTF_8))

        try (x.getRequestMethod, op) match {
          case ("PUT", "CREATE") if !atDatanode => redirect() // namenode step
          case ("PUT", "CREATE") =>
            val overwrite = q.get("overwrite").contains("true")
            if (!overwrite && files.contains(path))
              jsonResp(403, """{"RemoteException":{"exception":"FileAlreadyExistsException"}}""")
            else { files.put(path, body); respond(201, Nil, Array.emptyByteArray) }
          case ("POST", "APPEND") if !atDatanode => redirect()
          case ("POST", "APPEND") =>
            files.updateWith(path) { case Some(old) => Some(old ++ body); case None => Some(body) }
            respond(200, Nil, Array.emptyByteArray)
          case ("GET", "OPEN") if !atDatanode => redirect()
          case ("GET", "OPEN") => files.get(path) match {
            case Some(b) => respond(200, Seq("Content-Type" -> "application/octet-stream"), b)
            case None => jsonResp(404, """{"RemoteException":{"exception":"FileNotFoundException"}}""")
          }
          case ("GET", "LISTSTATUS") =>
            val prefix = if (path.endsWith("/")) path else path + "/"
            val entries = files.readOnlySnapshot().toSeq
              .filter(_._1.startsWith(prefix)).sortBy(_._1)
              .map { case (p, b) =>
                s"""{"pathSuffix":"${p.stripPrefix(prefix)}","type":"FILE","length":${b.length}}"""
              }
            jsonResp(200, s"""{"FileStatuses":{"FileStatus":[${entries.mkString(",")}]}}""")
          case ("GET", "GETFILESTATUS") => files.get(path) match {
            case Some(b) => jsonResp(200,
              s"""{"FileStatus":{"pathSuffix":"","type":"FILE","length":${b.length}}}""")
            case None => jsonResp(404, """{"RemoteException":{"exception":"FileNotFoundException"}}""")
          }
          case ("DELETE", "DELETE") =>
            jsonResp(200, s"""{"boolean":${files.remove(path).isDefined}}""")
          case (m, o) => jsonResp(400,
            s"""{"RemoteException":{"exception":"UnsupportedOperationException","message":"$m $o"}}""")
        } catch { case e: Throwable =>
          jsonResp(500, s"""{"RemoteException":{"message":"${e.getMessage}"}}""")
        }
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(32,
        (r: Runnable) => { val th = new Thread(r); th.setDaemon(true); th }))
      val starter = new Thread(() => server.start())
      starter.setDaemon(true); starter.start(); starter.join()
      this
    }
    def stop(): Unit = if (server != null) server.stop(0)
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String) extends AutoCloseable {
    private val http = new Http

    /** the documented two-step write: namenode 307 → datanode PUT */
    private def twoStep(method: String, url: String, body: Array[Byte]): Aws.HttpResp = {
      val first = http.request(method, url, Nil, Array.emptyByteArray)
      require(first.status == 307, s"expected namenode redirect, got ${first.status} ${first.bodyStr}")
      val loc = first.header("location").getOrElse(
        throw new IllegalArgumentException("redirect without Location"))
      http.request(method, loc, Nil, body)
    }

    def create(path: String, bytes: Array[Byte], overwrite: Boolean = true): Unit = {
      val r = twoStep("PUT", s"$endpoint/webhdfs/v1$path?op=CREATE&overwrite=$overwrite", bytes)
      require(r.status == 201, s"CREATE $path: ${r.status} ${r.bodyStr}")
    }
    def append(path: String, bytes: Array[Byte]): Unit = {
      val r = twoStep("POST", s"$endpoint/webhdfs/v1$path?op=APPEND", bytes)
      require(r.status == 200, s"APPEND $path: ${r.status} ${r.bodyStr}")
    }
    def open(path: String): Option[Array[Byte]] = {
      val first = http.request("GET", s"$endpoint/webhdfs/v1$path?op=OPEN", Nil, Array.emptyByteArray)
      if (first.status == 404) return None
      require(first.status == 307, s"OPEN $path: ${first.status}")
      val r = http.request("GET", first.header("location").get, Nil, Array.emptyByteArray)
      if (r.status == 404) None
      else { require(r.status == 200, s"OPEN $path: ${r.status}"); Some(r.body) }
    }
    def listStatus(dir: String): Seq[FileStatus] = {
      val r = http.request("GET", s"$endpoint/webhdfs/v1$dir?op=LISTSTATUS", Nil, Array.emptyByteArray)
      require(r.status == 200, s"LISTSTATUS $dir: ${r.status} ${r.bodyStr}")
      Json.asArr(Json.asObj(Json.asObj(Json.parse(r.bodyStr))("FileStatuses"))("FileStatus"))
        .map { f =>
          val m = Json.asObj(f)
          FileStatus(Json.str(m, "pathSuffix"), Json.long(m, "length"),
            Json.str(m, "type") == "DIRECTORY")
        }
    }
    def delete(path: String): Boolean = {
      val r = http.request("DELETE", s"$endpoint/webhdfs/v1$path?op=DELETE", Nil, Array.emptyByteArray)
      require(r.status == 200, s"DELETE $path: ${r.status}")
      Json.asObj(Json.parse(r.bodyStr))("boolean").asInstanceOf[Boolean]
    }
    override def close(): Unit = http.close()
  }
}
