package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.VectorMap
import scala.collection.mutable

import graft.conn.Aws.Json

/** kubernetes_watch input (internal/impl/kubernetes/input_watch.go —
  * the reference wraps client-go's dynamic informer machinery) over the
  * PUBLIC Kubernetes API conventions:
  *
  *  - `GET  /api/v1/namespaces/{ns}/{resource}` — list; the response's
  *    `metadata.resourceVersion` is the watch bookmark.
  *  - `GET  …/{resource}?watch=true&resourceVersion=N` — a long-lived
  *    CHUNKED response streaming one JSON object per line,
  *    `{"type":"ADDED|MODIFIED|DELETED","object":{…}}`, replaying
  *    history after N and then tailing live events (the etcd-backed
  *    apiserver serves any revision it retains; watches from a
  *    too-old version get 410 Gone).
  *  - `POST/PUT/DELETE …/{resource}[/name]` — writes; every write
  *    bumps the cluster resourceVersion.
  *  - `labelSelector=k=v,k2=v2` filters both list and watch.
  *  - every call carries `Authorization: Bearer <token>` (the
  *    service-account auth mode the reference's auto_auth resolves to).
  *
  * The watch stream crosses real chunked HTTP/1.1 framing — the
  * fixture flushes per event, the client reads the JDK stream
  * line-by-line — because the whole point of this input is the
  * long-poll chunked contract.
  */
object Kube {

  final case class WatchEvent(eventType: String, name: String, namespace: String,
                              resourceVersion: Long, labels: Map[String, String],
                              objectJson: String)

  private final case class Obj(name: String, namespace: String, resource: String,
                               labels: Map[String, String], spec: VectorMap[String, Any],
                               resourceVersion: Long, uid: String)

  private final case class Ev(tpe: String, obj: Obj, rv: Long)

  // ------------------------------------------------------------- fixture
  /** In-memory apiserver: one store + event history per (ns, resource),
    * a single cluster-wide resourceVersion, chunked watch streaming. */
  final class MiniKubeApiserver(token: String) {
    private val lock = new Object
    private val objs = mutable.LinkedHashMap[(String, String, String), Obj]() // (ns,res,name)
    private val history = mutable.ArrayBuffer[Ev]()
    private var rv = 0L
    private var uidSeq = 0L
    @volatile private var server: com.sun.net.httpserver.HttpServer = _

    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def currentResourceVersion: Long = lock.synchronized(rv)
    def count(ns: String, resource: String): Int =
      lock.synchronized(objs.keys.count(k => k._1 == ns && k._2 == resource))

    private def objJson(o: Obj, kind: String): VectorMap[String, Any] =
      Json.obj(
        "apiVersion" -> "v1", "kind" -> kind,
        "metadata" -> Json.obj(
          "name" -> o.name, "namespace" -> o.namespace, "uid" -> o.uid,
          "resourceVersion" -> o.resourceVersion.toString,
          "labels" -> VectorMap(o.labels.toSeq.sortBy(_._1).map { case (k, v) => k -> (v: Any) }: _*)),
        "spec" -> o.spec)

    private def kindOf(resource: String): String =
      resource.stripSuffix("s").capitalize // pods -> Pod, services -> Service

    private def matchesSelector(o: Obj, selector: Map[String, String]): Boolean =
      selector.forall { case (k, v) => o.labels.get(k).contains(v) }

    private def parseSelector(q: Map[String, String]): Map[String, String] =
      q.get("labelSelector").filter(_.nonEmpty).map(_.split(',').map { kv =>
        val i = kv.indexOf('='); kv.substring(0, i) -> kv.substring(i + 1)
      }.toMap).getOrElse(Map.empty)

    private def handleWrite(method: String, ns: String, resource: String,
                            nameInPath: String, body: Array[Byte]): (Int, VectorMap[String, Any]) =
      lock.synchronized {
        method match {
          case "POST" | "PUT" =>
            val m = Json.asObj(Json.parse(new String(body, UTF_8)))
            val meta = Json.asObj(m.getOrElse("metadata", Json.obj()))
            val name = if (nameInPath.nonEmpty) nameInPath else Json.str(meta, "name")
            val labels = meta.get("labels").map(Json.asObj(_).map {
              case (k, v) => k -> String.valueOf(v) }.toMap).getOrElse(Map.empty[String, String])
            val spec = m.get("spec").map(Json.asObj).getOrElse(VectorMap.empty[String, Any])
            val key = (ns, resource, name)
            val existed = objs.get(key)
            if (method == "POST" && existed.isDefined)
              return (409, Json.obj("kind" -> "Status", "code" -> 409L,
                "reason" -> "AlreadyExists", "message" -> s"$resource \"$name\" already exists"))
            if (method == "PUT" && existed.isEmpty)
              return (404, Json.obj("kind" -> "Status", "code" -> 404L,
                "reason" -> "NotFound", "message" -> s"$resource \"$name\" not found"))
            rv += 1
            val uid = existed.map(_.uid).getOrElse { uidSeq += 1; s"uid-$uidSeq" }
            val o = Obj(name, ns, resource, labels, spec, rv, uid)
            objs(key) = o
            history += Ev(if (existed.isDefined) "MODIFIED" else "ADDED", o, rv)
            lock.notifyAll()
            (if (existed.isDefined) 200 else 201, objJson(o, kindOf(resource)))
          case "DELETE" =>
            val key = (ns, resource, nameInPath)
            objs.remove(key) match {
              case None => (404, Json.obj("kind" -> "Status", "code" -> 404L,
                "reason" -> "NotFound", "message" -> s"$resource \"$nameInPath\" not found"))
              case Some(o) =>
                rv += 1
                val gone = o.copy(resourceVersion = rv)
                history += Ev("DELETED", gone, rv)
                lock.notifyAll()
                (200, objJson(gone, kindOf(resource)))
            }
          case other => (405, Json.obj("kind" -> "Status", "code" -> 405L,
            "message" -> s"method $other not allowed"))
        }
      }

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        try {
          val auth = Option(x.getRequestHeaders.getFirst("Authorization"))
          if (!auth.contains(s"Bearer $token")) {
            val body = Json.render(Json.obj("kind" -> "Status", "code" -> 401L,
              "message" -> "Unauthorized")).getBytes(UTF_8)
            x.getResponseHeaders.add("Content-Type", "application/json")
            x.sendResponseHeaders(401, body.length.toLong)
            x.getResponseBody.write(body); x.close()
          } else route(x)
        } catch { case _: Throwable => try x.close() catch { case _: Throwable => () } }
      })
      server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
        (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))
      server.start()
      this
    }

    private def route(x: com.sun.net.httpserver.HttpExchange): Unit = {
      val path = x.getRequestURI.getPath
      val q = Option(x.getRequestURI.getQuery).getOrElse("").split('&').filter(_.nonEmpty)
        .map { p => val i = p.indexOf('='); if (i < 0) (p, "") else
          (p.substring(0, i), java.net.URLDecoder.decode(p.substring(i + 1), "UTF-8")) }.toMap
      val collRe = "/api/v1/namespaces/([^/]+)/([^/]+)".r
      val itemRe = "/api/v1/namespaces/([^/]+)/([^/]+)/([^/]+)".r
      (x.getRequestMethod, path) match {
        case ("GET", collRe(ns, resource)) if q.get("watch").contains("true") =>
          serveWatch(x, ns, resource, q)
        case ("GET", collRe(ns, resource)) =>
          val selector = parseSelector(q)
          val (items, listRv) = lock.synchronized {
            (objs.values.filter(o => o.namespace == ns && o.resource == resource &&
              matchesSelector(o, selector)).toVector, rv)
          }
          respond(x, 200, Json.obj("apiVersion" -> "v1", "kind" -> s"${kindOf(resource)}List",
            "metadata" -> Json.obj("resourceVersion" -> listRv.toString),
            "items" -> items.map(o => objJson(o, kindOf(resource)): Any)))
        case ("POST", collRe(ns, resource)) =>
          val (st, body) = handleWrite("POST", ns, resource, "", x.getRequestBody.readAllBytes())
          respond(x, st, body)
        case ("PUT", itemRe(ns, resource, name)) =>
          val (st, body) = handleWrite("PUT", ns, resource, name, x.getRequestBody.readAllBytes())
          respond(x, st, body)
        case ("DELETE", itemRe(ns, resource, name)) =>
          val (st, body) = handleWrite("DELETE", ns, resource, name, Array.emptyByteArray)
          respond(x, st, body)
        case ("GET", itemRe(ns, resource, name)) =>
          lock.synchronized(objs.get((ns, resource, name))) match {
            case Some(o) => respond(x, 200, objJson(o, kindOf(resource)))
            case None => respond(x, 404, Json.obj("kind" -> "Status", "code" -> 404L,
              "reason" -> "NotFound", "message" -> s"$resource \"$name\" not found"))
          }
        case (m, p) => respond(x, 400, Json.obj("kind" -> "Status", "code" -> 400L,
          "message" -> s"unhandled $m $p"))
      }
    }

    private def respond(x: com.sun.net.httpserver.HttpExchange, status: Int,
                        body: VectorMap[String, Any]): Unit = {
      val bytes = Json.render(body).getBytes(UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(status, bytes.length.toLong)
      x.getResponseBody.write(bytes)
      x.close()
    }

    /** the chunked watch stream: length 0 → chunked transfer; one JSON
      * line per event, flushed, replay-then-tail from resourceVersion */
    private def serveWatch(x: com.sun.net.httpserver.HttpExchange, ns: String,
                           resource: String, q: Map[String, String]): Unit = {
      val selector = parseSelector(q)
      val fromRv = q.get("resourceVersion").map(_.toLong).getOrElse(
        lock.synchronized(rv)) // absent = from now (current state's horizon)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(200, 0L) // chunked
      val out = x.getResponseBody
      var idx = lock.synchronized(history.indexWhere(_.rv > fromRv) match {
        case -1 => history.size; case i => i
      })
      try while (true) { // until the client hangs up (IOException breaks)
        val ev = lock.synchronized {
          while (idx >= history.size) lock.wait(500)
          val e = history(idx); idx += 1; e
        }
        if (ev.obj.namespace == ns && ev.obj.resource == resource &&
            matchesSelector(ev.obj, selector)) {
          out.write(Json.render(Json.obj("type" -> ev.tpe,
            "object" -> objJson(ev.obj, kindOf(resource)))).getBytes(UTF_8))
          out.write('\n'); out.flush()
        }
      } catch { case _: java.io.IOException | _: InterruptedException => () }
      finally (try x.close() catch { case _: Throwable => () })
    }

    def stop(): Unit = if (server != null) server.stop(0)
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, token: String, namespace: String = "default")
      extends AutoCloseable {
    private val http = new Aws.Http
    private def auth = "authorization" -> s"Bearer $token"

    def create(resource: String, name: String, labels: Map[String, String],
               spec: VectorMap[String, Any]): Unit = {
      val body = Json.obj("apiVersion" -> "v1",
        "metadata" -> Json.obj("name" -> name,
          "labels" -> VectorMap(labels.toSeq.map { case (k, v) => k -> (v: Any) }: _*)),
        "spec" -> spec)
      val r = http.request("POST", s"$endpoint/api/v1/namespaces/$namespace/$resource",
        Seq("content-type" -> "application/json", auth), Json.render(body).getBytes(UTF_8))
      require(r.status == 201, s"create $name: ${r.status} ${r.bodyStr}")
    }

    def update(resource: String, name: String, labels: Map[String, String],
               spec: VectorMap[String, Any]): Unit = {
      val body = Json.obj("apiVersion" -> "v1",
        "metadata" -> Json.obj("name" -> name,
          "labels" -> VectorMap(labels.toSeq.map { case (k, v) => k -> (v: Any) }: _*)),
        "spec" -> spec)
      val r = http.request("PUT", s"$endpoint/api/v1/namespaces/$namespace/$resource/$name",
        Seq("content-type" -> "application/json", auth), Json.render(body).getBytes(UTF_8))
      require(r.status == 200, s"update $name: ${r.status} ${r.bodyStr}")
    }

    def delete(resource: String, name: String): Unit = {
      val r = http.request("DELETE", s"$endpoint/api/v1/namespaces/$namespace/$resource/$name",
        Seq(auth), Array.emptyByteArray)
      require(r.status == 200, s"delete $name: ${r.status} ${r.bodyStr}")
    }

    /** list; returns (items-as-json, listResourceVersion) */
    def list(resource: String, labelSelector: Map[String, String] = Map.empty): (Vector[String], Long) = {
      val sel = if (labelSelector.isEmpty) ""
        else "?labelSelector=" + java.net.URLEncoder.encode(
          labelSelector.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","), "UTF-8")
      val r = http.request("GET", s"$endpoint/api/v1/namespaces/$namespace/$resource$sel",
        Seq(auth), Array.emptyByteArray)
      require(r.status == 200, s"list $resource: ${r.status} ${r.bodyStr}")
      val m = Json.asObj(Json.parse(r.bodyStr))
      val rv = Json.str(Json.asObj(m("metadata")), "resourceVersion").toLong
      (Json.asArr(m("items")).map(Json.render), rv)
    }

    override def close(): Unit = http.close()
  }

  /** the streaming watch: a dedicated JDK http connection reading the
    * chunked body line by line (BodyHandlers.ofInputStream — the
    * long-poll contract needs a stream, not a buffered body) */
  final class Watch(endpoint: String, token: String, namespace: String,
                    resource: String, resourceVersion: Long,
                    labelSelector: Map[String, String] = Map.empty) extends AutoCloseable {
    private val client = java.net.http.HttpClient.newHttpClient()
    private val sel = if (labelSelector.isEmpty) ""
      else "&labelSelector=" + java.net.URLEncoder.encode(
        labelSelector.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(","), "UTF-8")
    private val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(
        s"$endpoint/api/v1/namespaces/$namespace/$resource?watch=true&resourceVersion=$resourceVersion$sel"))
      .header("Authorization", s"Bearer $token").GET().build()
    private val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    require(resp.statusCode() == 200, s"watch: ${resp.statusCode()}")
    private val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(resp.body(), UTF_8))

    /** next event, or None once idle past timeoutMs (caught up) */
    def next(timeoutMs: Long = 5000): Option[WatchEvent] = {
      // BufferedReader has no timed read; poll ready() against the deadline
      val deadline = System.currentTimeMillis() + timeoutMs
      while (!reader.ready() && System.currentTimeMillis() < deadline) Thread.sleep(10)
      if (!reader.ready()) return None
      val line = reader.readLine()
      if (line == null) return None
      val m = Json.asObj(Json.parse(line))
      val obj = Json.asObj(m("object"))
      val meta = Json.asObj(obj("metadata"))
      Some(WatchEvent(Json.str(m, "type"), Json.str(meta, "name"),
        Json.str(meta, "namespace"), Json.str(meta, "resourceVersion").toLong,
        meta.get("labels").map(Json.asObj(_).map { case (k, v) =>
          k -> String.valueOf(v) }.toMap).getOrElse(Map.empty),
        Json.render(obj)))
    }

    override def close(): Unit = try reader.close() catch { case _: Throwable => () }
  }
}
