package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap

import graft.conn.Aws.{Http, Json}

/** Elasticsearch/OpenSearch output + search processor
  * (internal/impl/elasticsearch/output.go, processor.go;
  * impl/opensearch/output.go) over the PUBLIC REST API: the `_bulk`
  * NDJSON endpoint with per-message `index` / `create` / `update` /
  * `delete` actions and interpolated `_index` / `_id` (output.go:145-156),
  * per-item status in the response (`errors` flag + `items`), plus
  * `_search` with `term` / `match_all` queries and `_doc` lookups.
  * The reference wraps the official Go clients; the REST shapes here
  * come from the public API docs.
  */
object Elastic {

  sealed trait BulkOp { def index: String; def id: String }
  final case class IndexOp(index: String, id: String, doc: VectorMap[String, Any]) extends BulkOp
  final case class CreateOp(index: String, id: String, doc: VectorMap[String, Any]) extends BulkOp
  final case class UpdateOp(index: String, id: String, doc: VectorMap[String, Any]) extends BulkOp
  final case class DeleteOp(index: String, id: String) extends BulkOp

  // ------------------------------------------------------------- fixture
  /** In-memory cluster: indices created dynamically on first write
    * (output.go:137 "created with a dynamic mapping"). */
  final class MiniElastic {
    private val indices = new CTrieMap[String, CTrieMap[String, VectorMap[String, Any]]]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def docCount(index: String): Int = indices.get(index).map(_.size).getOrElse(0)

    private def idx(name: String) = indices.getOrElseUpdate(name, new CTrieMap[String, VectorMap[String, Any]]())

    private def json(status: Int, body: VectorMap[String, Any]): (Int, Array[Byte]) =
      (status, Json.render(body).getBytes(UTF_8))

    private def handleBulk(body: String): (Int, Array[Byte]) = {
      val lines = body.split('\n').filter(_.nonEmpty)
      val items = Vector.newBuilder[Any]
      var errors = false
      var i = 0
      while (i < lines.length) {
        val action = Json.asObj(Json.parse(lines(i)))
        val (verb, meta) = action.head match {
          case (v, m: VectorMap[String @unchecked, Any @unchecked]) => (v, m)
          case other => throw new IllegalArgumentException(s"bad action $other")
        }
        val index = Json.str(meta, "_index")
        val id = Json.str(meta, "_id")
        val docs = idx(index)
        def item(status: Int, result: String, extra: (String, Any)*): Unit =
          items += Json.obj(verb -> (Json.obj(Seq[(String, Any)]("_index" -> index, "_id" -> id,
            "status" -> status.toLong, "result" -> result) ++ extra: _*)))
        verb match {
          case "index" =>
            i += 1
            val existed = docs.put(id, Json.asObj(Json.parse(lines(i)))).isDefined
            item(if (existed) 200 else 201, if (existed) "updated" else "created")
          case "create" =>
            i += 1
            val doc = Json.asObj(Json.parse(lines(i)))
            if (docs.putIfAbsent(id, doc).isDefined) {
              errors = true
              item(409, "version_conflict",
                "error" -> Json.obj("type" -> "version_conflict_engine_exception"))
            } else item(201, "created")
          case "update" =>
            i += 1
            val patch = Json.asObj(Json.asObj(Json.parse(lines(i)))("doc"))
            docs.get(id) match {
              case Some(old) => docs.put(id, old ++ patch); item(200, "updated")
              case None =>
                errors = true
                item(404, "not_found", "error" -> Json.obj("type" -> "document_missing_exception"))
            }
          case "delete" =>
            val existed = docs.remove(id).isDefined
            item(if (existed) 200 else 404, if (existed) "deleted" else "not_found")
          case other => throw new IllegalArgumentException(s"unknown bulk action $other")
        }
        i += 1
      }
      json(200, Json.obj("took" -> 1L, "errors" -> errors, "items" -> items.result()))
    }

    private def matchesTerm(doc: VectorMap[String, Any], field: String, value: Any): Boolean =
      doc.get(field).exists {
        case l: Long => value match { case v: Long => l == v; case v: Double => l.toDouble == v; case v => v == l }
        case d: Double => value match { case v: Long => d == v.toDouble; case v: Double => d == v; case v => v == d }
        case x => x == value
      }

    /** the server-side slice routing (the public sliced-scroll contract:
      * documents are partitioned by a hash of _id modulo `max`) */
    private[Elastic] def sliceOf(id: String, max: Int): Int = {
      val h = scala.util.hashing.MurmurHash3.stringHash(id)
      ((h % max) + max) % max
    }

    private def handleSearch(index: String, body: String): (Int, Array[Byte]) = {
      // readOnlySnapshot is an O(1) immutable view — no .toMap: paged
      // sliced reads hit this endpoint once per page, and copying the
      // whole index per page call would scale with index × pages
      val docs: scala.collection.Map[String, VectorMap[String, Any]] =
        indices.get(index).map(_.readOnlySnapshot()).getOrElse(scala.collection.Map.empty)
      val req = if (body.isEmpty) VectorMap.empty[String, Any] else Json.asObj(Json.parse(body))
      val size = Json.long(req, "size", 10).toInt
      val termPred: ((String, VectorMap[String, Any])) => Boolean =
        req.get("query").map(Json.asObj) match {
          case Some(q) if q.contains("term") =>
            val (field, spec) = Json.asObj(q("term")).head
            val value = spec match {
              case m: VectorMap[String @unchecked, Any @unchecked] => m("value")
              case v => v
            }
            kv => matchesTerm(kv._2, field, value)
          case _ => _ => true // match_all
        }
      // slice: {id, max} — the sliced-scroll partition (one per reader)
      val slicePred: String => Boolean = req.get("slice").map(Json.asObj) match {
        case Some(sl) =>
          val sid = Json.long(sl, "id").toInt
          val max = Json.long(sl, "max").toInt
          require(max > 1 && sid >= 0 && sid < max, s"bad slice $sid/$max")
          id => sliceOf(id, max) == sid
        case None => _ => true
      }
      // search_after on the _id sort order — keyset pagination
      val after = req.get("searchAfter").orElse(req.get("search_after"))
        .map(Json.asArr(_).head.toString)
      val afterPred: String => Boolean = after match {
        case Some(a) => id => id > a
        case None => _ => true
      }
      val sorted = docs.iterator
        .filter(kv => slicePred(kv._1) && afterPred(kv._1) && termPred(kv))
        .toSeq.sortBy(_._1)
      json(200, Json.obj(
        "took" -> 1L,
        "hits" -> Json.obj(
          "total" -> Json.obj("value" -> sorted.size.toLong, "relation" -> "eq"),
          "hits" -> sorted.take(size).toVector.map { case (id, d) =>
            Json.obj("_index" -> index, "_id" -> id, "_source" -> d,
              "sort" -> Vector[Any](id)): Any
          })))
    }

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        val body = new String(x.getRequestBody.readAllBytes(), UTF_8)
        val path = x.getRequestURI.getPath
        val (status, resp) = try {
          val searchRe = "/([^/]+)/_search".r
          val docRe = "/([^/]+)/_doc/([^/]+)".r
          (x.getRequestMethod, path) match {
            case ("POST" | "PUT", "/_bulk") => handleBulk(body)
            case ("POST" | "GET", searchRe(index)) => handleSearch(index, body)
            case ("GET", docRe(index, id)) =>
              indices.get(index).flatMap(_.get(id)) match {
                case Some(d) => json(200, Json.obj("_index" -> index, "_id" -> id,
                  "found" -> true, "_source" -> d))
                case None => json(404, Json.obj("_index" -> index, "_id" -> id, "found" -> false))
              }
            case _ => json(400, Json.obj("error" -> s"unhandled ${x.getRequestMethod} $path"))
          }
        } catch { case e: Throwable => json(500, Json.obj("error" -> String.valueOf(e.getMessage))) }
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(status, if (resp.isEmpty) -1 else resp.length.toLong)
        if (resp.nonEmpty) x.getResponseBody.write(resp)
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

  // -------------------------------------------------------------- client
  final case class BulkItemResult(action: String, id: String, status: Long, result: String)
  final case class BulkResult(errors: Boolean, items: Seq[BulkItemResult])
  final case class Hit(id: String, source: VectorMap[String, Any])

  final class Client(endpoint: String) extends AutoCloseable {
    private val http = new Http

    /** one `_bulk` call; output.go batches per message batch the same way */
    def bulk(ops: Seq[BulkOp]): BulkResult = {
      val nd = new StringBuilder
      ops.foreach { op =>
        val (verb, doc) = op match {
          case IndexOp(_, _, d) => ("index", Some(d))
          case CreateOp(_, _, d) => ("create", Some(d))
          case UpdateOp(_, _, d) => ("update", Some(Json.obj("doc" -> d)))
          case DeleteOp(_, _) => ("delete", None)
        }
        nd.append(Json.render(Json.obj(verb -> Json.obj("_index" -> op.index, "_id" -> op.id)))).append('\n')
        doc.foreach(d => nd.append(Json.render(d)).append('\n'))
      }
      val r = http.request("POST", s"$endpoint/_bulk",
        Seq("content-type" -> "application/x-ndjson"), nd.toString.getBytes(UTF_8))
      require(r.status == 200, s"_bulk: ${r.status} ${r.bodyStr}")
      val m = Json.asObj(Json.parse(r.bodyStr))
      BulkResult(m("errors").asInstanceOf[Boolean],
        Json.asArr(m("items")).map { it =>
          val (action, res) = Json.asObj(it).head
          val rm = Json.asObj(res)
          BulkItemResult(action, Json.str(rm, "_id"), Json.long(rm, "status"), Json.str(rm, "result"))
        })
    }

    def search(index: String, term: Option[(String, Any)] = None, size: Int = 10): Seq[Hit] =
      searchPage(index, slice = None, after = None, size = size, term = term)

    /** one bounded page of a (possibly sliced) search — the building
      * block of the distributed read. `slice = (id, max)` is the public
      * sliced-scroll partition; `after` is keyset pagination on the _id
      * sort. No call ever asks the cluster for more than `size` docs. */
    def searchPage(index: String, slice: Option[(Int, Int)] = None,
                   after: Option[String] = None, size: Int = 500,
                   term: Option[(String, Any)] = None): Seq[Hit] = {
      var q = Json.obj("size" -> size.toLong)
      term.foreach { case (f, v) =>
        q = q.updated("query", Json.obj("term" -> Json.obj(f -> v)))
      }
      slice.foreach { case (sid, max) =>
        q = q.updated("slice", Json.obj("id" -> sid.toLong, "max" -> max.toLong))
      }
      after.foreach(a => q = q.updated("search_after", Vector[Any](a)))
      val r = http.request("POST", s"$endpoint/$index/_search",
        Seq("content-type" -> "application/json"), Json.render(q).getBytes(UTF_8))
      require(r.status == 200, s"_search: ${r.status} ${r.bodyStr}")
      Json.asArr(Json.asObj(Json.asObj(Json.parse(r.bodyStr))("hits"))("hits")).map { h =>
        val hm = Json.asObj(h)
        Hit(Json.str(hm, "_id"), Json.asObj(hm("_source")))
      }
    }

    /** drain one slice page by page; each HTTP call is bounded by
      * `pageSize` — the per-task loop of the distributed input */
    def drainSlice(index: String, sliceId: Int, maxSlices: Int,
                   pageSize: Int = 500): Iterator[Hit] = new Iterator[Hit] {
      private var page: Seq[Hit] = searchPage(index,
        slice = Some((sliceId, maxSlices)), after = None, size = pageSize)
      private var i = 0
      def hasNext: Boolean = {
        if (i >= page.size && page.size == pageSize) { // page full: maybe more
          page = searchPage(index, slice = Some((sliceId, maxSlices)),
            after = Some(page.last.id), size = pageSize)
          i = 0
        }
        i < page.size
      }
      def next(): Hit = { val h = page(i); i += 1; h }
    }

    def getDoc(index: String, id: String): Option[VectorMap[String, Any]] = {
      val r = http.request("GET", s"$endpoint/$index/_doc/$id", Nil, Array.emptyByteArray)
      if (r.status == 404) None
      else {
        require(r.status == 200, s"_doc: ${r.status} ${r.bodyStr}")
        Some(Json.asObj(Json.asObj(Json.parse(r.bodyStr))("_source")))
      }
    }
    override def close(): Unit = http.close()
  }

  // ------------------------------------------------------ input operator
  /** Distributed index read (the scale path the reference's input gets
    * from the official client's sliced scroll): one Spark task per
    * slice, each draining its slice through bounded `search_after`
    * pages. No single search call ever exceeds `pageSize`, and nothing
    * index-sized crosses the driver. Columns: `_id`, `_source` (the
    * document as a JSON string — parse with from_json/get_json_object). */
  def input(spark: org.apache.spark.sql.SparkSession, endpoint: String, index: String,
            slices: Int = 8, pageSize: Int = 500): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    require(slices >= 2, "a sliced read needs >= 2 slices")
    val rdd = spark.sparkContext.parallelize(0 until slices, slices).mapPartitions { sliceIds =>
      sliceIds.flatMap { sid =>
        val c = new Client(endpoint)
        val hits = c.drainSlice(index, sid, slices, pageSize)
          .map(h => (h.id, Json.render(h.source)))
        new Iterator[(String, String)] { // close the client once drained
          def hasNext: Boolean = { val h = hits.hasNext; if (!h) c.close(); h }
          def next(): (String, String) = hits.next()
        }
      }
    }
    rdd.toDF("_id", "_source")
  }
}
