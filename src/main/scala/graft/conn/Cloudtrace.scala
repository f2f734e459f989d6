package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.VectorMap

import graft.conn.Aws.Json

/** Google Cloud Trace tracer (impl/gcp/tracer_cloudtrace.go:24-110 —
  * the reference wires the opentelemetry-operations-go exporter into
  * an OTel BatchSpanProcessor) over the PUBLIC Cloud Trace v2 REST
  * surface: POST /v2/projects/{project}/traces:batchWrite with JSON
  * spans named `projects/P/traces/TRACE_ID/spans/SPAN_ID`, truncatable
  * displayName, RFC3339 start/end times, attributeMap values, and a
  * Bearer token (the OAuth2 JWT-bearer flow already implemented and
  * gated in conn/Gcp.scala — the fixture checks the presented token).
  *
  * Sampling carried from the reference config: ParentBased(
  * TraceIDRatioBased(ratio)) — the OTel convention keyed on the trace
  * id's upper 63 bits, so an entire trace samples in or out together
  * (children share the root's trace id). `tags` become resource-level
  * attributes stamped onto every exported span. */
object Cloudtrace {

  // ------------------------------------------------------------- fixture
  final case class TraceSpan(traceId: String, spanId: String, parentSpanId: String,
                             displayName: String, startTime: String, endTime: String,
                             attributes: Map[String, Any])

  final class MiniCloudTrace(expectedToken: String) {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, TraceSpan)]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def spans: Vector[(String, TraceSpan)] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toVector
    }

    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/", (x: com.sun.net.httpserver.HttpExchange) => {
        val path = x.getRequestURI.getPath
        val auth = Option(x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val (status, resp) =
          if (auth != s"Bearer $expectedToken") (401, """{"error":{"code":401}}""")
          else path match {
            case p if p.startsWith("/v2/projects/") && p.endsWith("/traces:batchWrite") =>
              val project = p.stripPrefix("/v2/projects/").stripSuffix("/traces:batchWrite")
              try {
                val body = Json.asObj(Json.parse(
                  new String(x.getRequestBody.readAllBytes(), UTF_8)))
                body.get("spans").map(Json.asArr).getOrElse(Vector.empty).foreach { sx =>
                  val sm = Json.asObj(sx)
                  // name: projects/P/traces/TID/spans/SID
                  val name = Json.strOpt(sm, "name").getOrElse("")
                  val parts = name.split("/")
                  require(parts.length == 6 && parts(0) == "projects" &&
                    parts(2) == "traces" && parts(4) == "spans", s"bad span name $name")
                  val attrs = sm.get("attributes").map(Json.asObj)
                    .flatMap(_.get("attributeMap")).map(Json.asObj)
                    .getOrElse(VectorMap.empty[String, Any]).map { case (k, vx) =>
                      val vm = Json.asObj(vx)
                      k -> (vm.get("stringValue").map(Json.asObj)
                        .flatMap(_.get("value")).getOrElse(
                          vm.get("intValue") match {
                            case Some(s: String) => s.toLong
                            case Some(l: Long) => l
                            case _ => vm.getOrElse("boolValue", null)
                          }): Any)
                    }
                  buf.add((project, TraceSpan(parts(3), parts(5),
                    Json.strOpt(sm, "parentSpanId").getOrElse(""),
                    sm.get("displayName").map(Json.asObj)
                      .flatMap(Json.strOpt(_, "value")).getOrElse(""),
                    Json.strOpt(sm, "startTime").getOrElse(""),
                    Json.strOpt(sm, "endTime").getOrElse(""), attrs.toMap)))
                }
                (200, "{}")
              } catch { case e: Throwable =>
                (400, s"""{"error":{"code":400,"message":"${e.getMessage}"}}""") }
            case _ => (404, """{"error":{"code":404}}""")
          }
        val rb = resp.getBytes(UTF_8)
        x.getResponseHeaders.add("Content-Type", "application/json")
        x.sendResponseHeaders(status, rb.length)
        x.getResponseBody.write(rb); x.close()
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => { val th = new Thread(r); th.setDaemon(true); th }))
      val starter = new Thread(() => server.start())
      starter.setDaemon(true); starter.start(); starter.join()
      this
    }
    def stop(): Unit = if (server != null) server.stop(0)
  }

  // ------------------------------------------------------------ exporter
  /** TraceIDRatioBased: sample when 63 bits of the trace id fall under
    * ratio * 2^63 (the OTel sampler's exact arithmetic). The sampler
    * reads TraceID[8:16] — the LOWER 8 bytes of the 16-byte id — so any
    * real OTel peer sharing the trace id reaches the same verdict; with
    * ParentBased composition every span of a trace shares it too. */
  def sampled(traceIdHex: String, ratio: Double): Boolean = {
    if (ratio >= 1.0) true
    else if (ratio <= 0.0) false
    else {
      val low = java.lang.Long.parseUnsignedLong(traceIdHex.slice(16, 32), 16) >>> 1
      low < (ratio * (1L << 62).toDouble * 2.0).toLong
    }
  }

  private def rfc3339(nanos: Long): String =
    java.time.Instant.ofEpochSecond(nanos / 1000000000L, nanos % 1000000000L).toString

  /** Batch exporter for the engine's span shape (the same Otlp.Span the
    * otlp tracer records — one trace provider, pluggable exporters). */
  final class Exporter(endpoint: String, project: String, token: String,
                       samplingRatio: Double = 1.0,
                       tags: Map[String, String] = Map.empty) extends AutoCloseable {
    private val http = new Aws.Http

    def export(spans: Seq[Otlp.Span]): Int = {
      val kept = spans.filter(s => sampled(s.traceId, samplingRatio))
      if (kept.nonEmpty) {
        val payload = Json.obj("spans" -> kept.toVector.map { s =>
          val attrPairs = (tags.toSeq.map { case (k, v) => (k, v: Any) } ++
            s.attributes.toSeq).map { case (k, v) =>
            val encoded: Any = v match {
              case str: String => Json.obj("stringValue" -> Json.obj("value" -> str))
              case l: Long => Json.obj("intValue" -> l.toString)
              case i: Int => Json.obj("intValue" -> i.toString)
              case b: Boolean => Json.obj("boolValue" -> b)
              case other => Json.obj("stringValue" -> Json.obj("value" -> String.valueOf(other)))
            }
            k -> encoded
          }
          val attrs: VectorMap[String, Any] = VectorMap(attrPairs: _*)
          var span = Json.obj(
            "name" -> s"projects/$project/traces/${s.traceId}/spans/${s.spanId}",
            "spanId" -> s.spanId,
            "displayName" -> Json.obj("value" -> s.name, "truncatedByteCount" -> 0L),
            "startTime" -> rfc3339(s.startNano),
            "endTime" -> rfc3339(s.endNano),
            "attributes" -> Json.obj("attributeMap" -> attrs))
          if (s.parentSpanId.nonEmpty) span = span.updated("parentSpanId", s.parentSpanId)
          span: Any
        })
        val r = http.request("POST",
          s"$endpoint/v2/projects/$project/traces:batchWrite",
          Seq("authorization" -> s"Bearer $token", "content-type" -> "application/json"),
          Json.render(payload).getBytes(UTF_8))
        require(r.status == 200, s"cloudtrace batchWrite: ${r.status} ${r.bodyStr}")
      }
      kept.size
    }

    override def close(): Unit = http.close()
  }
}
