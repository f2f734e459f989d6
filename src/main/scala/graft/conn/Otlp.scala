package graft.conn

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicLong

import scala.collection.immutable.VectorMap

import graft.conn.Aws.Json
import graft.functions.ProtoSchema

/** OTLP trace export (impl/otlp/tracer_otlp.go + impl/jaeger — the
  * reference registers an OpenTelemetry TracerProvider wired to the
  * otlptracehttp/grpc exporters; bento spans wrap each component's
  * message processing) over the PUBLIC opentelemetry-proto trace
  * schema (field numbers preserved, incl. the fixed64 nano timestamps,
  * compiled by the in-repo proto compiler) POSTed to the documented
  * `/v1/traces` endpoint as `application/x-protobuf`.
  *
  * The Tracer mirrors the engine-side span shape: a root span per
  * batch with child spans linked by parent_span_id sharing one
  * trace_id, attributes as typed KeyValues, batched export on flush.
  */
object Otlp {

  /** the public opentelemetry-proto trace subset (numbering preserved) */
  private val Schema = """
    syntax = "proto3";
    package opentelemetry.proto;
    message AnyValue { string string_value = 1; bool bool_value = 2; int64 int_value = 3; double double_value = 4; }
    message KeyValue { string key = 1; AnyValue value = 2; }
    message Resource { repeated KeyValue attributes = 1; }
    message InstrumentationScope { string name = 1; string version = 2; }
    message Span {
      bytes trace_id = 1; bytes span_id = 2; string trace_state = 3; bytes parent_span_id = 4;
      string name = 5; int32 kind = 6;
      fixed64 start_time_unix_nano = 7; fixed64 end_time_unix_nano = 8;
      repeated KeyValue attributes = 9;
    }
    message ScopeSpans { InstrumentationScope scope = 1; repeated Span spans = 2; }
    message ResourceSpans { Resource resource = 1; repeated ScopeSpans scope_spans = 2; }
    message TracesData { repeated ResourceSpans resource_spans = 1; }
  """
  private lazy val reg = ProtoSchema.registryForText(Schema)
  private val Fqn = "opentelemetry.proto.TracesData"

  final case class Span(traceId: String, spanId: String, parentSpanId: String,
                        name: String, startNano: Long, endNano: Long,
                        attributes: Map[String, Any])

  private def hex(b: Array[Byte]): String = graft.conn.Aws.SigV4.hex(b)
  private def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)

  // ------------------------------------------------------------- encode
  private def attrJson(k: String, v: Any): VectorMap[String, Any] = {
    val av: VectorMap[String, Any] = v match {
      case s: String => Json.obj("stringValue" -> s)
      case l: Long => Json.obj("intValue" -> l)
      case i: Int => Json.obj("intValue" -> i.toLong)
      case b: Boolean => Json.obj("boolValue" -> b)
      case d: Double => Json.obj("doubleValue" -> d)
      case other => Json.obj("stringValue" -> String.valueOf(other))
    }
    Json.obj("key" -> k, "value" -> av)
  }

  def encodeTraces(serviceName: String, spans: Seq[Span]): Array[Byte] = {
    val spanJson = spans.toVector.map { s =>
      var m = Json.obj(
        "traceId" -> b64(hexToBytes(s.traceId)), "spanId" -> b64(hexToBytes(s.spanId)),
        "name" -> s.name, "kind" -> 1L,
        "startTimeUnixNano" -> s.startNano, "endTimeUnixNano" -> s.endNano,
        "attributes" -> s.attributes.toVector.map { case (k, v) => attrJson(k, v): Any })
      if (s.parentSpanId.nonEmpty) m = m.updated("parentSpanId", b64(hexToBytes(s.parentSpanId)))
      m: Any
    }
    ProtoSchema.fromJson(reg, Fqn, Json.render(Json.obj(
      "resourceSpans" -> Vector[Any](Json.obj(
        "resource" -> Json.obj("attributes" -> Vector[Any](attrJson("service.name", serviceName))),
        "scopeSpans" -> Vector[Any](Json.obj(
          "scope" -> Json.obj("name" -> "graft", "version" -> "0.1"),
          "spans" -> spanJson)))))), discardUnknown = false)
  }

  private def hexToBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def unb64hex(v: Any): String = v match {
    case s: String => hex(java.util.Base64.getDecoder.decode(s))
    case _ => ""
  }

  def decodeTraces(bytes: Array[Byte]): (String, Seq[Span]) = {
    val m = Json.asObj(Json.parse(ProtoSchema.toJson(reg, Fqn, bytes)))
    var service = ""
    val spans = Vector.newBuilder[Span]
    m.get("resourceSpans").map(Json.asArr).getOrElse(Vector.empty).foreach { rsx =>
      val rs = Json.asObj(rsx)
      rs.get("resource").map(Json.asObj).foreach { r =>
        r.get("attributes").map(Json.asArr).getOrElse(Vector.empty).foreach { ax =>
          val a = Json.asObj(ax)
          if (Json.strOpt(a, "key").contains("service.name"))
            service = Json.strOpt(Json.asObj(a("value")), "stringValue").getOrElse("")
        }
      }
      rs.get("scopeSpans").map(Json.asArr).getOrElse(Vector.empty).foreach { ssx =>
        Json.asObj(ssx).get("spans").map(Json.asArr).getOrElse(Vector.empty).foreach { spx =>
          val sp = Json.asObj(spx)
          val attrs = sp.get("attributes").map(Json.asArr).getOrElse(Vector.empty).map { ax =>
            val a = Json.asObj(ax)
            val av = Json.asObj(a("value"))
            // plain proto3 scalars elide zero defaults (the real schema
            // wraps these in a oneof with explicit presence) — an empty
            // AnyValue reads back as the string default
            val v: Any = av.headOption match {
              case Some(("stringValue", s)) => s
              case Some(("intValue", x: Long)) => x
              case Some(("intValue", x: String)) => x.toLong
              case Some(("boolValue", b)) => b
              case Some(("doubleValue", d)) => d
              case Some((_, other)) => other
              case None => ""
            }
            Json.str(a, "key") -> v
          }.toMap
          def nano(k: String): Long = sp.get(k) match {
            case Some(l: Long) => l
            case Some(s: String) => java.lang.Long.parseUnsignedLong(s)
            case _ => 0L
          }
          spans += Span(unb64hex(sp.getOrElse("traceId", "")), unb64hex(sp.getOrElse("spanId", "")),
            unb64hex(sp.getOrElse("parentSpanId", "")), Json.strOpt(sp, "name").getOrElse(""),
            nano("startTimeUnixNano"), nano("endTimeUnixNano"), attrs)
        }
      }
    }
    (service, spans.result())
  }

  // ------------------------------------------------------------- fixture
  final class MiniCollector {
    private val spanBuf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Span)]()
    @volatile private var server: com.sun.net.httpserver.HttpServer = _
    def port: Int = server.getAddress.getPort
    def endpoint: String = s"http://127.0.0.1:$port"
    def spans: Vector[(String, Span)] = {
      import scala.jdk.CollectionConverters._
      spanBuf.iterator().asScala.toVector
    }
    def start(): this.type = {
      graft.conn.Aws.serverNoDelay()
      server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/v1/traces", (x: com.sun.net.httpserver.HttpExchange) => {
        val body = x.getRequestBody.readAllBytes()
        val ct = Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        val (status, resp) =
          if (!ct.startsWith("application/x-protobuf")) (415, "unsupported content type")
          else try {
            val (service, ss) = decodeTraces(body)
            ss.foreach(s => spanBuf.add((service, s)))
            (200, "")
          } catch { case e: Throwable => (400, String.valueOf(e.getMessage)) }
        val rb = resp.getBytes(UTF_8)
        x.sendResponseHeaders(status, if (rb.isEmpty) -1 else rb.length)
        if (rb.nonEmpty) x.getResponseBody.write(rb)
        x.close()
      })
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
        (r: Runnable) => { val th = new Thread(r); th.setDaemon(true); th }))
      val starter = new Thread(() => server.start())
      starter.setDaemon(true); starter.start(); starter.join()
      this
    }
    def stop(): Unit = if (server != null) server.stop(0)
  }

  // -------------------------------------------------------------- tracer
  private val idGen = new AtomicLong(0x1234abcd)

  /** batching span tracer with the engine-side span shape: one root per
    * trace, children linked by parent_span_id (tracer_otlp.go registers
    * exactly this provider shape; bento opens a span per component per
    * message batch) */
  final class Tracer(endpoint: String, serviceName: String) extends AutoCloseable {
    private val http = new Aws.Http
    private val pending = scala.collection.mutable.ArrayBuffer[Span]()

    private def newId(bytes: Int): String =
      hex(java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-${idGen.incrementAndGet()}".getBytes(UTF_8))).take(bytes * 2)

    def startTrace(name: String, attrs: Map[String, Any] = Map.empty): SpanHandle = {
      val tid = newId(16)
      new SpanHandle(this, tid, newId(8), "", name, attrs, System.currentTimeMillis() * 1000000L)
    }
    private[Otlp] def child(parent: SpanHandle, name: String, attrs: Map[String, Any]): SpanHandle =
      new SpanHandle(this, parent.traceId, newId(8), parent.spanId, name, attrs,
        System.currentTimeMillis() * 1000000L)
    private[Otlp] def record(s: Span): Unit = synchronized { pending += s }

    def flush(): Unit = synchronized {
      if (pending.nonEmpty) {
        val body = encodeTraces(serviceName, pending.toVector)
        pending.clear()
        val r = http.request("POST", s"$endpoint/v1/traces",
          Seq("content-type" -> "application/x-protobuf"), body)
        require(r.status == 200, s"otlp export: ${r.status} ${r.bodyStr}")
      }
    }
    override def close(): Unit = { flush(); http.close() }
  }

  final class SpanHandle(tracer: Tracer, val traceId: String, val spanId: String,
                         parentId: String, name: String, attrs: Map[String, Any],
                         startNano: Long) {
    def startChild(childName: String, childAttrs: Map[String, Any] = Map.empty): SpanHandle =
      tracer.child(this, childName, childAttrs)
    def end(extraAttrs: Map[String, Any] = Map.empty): Unit =
      tracer.record(Span(traceId, spanId, parentId, name, startNano,
        System.currentTimeMillis() * 1000000L, attrs ++ extraAttrs))
  }
}
