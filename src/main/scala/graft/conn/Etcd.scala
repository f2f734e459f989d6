package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.VectorMap
import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import graft.conn.Aws.Json
import graft.functions.ProtoSchema

/** etcd v3 Watch input (impl/etcd/input.go — the reference wraps
  * go.etcd.io/etcd/client/v3) over the full from-scratch stack: the
  * PUBLIC etcdserverpb/mvccpb protobuf schemas (numbering preserved,
  * compiled by the in-repo proto compiler), spoken as gRPC calls
  * (KV.Range / KV.Put unary, Watch.Watch streaming) over the HPACK +
  * HTTP/2 layer. The fixture is a revisioned MVCC store: every Put
  * bumps the cluster revision, watches replay history from
  * `start_revision` and then stream live events — the
  * backfill-then-tail contract input.go consumes, with events shaped
  * exactly as util.go:10's map (key, value, type PUT/DELETE, version,
  * mod_revision, create_revision, lease).
  */
object Etcd {

  /** etcd's range_end sentinel: a single \\0 byte means "keys >= key"
    * (kept out of source literals so git sees text) */
  val RangeInfinity: String = 0.toChar.toString

  /** the public etcd API proto subset (field numbers preserved) */
  private val Schema = """
    syntax = "proto3";
    package etcdserverpb;
    message KeyValue {
      bytes key = 1; int64 create_revision = 2; int64 mod_revision = 3;
      int64 version = 4; bytes value = 5; int64 lease = 6;
    }
    message Event { int32 type = 1; KeyValue kv = 2; KeyValue prev_kv = 3; }
    message ResponseHeader {
      uint64 cluster_id = 1; uint64 member_id = 2; int64 revision = 3; uint64 raft_term = 4;
    }
    message PutRequest { bytes key = 1; bytes value = 2; int64 lease = 3; bool prev_kv = 4; }
    message PutResponse { ResponseHeader header = 1; KeyValue prev_kv = 2; }
    message RangeRequest { bytes key = 1; bytes range_end = 2; int64 limit = 3; int64 revision = 4; }
    message RangeResponse { ResponseHeader header = 1; repeated KeyValue kvs = 2; bool more = 3; int64 count = 4; }
    message WatchCreateRequest { bytes key = 1; bytes range_end = 2; int64 start_revision = 3; }
    message WatchRequest { WatchCreateRequest create_request = 1; }
    message WatchResponse {
      ResponseHeader header = 1; int64 watch_id = 2; bool created = 3; bool canceled = 4;
      repeated Event events = 11;
    }
  """
  private lazy val reg = ProtoSchema.registryForText(Schema)

  private def enc(fqn: String, json: VectorMap[String, Any]): Array[Byte] =
    ProtoSchema.fromJson(reg, s"etcdserverpb.$fqn", Json.render(json), discardUnknown = false)
  private def dec(fqn: String, bytes: Array[Byte]): VectorMap[String, Any] =
    Json.asObj(Json.parse(ProtoSchema.toJson(reg, s"etcdserverpb.$fqn", bytes)))

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
  private def unb64(v: Any): String = v match {
    case s: String => new String(java.util.Base64.getDecoder.decode(s), UTF_8)
    case _ => ""
  }
  private def num(m: VectorMap[String, Any], k: String, default: Long = 0): Long = m.get(k) match {
    case Some(l: Long) => l
    case Some(d: Double) => d.toLong
    case Some(s: String) => s.toLong
    case _ => default
  }

  // ------------------------------------------------------------- fixture
  private final case class Stored(value: String, createRev: Long, modRev: Long, version: Long)
  private final case class HistEvent(rev: Long, tpe: Int, key: String, kv: Stored)

  final class MiniEtcd {
    private val kv = mutable.Map[String, Stored]()
    private val history = new ArrayBuffer[HistEvent]()
    private var revision = 0L
    private val lock = new Object
    @volatile private var grpc: Grpc.GrpcServer = _
    def port: Int = grpc.port
    def currentRevision: Long = lock.synchronized(revision)

    private def kvJson(key: String, s: Stored): VectorMap[String, Any] =
      Json.obj("key" -> b64(key), "createRevision" -> s.createRev,
        "modRevision" -> s.modRev, "version" -> s.version, "value" -> b64(s.value))

    private def headerJson(): VectorMap[String, Any] =
      Json.obj("clusterId" -> 1L, "memberId" -> 1L, "revision" -> revision, "raftTerm" -> 1L)

    private def doPut(key: String, value: String): VectorMap[String, Any] = lock.synchronized {
      revision += 1
      val prev = kv.get(key)
      val s = Stored(value, prev.map(_.createRev).getOrElse(revision), revision,
        prev.map(_.version + 1).getOrElse(1L))
      kv(key) = s
      history += HistEvent(revision, 0 /* PUT */, key, s)
      lock.notifyAll()
      Json.obj("header" -> headerJson())
    }

    private def doDelete(key: String): Unit = lock.synchronized {
      kv.remove(key).foreach { prev =>
        revision += 1
        history += HistEvent(revision, 1 /* DELETE */, key,
          Stored("", 0, revision, 0))
        lock.notifyAll()
      }
    }
    def deleteDirect(key: String): Unit = doDelete(key)

    private def inRange(key: String, start: String, rangeEnd: String): Boolean =
      if (rangeEnd.isEmpty) key == start
      else key >= start && (rangeEnd == RangeInfinity || key < rangeEnd)

    def start(): this.type = {
      grpc = new Grpc.GrpcServer(Map(
        "/etcdserverpb.KV/Put" -> Grpc.Unary { reqBytes =>
          val req = dec("PutRequest", reqBytes)
          enc("PutResponse", doPut(unb64(req.getOrElse("key", "")), unb64(req.getOrElse("value", ""))))
        },
        "/etcdserverpb.KV/Range" -> Grpc.Unary { reqBytes =>
          val req = dec("RangeRequest", reqBytes)
          val start = unb64(req.getOrElse("key", ""))
          val rangeEnd = unb64(req.getOrElse("rangeEnd", ""))
          val limit = num(req, "limit")
          lock.synchronized {
            val hits = kv.toSeq.filter { case (k, _) => inRange(k, start, rangeEnd) }.sortBy(_._1)
            val page = if (limit > 0) hits.take(limit.toInt) else hits
            enc("RangeResponse", Json.obj("header" -> headerJson(),
              "kvs" -> page.toVector.map { case (k, s) => kvJson(k, s): Any },
              "more" -> (page.size < hits.size), "count" -> hits.size.toLong))
          }
        },
        "/etcdserverpb.Watch/Watch" -> Grpc.ServerStreaming { (reqBytes, emit) =>
          val create = dec("WatchRequest", reqBytes)
            .get("createRequest").map(Json.asObj).getOrElse(VectorMap.empty[String, Any])
          val start = unb64(create.getOrElse("key", ""))
          val rangeEnd = unb64(create.getOrElse("rangeEnd", ""))
          val startRev = num(create, "startRevision")
          // the public etcd v3 contract: start_revision absent/0 means
          // "from now" (live events only) — NOT a full-history replay.
          // Replays need an explicit start_revision (e.g. 1).
          val (effStart, startIdx) = lock.synchronized {
            if (startRev == 0) (revision + 1, history.size)
            else (startRev, history.indexWhere(_.rev >= startRev) match {
              case -1 => history.size; case i => i
            })
          }
          emit(enc("WatchResponse", Json.obj("header" -> lock.synchronized(headerJson()),
            "watchId" -> 1L, "created" -> true)))
          var idx = startIdx
          while (true) { // streams until the client hangs up
            val ev = lock.synchronized {
              while (idx >= history.size) lock.wait(1000)
              val e = history(idx); idx += 1; e
            }
            if (inRange(ev.key, start, rangeEnd) && ev.rev >= effStart) {
              emit(enc("WatchResponse", Json.obj(
                "header" -> lock.synchronized(headerJson()), "watchId" -> 1L,
                "events" -> Vector[Any](Json.obj("type" -> ev.tpe.toLong,
                  "kv" -> kvJson(ev.key, ev.kv))))))
            }
          }
        })).start()
      this
    }
    def stop(): Unit = if (grpc != null) grpc.stop()
  }

  // -------------------------------------------------------------- client
  /** the flattened event map the reference emits (util.go:10) */
  final case class WatchEvent(key: String, value: String, eventType: String,
                              version: Long, modRevision: Long, createRevision: Long, lease: Long)

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val grpc = new Grpc.Client(host, port)

    def put(key: String, value: String): Long = {
      val resp = dec("PutResponse", grpc.unary("/etcdserverpb.KV/Put",
        enc("PutRequest", Json.obj("key" -> b64(key), "value" -> b64(value)))))
      num(Json.asObj(resp("header")), "revision")
    }

    def range(key: String, rangeEnd: String = "", limit: Long = 0): Seq[(String, String)] = {
      var req = Json.obj("key" -> b64(key))
      if (rangeEnd.nonEmpty) req = req.updated("rangeEnd", b64(rangeEnd))
      if (limit > 0) req = req.updated("limit", limit)
      val resp = dec("RangeResponse", grpc.unary("/etcdserverpb.KV/Range", enc("RangeRequest", req)))
      resp.get("kvs").map(Json.asArr).getOrElse(Vector.empty).map { kvx =>
        val m = Json.asObj(kvx)
        (unb64(m.getOrElse("key", "")), unb64(m.getOrElse("value", "")))
      }
    }

    /** open a watch; events stream until close (input.go's long-running
      * request). `prefixEnd` RangeInfinity (the "\\0" sentinel) watches [key, ∞). */
    def watch(key: String, rangeEnd: String = "", startRevision: Long = 0): WatchCall = {
      var create = Json.obj("key" -> b64(key))
      if (rangeEnd.nonEmpty) create = create.updated("rangeEnd", b64(rangeEnd))
      if (startRevision > 0) create = create.updated("startRevision", startRevision)
      val call = grpc.serverStream("/etcdserverpb.Watch/Watch",
        enc("WatchRequest", Json.obj("createRequest" -> create)))
      // first response is the `created` handshake
      val first = dec("WatchResponse", call.next().getOrElse(
        throw new IllegalArgumentException("watch stream closed before created")))
      require(first.get("created").contains(true), "watch not created")
      new WatchCall(call)
    }
    override def close(): Unit = grpc.close()
  }

  final class WatchCall(call: Grpc.ServerStreamCall) {
    private val pending = mutable.Queue[WatchEvent]()
    /** next flattened event (util.go's map shape); None when the watch
      * is idle past the timeout (the normal long-poll case) or closed */
    def next(timeoutMs: Long = 10000): Option[WatchEvent] = {
      while (pending.isEmpty) {
        val polled =
          try call.next(timeoutMs)
          catch { // stream idle, not ended — the watch just has no event yet
            case e: IllegalArgumentException if e.getMessage.contains("timed out") => return None
          }
        val resp = polled match {
          case Some(bytes) => dec("WatchResponse", bytes)
          case None => return None
        }
        resp.get("events").map(Json.asArr).getOrElse(Vector.empty).foreach { evx =>
          val e = Json.asObj(evx)
          val kvm = Json.asObj(e.getOrElse("kv", VectorMap.empty[String, Any]))
          pending += WatchEvent(
            unb64(kvm.getOrElse("key", "")), unb64(kvm.getOrElse("value", "")),
            if (num(e, "type") == 1) "DELETE" else "PUT",
            num(kvm, "version"), num(kvm, "modRevision"),
            num(kvm, "createRevision"), num(kvm, "lease"))
        }
      }
      Some(pending.dequeue())
    }
  }
}
