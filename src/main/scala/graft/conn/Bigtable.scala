package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.immutable.VectorMap
import scala.collection.mutable

import graft.conn.Aws.Json
import graft.functions.ProtoSchema

/** Cloud Bigtable output path (impl/gcp/output_bigtable.go:26-287 — the
  * reference wraps cloud.google.com/go/bigtable) over the from-scratch
  * stack: the PUBLIC google.bigtable.v2 data-API protobuf subset
  * (field numbering preserved; nested Entry messages flattened to
  * top-level names — wire-identical, proto names never hit the wire),
  * spoken as gRPC (Bigtable.MutateRows server-streaming,
  * Bigtable.PingAndWarm unary) over the in-repo HPACK + HTTP/2 layer.
  *
  * Semantics carried from the reference output:
  *  - each message becomes one SetCell mutation (family, qualifier,
  *    timestamp truncated to millisecond granularity, payload bytes),
  *    entries batched into bulk MutateRows calls (ApplyBulk);
  *  - per-entry failures come back as google.rpc.Status rows, surfaced
  *    as (index, code) so callers can route partial batch errors
  *    (service.NewBatchError.Failed in the reference);
  *  - Connect = PingAndWarm on the instance name.
  */
object Bigtable {

  /** public google.bigtable.v2 subset (+ google.rpc.Status), numbering
    * preserved from the published bigtable.proto / data.proto */
  private val Schema = """
    syntax = "proto3";
    package google.bigtable.v2;
    message Status { int32 code = 1; string message = 2; }
    message SetCell {
      string family_name = 1; bytes column_qualifier = 2;
      int64 timestamp_micros = 3; bytes value = 4;
    }
    message DeleteFromRow {}
    message Mutation { SetCell set_cell = 1; DeleteFromRow delete_from_row = 4; }
    message MutateRowsEntry { bytes row_key = 1; repeated Mutation mutations = 2; }
    message MutateRowsRequest {
      string table_name = 1; repeated MutateRowsEntry entries = 2;
      string app_profile_id = 3;
    }
    message MutateRowsResponseEntry { int64 index = 1; Status status = 2; }
    message MutateRowsResponse { repeated MutateRowsResponseEntry entries = 1; }
    message PingAndWarmRequest { string name = 1; string app_profile_id = 2; }
    message PingAndWarmResponse {}
  """
  private lazy val reg = ProtoSchema.registryForText(Schema)

  private def enc(fqn: String, json: VectorMap[String, Any]): Array[Byte] =
    ProtoSchema.fromJson(reg, s"google.bigtable.v2.$fqn", Json.render(json), discardUnknown = false)
  private def dec(fqn: String, bytes: Array[Byte]): VectorMap[String, Any] =
    Json.asObj(Json.parse(ProtoSchema.toJson(reg, s"google.bigtable.v2.$fqn", bytes)))

  private def b64(b: Array[Byte]): String = java.util.Base64.getEncoder.encodeToString(b)
  private def unb64(v: Any): Array[Byte] = v match {
    case s: String => java.util.Base64.getDecoder.decode(s)
    case _ => Array.emptyByteArray
  }
  private def num(m: VectorMap[String, Any], k: String, default: Long = 0): Long = m.get(k) match {
    case Some(l: Long) => l
    case Some(d: Double) => d.toLong
    case Some(s: String) => s.toLong
    case _ => default
  }

  /** One SetCell mutation as the output writes it. */
  final case class Cell(rowKey: String, family: String, qualifier: String,
                        timestampMicros: Long, value: Array[Byte])

  // ------------------------------------------------------------- fixture
  /** In-memory Bigtable data-API endpoint: MutateRows applies SetCell /
    * DeleteFromRow per entry and streams response entries back in
    * request order; latest write wins per (row, family, qualifier, ts). */
  final class MiniBigtable {
    // table -> row key -> (family, qualifier) -> ts-micros -> value
    private val tables =
      mutable.Map[String, mutable.SortedMap[String, mutable.Map[(String, String), mutable.SortedMap[Long, Array[Byte]]]]]()
    private val lock = new Object
    @volatile private var grpc: Grpc.GrpcServer = _
    def port: Int = grpc.port
    @volatile var pings: Int = 0

    private def applyEntry(table: String, entry: VectorMap[String, Any]): Unit = {
      val rowKey = new String(unb64(entry.getOrElse("rowKey", "")), UTF_8)
      require(rowKey.nonEmpty, "row key may not be empty")
      val rows = tables.getOrElseUpdate(table, mutable.SortedMap.empty)
      entry.get("mutations").map(Json.asArr).getOrElse(Vector.empty).foreach { mx =>
        val m = Json.asObj(mx)
        if (m.contains("deleteFromRow")) rows.remove(rowKey)
        else m.get("setCell").map(Json.asObj).foreach { sc =>
          val fam = sc.getOrElse("familyName", "").asInstanceOf[String]
          val qual = new String(unb64(sc.getOrElse("columnQualifier", "")), UTF_8)
          val ts = num(sc, "timestampMicros")
          val value = unb64(sc.getOrElse("value", ""))
          rows.getOrElseUpdate(rowKey, mutable.Map.empty)
            .getOrElseUpdate((fam, qual), mutable.SortedMap.empty)(ts) = value
        }
      }
    }

    def start(): this.type = {
      grpc = new Grpc.GrpcServer(Map(
        "/google.bigtable.v2.Bigtable/PingAndWarm" -> Grpc.Unary { reqBytes =>
          val req = dec("PingAndWarmRequest", reqBytes)
          require(req.get("name").exists(_.asInstanceOf[String].nonEmpty),
            "instance name required")
          pings += 1
          enc("PingAndWarmResponse", Json.obj())
        },
        "/google.bigtable.v2.Bigtable/MutateRows" -> Grpc.ServerStreaming { (reqBytes, emit) =>
          val req = dec("MutateRowsRequest", reqBytes)
          val table = req.getOrElse("tableName", "").asInstanceOf[String]
          require(table.nonEmpty, "table_name required")
          val entries = req.get("entries").map(Json.asArr).getOrElse(Vector.empty)
          val results = lock.synchronized {
            entries.zipWithIndex.map { case (ex, i) =>
              val status =
                try { applyEntry(table, Json.asObj(ex)); Json.obj("code" -> 0L) }
                catch { case e: Exception =>
                  Json.obj("code" -> 3L, "message" -> String.valueOf(e.getMessage))
                }
              Json.obj("index" -> i.toLong, "status" -> status): Any
            }
          }
          // the real service streams entries in chunks; two halves here
          // keeps the client's multi-message reassembly honest
          results.grouped(math.max(1, (results.size + 1) / 2)).foreach { chunk =>
            emit(enc("MutateRowsResponse", Json.obj("entries" -> chunk.toVector)))
          }
        })).start()
      this
    }

    /** Gate read-back: every live cell of a table (latest ts per
      * column), row-major sorted. The reference has no bigtable INPUT
      * to mirror, so verification reads the fixture state directly. */
    def cells(table: String): Seq[Cell] = lock.synchronized {
      tables.get(table).map { rows =>
        rows.toSeq.flatMap { case (rk, cols) =>
          cols.toSeq.sortBy(_._1).map { case ((fam, qual), byTs) =>
            val (ts, v) = byTs.last
            Cell(rk, fam, qual, ts, v)
          }
        }
      }.getOrElse(Nil)
    }

    def stop(): Unit = if (grpc != null) grpc.stop()
  }

  // -------------------------------------------------------------- client
  /** A single mutation entry: row key + its SetCell list. */
  final case class Entry(rowKey: String, cells: Seq[(String, String, Long, Array[Byte])])

  final class Client(host: String, port: Int) extends AutoCloseable {
    private val grpc = new Grpc.Client(host, port)

    /** Connect contract (output_bigtable.go:163-183). */
    def pingAndWarm(project: String, instance: String): Unit = {
      val name = s"projects/$project/instances/$instance"
      dec("PingAndWarmResponse", grpc.unary("/google.bigtable.v2.Bigtable/PingAndWarm",
        enc("PingAndWarmRequest", Json.obj("name" -> name))))
      ()
    }

    /** ApplyBulk (output_bigtable.go:183-249): one MutateRows call;
      * returns (index, status-code) for every FAILED entry, empty when
      * the whole batch landed. Timestamps are truncated to millisecond
      * granularity exactly as the reference does before the wire. */
    def mutateRows(table: String, entries: Seq[Entry]): Seq[(Long, Long)] = {
      val req = Json.obj(
        "tableName" -> table,
        "entries" -> entries.toVector.map { e =>
          Json.obj(
            "rowKey" -> b64(e.rowKey.getBytes(UTF_8)),
            "mutations" -> e.cells.toVector.map { case (fam, qual, tsMicros, value) =>
              Json.obj("setCell" -> Json.obj(
                "familyName" -> fam,
                "columnQualifier" -> b64(qual.getBytes(UTF_8)),
                "timestampMicros" -> (tsMicros / 1000L) * 1000L,
                "value" -> b64(value))): Any
            }): Any
        })
      val call = grpc.serverStream("/google.bigtable.v2.Bigtable/MutateRows",
        enc("MutateRowsRequest", req))
      val failed = Vector.newBuilder[(Long, Long)]
      var msg = call.next()
      while (msg.isDefined) {
        dec("MutateRowsResponse", msg.get)
          .get("entries").map(Json.asArr).getOrElse(Vector.empty).foreach { ex =>
            val e = Json.asObj(ex)
            val code = e.get("status").map(Json.asObj).map(num(_, "code")).getOrElse(0L)
            if (code != 0L) failed += ((num(e, "index"), code))
          }
        msg = call.next()
      }
      failed.result()
    }

    override def close(): Unit = grpc.close()
  }
}
