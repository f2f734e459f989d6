package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Schema'd binary format codecs: Avro and protobuf wire format
  * (reference: internal/impl/avro/processor.go:26-154 `to_json`/`from_json`
  * operators; internal/impl/protobuf/processor_protobuf.go:49-68).
  *
  * Spark-first shape: the schema string is part of the compiled plan
  * (driver-validated), parsed once per executor JVM via a schema cache —
  * the same model as spark-avro's `from_avro(col, jsonSchema)`. Encoding
  * is per row inside a UDF; no driver round-trips.
  *
  * The protobuf codec implements the public wire format (varint,
  * fixed64, length-delimited) directly against a flat field descriptor —
  * the reference's .proto-file loading is config plumbing around the same
  * wire codec.
  */
object Formats {

  // ===== Avro (impl/avro/processor.go) ======================================

  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[String, Schema]()
  private def schemaOf(json: String): Schema =
    schemaCache.computeIfAbsent(json, s => new Schema.Parser().parse(s))

  /** `from_json` operator: Avro-JSON document → binary-encoded record. */
  def avroFromJson(jsonDoc: String, schemaJson: String): Array[Byte] = {
    if (jsonDoc == null) null else {
      val schema = schemaOf(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      val record = reader.read(null, DecoderFactory.get.jsonDecoder(schema, jsonDoc))
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get.binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(record, enc)
      enc.flush()
      out.toByteArray
    }
  }

  /** `to_json` operator: binary-encoded record → Avro-JSON document
    * (fields emitted in schema order — deterministic). */
  def avroToJson(bytes: Array[Byte], schemaJson: String): String = {
    if (bytes == null) null else {
      val schema = schemaOf(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      val record = reader.read(null, DecoderFactory.get.binaryDecoder(bytes, null))
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get.jsonEncoder(schema, out)
      new GenericDatumWriter[GenericRecord](schema).write(record, enc)
      enc.flush()
      new String(out.toByteArray, "UTF-8")
    }
  }

  // ===== Protobuf wire format (impl/protobuf/processor_protobuf.go) =========

  /** Flat message descriptor: `(fieldNumber, wireKind, jsonName)` where
    * wireKind ∈ int64 (varint), double (fixed64), string|bytes
    * (length-delimited). Field numbers must be ascending for a canonical
    * (deterministic) encoding. */
  final case class ProtoField(num: Int, kind: String, name: String)

  def protoDescriptor(spec: String): Vector[ProtoField] = {
    val fields = spec.split(',').toVector.map { f =>
      f.split(':') match {
        case Array(n, k, name) => ProtoField(n.trim.toInt, k.trim, name.trim)
        case _ => throw new IllegalArgumentException(s"proto descriptor field: $f")
      }
    }
    require(fields.map(_.num) == fields.map(_.num).sorted, "proto descriptor: field numbers must ascend")
    fields
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  /** `from_json`: JSON document → protobuf wire bytes per the descriptor.
    * Absent/null JSON fields are omitted (proto3 default semantics). */
  def protoFromJson(jsonDoc: String, fields: Vector[ProtoField]): Array[Byte] = {
    if (jsonDoc == null) null else {
      val doc = graft.blob.Interp.parseJsonTyped(jsonDoc).asInstanceOf[Map[String, Any]]
      val out = new java.io.ByteArrayOutputStream()
      fields.foreach { f =>
        doc.get(f.name) match {
          case None | Some(null) => ()
          case Some(v) => f.kind match {
            case "int64" =>
              writeVarint(out, (f.num.toLong << 3) | 0L)
              writeVarint(out, graft.blob.Interp.toLong(v))
            case "double" =>
              writeVarint(out, (f.num.toLong << 3) | 1L)
              val bits = java.lang.Double.doubleToLongBits(graft.blob.Interp.toNum(v))
              for (i <- 0 until 8) out.write(((bits >>> (8 * i)) & 0xFF).toInt)
            case "string" | "bytes" =>
              val bs = graft.blob.Interp.toStr(v).getBytes("UTF-8")
              writeVarint(out, (f.num.toLong << 3) | 2L)
              writeVarint(out, bs.length.toLong)
              out.write(bs)
            case other => throw new IllegalArgumentException(s"proto kind: $other")
          }
        }
      }
      out.toByteArray
    }
  }

  /** `to_json`: wire bytes → JSON document. Unknown field numbers are
    * skipped (the reference's discard-unknown mode). */
  def protoToJson(bytes: Array[Byte], fields: Vector[ProtoField]): String = {
    if (bytes == null) null else {
      val byNum = fields.map(f => f.num -> f).toMap
      var vals = scala.collection.immutable.VectorMap.empty[String, Any]
      var i = 0
      def varint(): Long = {
        var shift = 0; var v = 0L
        var b = 0x80
        while ((b & 0x80) != 0) {
          b = bytes(i) & 0xFF; i += 1
          v |= (b & 0x7FL) << shift; shift += 7
        }
        v
      }
      while (i < bytes.length) {
        val tag = varint()
        val num = (tag >>> 3).toInt
        val wire = (tag & 7).toInt
        (byNum.get(num), wire) match {
          case (Some(f), 0) => vals += f.name -> varint()
          case (Some(f), 1) =>
            var bits = 0L
            for (k <- 0 until 8) { bits |= (bytes(i) & 0xFFL) << (8 * k); i += 1 }
            vals += f.name -> java.lang.Double.longBitsToDouble(bits)
          case (Some(f), 2) =>
            val len = varint().toInt
            vals += f.name -> new String(bytes, i, len, "UTF-8")
            i += len
          case (None, 0) => varint()
          case (None, 1) => i += 8
          case (None, 2) => i += varint().toInt
          case (_, w) => throw new IllegalArgumentException(s"proto wire type: $w")
        }
      }
      graft.blob.Interp.marshalJson(vals)
    }
  }

  // ===== Confluent schema-registry framing (impl/confluent/processor_
  // schema_registry_{encode,decode}.go:269,235-244): 0x00 magic + 4-byte
  // big-endian schema id + payload =====

  def schemaRegistryFrame(payload: Array[Byte], schemaId: Int): Array[Byte] = {
    if (payload == null) null else {
      val out = new Array[Byte](payload.length + 5)
      out(0) = 0
      out(1) = (schemaId >>> 24).toByte; out(2) = (schemaId >>> 16).toByte
      out(3) = (schemaId >>> 8).toByte; out(4) = schemaId.toByte
      System.arraycopy(payload, 0, out, 5, payload.length)
      out
    }
  }

  /** Returns (schemaId, payload); malformed frames throw (the reference
    * errors the message — callers route to the error facet). */
  def schemaRegistryUnframe(bytes: Array[Byte]): (Int, Array[Byte]) = {
    require(bytes != null && bytes.length > 4 && bytes(0) == 0,
      "schema_registry: missing magic byte header")
    val id = ((bytes(1) & 0xFF) << 24) | ((bytes(2) & 0xFF) << 16) |
      ((bytes(3) & 0xFF) << 8) | (bytes(4) & 0xFF)
    (id, java.util.Arrays.copyOfRange(bytes, 5, bytes.length))
  }

  /** `schema_registry_encode` for avro: JSON doc → framed avro binary.
    * The registry client is config plumbing; the schema map stands in for
    * its id→schema cache. */
  def schemaRegistryEncode(jsonDoc: String, schemaId: Int, schemaJson: String): Array[Byte] =
    schemaRegistryFrame(avroFromJson(jsonDoc, schemaJson), schemaId)

  /** `schema_registry_decode` for avro: framed bytes → JSON doc, resolving
    * the embedded id against the provided id→schema map. */
  def schemaRegistryDecode(bytes: Array[Byte], schemas: Map[Int, String]): String = {
    if (bytes == null) null else {
      val (id, payload) = schemaRegistryUnframe(bytes)
      val schema = schemas.getOrElse(id,
        throw new IllegalArgumentException(s"schema_registry: unknown schema id $id"))
      avroToJson(payload, schema)
    }
  }

  /** `schema_registry_encode` for PROTOBUF (impl/confluent/serde_protobuf.
    * go:171-293): magic + schema id + zigzag-varint message-index path +
    * proto wire bytes. The index path addresses the target message within
    * the schema file ([0] shortcut for the first top-level message). */
  def schemaRegistryEncodeProto(jsonDoc: String, schemaId: Int,
                                schemaText: String, message: String): Array[Byte] = {
    if (jsonDoc == null) null else {
      val reg = ProtoSchema.registryForText(schemaText)
      val idx = ProtoSchema.messageIndexBytes(reg, message)
      val wire = ProtoSchema.fromJson(reg, message, jsonDoc, discardUnknown = false)
      val framed = schemaRegistryFrame(new Array[Byte](idx.length + wire.length), schemaId)
      System.arraycopy(idx, 0, framed, 5, idx.length)
      System.arraycopy(wire, 0, framed, 5 + idx.length, wire.length)
      framed
    }
  }

  /** `schema_registry_decode` for PROTOBUF: resolves the embedded id against
    * the provided id→schema map, walks the message-index path to the target
    * message, then decodes via protojson. */
  def schemaRegistryDecodeProto(bytes: Array[Byte], schemas: Map[Int, String]): String = {
    if (bytes == null) null else {
      val (id, payload) = schemaRegistryUnframe(bytes)
      val schema = schemas.getOrElse(id,
        throw new IllegalArgumentException(s"schema_registry: unknown schema id $id"))
      val reg = ProtoSchema.registryForText(schema)
      val (n, idxs) = ProtoSchema.readMessageIndexes(payload, 0)
      val fqn = ProtoSchema.messageByIndexes(reg, idxs)
      ProtoSchema.toJson(reg, fqn,
        java.util.Arrays.copyOfRange(payload, n, payload.length))
    }
  }

  /** Register codec UDFs for spark.sql / call_udf use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("blob_avro_encode",
      udf((j: String, s: String) => avroFromJson(j, s)))
    spark.udf.register("blob_avro_decode",
      udf((b: Array[Byte], s: String) => avroToJson(b, s)))
    spark.udf.register("blob_proto_encode",
      udf((j: String, spec: String) => protoFromJson(j, protoDescriptor(spec))))
    spark.udf.register("blob_proto_decode",
      udf((b: Array[Byte], spec: String) => protoToJson(b, protoDescriptor(spec))))
    // .proto-file-driven codec (ProtoSchema): reference processor_protobuf.go
    spark.udf.register("proto_file_encode",
      udf((paths: String, msg: String, j: String) => ProtoSchema.encodeFile(paths, msg, j, false)))
    spark.udf.register("proto_file_decode",
      udf((paths: String, msg: String, b: Array[Byte]) => ProtoSchema.decodeFile(paths, msg, b, false, false)))
  }
}
