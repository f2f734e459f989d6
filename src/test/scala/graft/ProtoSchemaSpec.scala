package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ProtoSchema

/** .proto-file-driven protobuf codec, checked against the reference
  * processor's own public test vectors
  * (internal/impl/protobuf/processor_protobuf_test.go — exact wire bytes and
  * protojson outputs for the config/test/protobuf/schema fixtures) plus
  * hand-computed wire-format cases for the parts those fixtures don't reach
  * (packed repeated, zigzag, maps, enums, fixed/float, uint64, bytes).
  */
class ProtoSchemaSpec extends AnyFunSuite {

  // Schemas equivalent to the reference fixtures (person/house/envelope.proto)
  private val personProto =
    """syntax = "proto3";
      |package testing;
      |import "google/protobuf/timestamp.proto";
      |message Person {
      |  string first_name = 1;
      |  string last_name = 2;
      |  string full_name = 3;
      |  int32 age = 4;
      |  int32 id = 5;  // Unique ID number for this person.
      |  string email = 6;
      |  google.protobuf.Timestamp last_updated = 7;
      |}
      |""".stripMargin
  private val houseProto =
    """syntax = "proto3";
      |package testing;
      |import "person.proto";
      |message House {
      |  message Mailbox {
      |    string color = 1;
      |    string identifier = 2;
      |  }
      |  repeated testing.Person people = 1;
      |  string address = 2;
      |  Mailbox mailbox = 3;
      |}
      |""".stripMargin
  private val envelopeProto =
    """syntax = "proto3";
      |package testing;
      |import "google/protobuf/any.proto";
      |message Envelope {
      |  int32 id = 1;
      |  google.protobuf.Any content = 2;
      |}
      |""".stripMargin

  private val reg = ProtoSchema.parse(Seq(personProto, houseProto, envelopeProto))

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  // --- reference to_json vectors (processor_protobuf_test.go:159-230) --------

  test("to_json person vectors (reference bytes, exact protojson output)") {
    assert(ProtoSchema.toJson(reg, "testing.Person",
      bytes(0x0a, 0x04, 'j', 'o', 'h', 'n', 0x12, 0x05, 'o', 'a', 't', 'e', 's', 0x20, 0x0a)) ===
      """{"firstName":"john","lastName":"oates","age":10}""")
    assert(ProtoSchema.toJson(reg, "testing.Person",
      bytes(0x0a, 0x05, 'd', 'a', 'r', 'y', 'l', 0x12, 0x04, 'h', 'a', 'l', 'l')) ===
      """{"firstName":"daryl","lastName":"hall"}""")
    val caleb = bytes(0x0a, 0x05, 'c', 'a', 'l', 'e', 'b', 0x12, 0x05, 'q', 'u', 'a', 'y', 'e', 0x32, 0x11) ++
      "caleb@myspace.com".getBytes("UTF-8")
    assert(ProtoSchema.toJson(reg, "testing.Person", caleb) ===
      """{"firstName":"caleb","lastName":"quaye","email":"caleb@myspace.com"}""")
    assert(ProtoSchema.toJson(reg, "testing.Person", caleb, useProtoNames = true) ===
      """{"first_name":"caleb","last_name":"quaye","email":"caleb@myspace.com"}""")
    assert(ProtoSchema.toJson(reg, "testing.Person", caleb, emitUnpopulated = true) ===
      """{"firstName":"caleb","lastName":"quaye","fullName":"","age":0,"id":0,"email":"caleb@myspace.com","lastUpdated":null}""")
    assert(ProtoSchema.toJson(reg, "testing.Person", Array.emptyByteArray, emitUnpopulated = true) ===
      """{"firstName":"","lastName":"","fullName":"","age":0,"id":0,"email":"","lastUpdated":null}""")
  }

  test("to_json Any vectors (reference bytes)") {
    val any1 = bytes(0x8, 0xeb, 0x5, 0x12, 0x2b, 0xa, 0x22) ++
      "type.googleapis.com/testing.Person".getBytes("UTF-8") ++
      bytes(0x12, 0x5, 0xa, 0x3, 'b', 'o', 'b')
    assert(ProtoSchema.toJson(reg, "testing.Envelope", any1) ===
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.Person","firstName":"bob"}}""")
    val any2 = bytes(0x8, 0xeb, 0x5, 0x12, 0x2a, 0xa, 0x21) ++
      "type.googleapis.com/testing.House".getBytes("UTF-8") ++
      bytes(0x12, 0x5, 0x12, 0x3, '1', '2', '3')
    assert(ProtoSchema.toJson(reg, "testing.Envelope", any2) ===
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.House","address":"123"}}""")
  }

  // --- reference from_json vectors (processor_protobuf_test.go:32-86) --------

  test("from_json person produces the reference wire bytes") {
    assert(ProtoSchema.fromJson(reg, "testing.Person",
      """{"firstName":"john","lastName":"oates","age":10}""", discardUnknown = false) ===
      bytes(0x0a, 0x04, 'j', 'o', 'h', 'n', 0x12, 0x05, 'o', 'a', 't', 'e', 's', 0x20, 0x0a))
    // proto (snake) names accepted on input too
    assert(ProtoSchema.fromJson(reg, "testing.Person",
      """{"first_name":"daryl","last_name":"hall"}""", discardUnknown = false) ===
      bytes(0x0a, 0x05, 'd', 'a', 'r', 'y', 'l', 0x12, 0x04, 'h', 'a', 'l', 'l'))
  }

  test("from_json Any wraps the inner message with its type url") {
    val encoded = ProtoSchema.fromJson(reg, "testing.Envelope",
      """{"id":747,"content":{"@type":"type.googleapis.com/testing.Person","first_name":"bob"}}""",
      discardUnknown = false)
    val expected = bytes(0x8, 0xeb, 0x5, 0x12, 0x2b, 0xa, 0x22) ++
      "type.googleapis.com/testing.Person".getBytes("UTF-8") ++
      bytes(0x12, 0x5, 0xa, 0x3, 'b', 'o', 'b')
    assert(encoded === expected)
  }

  test("from_json nested message type (House.Mailbox) addresses by dotted fqn") {
    val b = ProtoSchema.fromJson(reg, "testing.House.Mailbox",
      """{"color":"red","identifier":"123"}""", discardUnknown = false)
    assert(b === bytes(0x0a, 0x03, 'r', 'e', 'd', 0x12, 0x03, '1', '2', '3'))
  }

  test("unknown JSON fields error unless discard_unknown") {
    val in = """{"firstName":"caleb","lastName":"quaye","missingfield":"anyvalue"}"""
    val e = intercept[IllegalArgumentException](
      ProtoSchema.fromJson(reg, "testing.Person", in, discardUnknown = false))
    assert(e.getMessage.contains("unknown field"))
    val b = ProtoSchema.fromJson(reg, "testing.Person", in, discardUnknown = true)
    assert(new String(b, "UTF-8").contains("caleb"))
  }

  test("timestamp well-known type maps to RFC 3339 in both directions") {
    val b = ProtoSchema.fromJson(reg, "testing.Person",
      """{"firstName":"ann","lastUpdated":"2021-06-01T12:30:45Z"}""", discardUnknown = false)
    assert(ProtoSchema.toJson(reg, "testing.Person", b) ===
      """{"firstName":"ann","lastUpdated":"2021-06-01T12:30:45Z"}""")
    val b2 = ProtoSchema.fromJson(reg, "testing.Person",
      """{"lastUpdated":"2021-06-01T12:30:45.123456789Z"}""", discardUnknown = false)
    assert(ProtoSchema.toJson(reg, "testing.Person", b2) ===
      """{"lastUpdated":"2021-06-01T12:30:45.123456789Z"}""")
  }

  test("repeated message fields round-trip (House.people)") {
    val in = """{"address":"10 main st","people":[{"firstName":"a"},{"firstName":"b","age":3}],"mailbox":{"color":"blue"}}"""
    val b = ProtoSchema.fromJson(reg, "testing.House", in, discardUnknown = false)
    assert(ProtoSchema.toJson(reg, "testing.House", b) ===
      """{"people":[{"firstName":"a"},{"firstName":"b","age":3}],"address":"10 main st","mailbox":{"color":"blue"}}""")
  }

  // --- hand-computed wire format beyond the fixtures -------------------------

  private val kitchenProto =
    """syntax = "proto3";
      |package lab;
      |message Kitchen {
      |  repeated int32 xs = 1;
      |  sint32 z = 2;
      |  sint64 zl = 3;
      |  uint64 u = 4;
      |  fixed32 f32 = 5;
      |  fixed64 f64 = 6;
      |  float fl = 7;
      |  bytes raw = 8;
      |  map<string, int64> tags = 9;
      |  Color color = 10;
      |  optional int32 opt = 11;
      |  oneof pick { string name = 12; int32 code = 13; }
      |  repeated string labels = 14;
      |}
      |enum Color { COLOR_UNSPECIFIED = 0; RED = 1; BLUE = 2; }
      |""".stripMargin
  private val kreg = ProtoSchema.parse(Seq(kitchenProto))

  test("packed repeated int32 (proto3 default packing, spec example bytes)") {
    // [3, 270]: tag 0x0a, len 3, 0x03, 0x8E 0x02
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"xs":[3,270]}""", discardUnknown = false) ===
      bytes(0x0a, 0x03, 0x03, 0x8e, 0x02))
    // unpacked arrivals decode identically
    val unpacked = bytes(0x08, 0x03, 0x08, 0x8e, 0x02)
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", unpacked) === """{"xs":[3,270]}""")
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x0a, 0x03, 0x03, 0x8e, 0x02)) ===
      """{"xs":[3,270]}""")
  }

  test("zigzag sint32/sint64") {
    // sint32 -1 → zigzag 1; sint64 -2 → 3
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"z":-1}""", discardUnknown = false) ===
      bytes(0x10, 0x01))
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"zl":-2}""", discardUnknown = false) ===
      bytes(0x18, 0x03))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x10, 0x01)) === """{"z":-1}""")
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x18, 0x03)) === """{"zl":"-2"}""")
  }

  test("uint64 renders as a JSON string (protojson 64-bit rule)") {
    val b = ProtoSchema.fromJson(kreg, "lab.Kitchen",
      """{"u":"18446744073709551615"}""", discardUnknown = false)
    assert(b === bytes(0x20, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0x01))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", b) === """{"u":"18446744073709551615"}""")
  }

  test("fixed32 / fixed64 / float little-endian") {
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"f32":1}""", discardUnknown = false) ===
      bytes(0x2d, 0x01, 0x00, 0x00, 0x00))
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"f64":1}""", discardUnknown = false) ===
      bytes(0x31, 0x01, 0, 0, 0, 0, 0, 0, 0))
    // float 1.5 = 0x3FC00000 LE
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"fl":1.5}""", discardUnknown = false) ===
      bytes(0x3d, 0x00, 0x00, 0xc0, 0x3f))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x3d, 0x00, 0x00, 0xc0, 0x3f)) ===
      """{"fl":1.5}""")
  }

  test("bytes fields are base64 in JSON") {
    val b = ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"raw":"aGk="}""", discardUnknown = false)
    assert(b === bytes(0x42, 0x02, 'h', 'i'))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", b) === """{"raw":"aGk="}""")
  }

  test("map fields round-trip as JSON objects") {
    val in = """{"tags":{"a":"1","b":"2"}}"""
    val b = ProtoSchema.fromJson(kreg, "lab.Kitchen", in, discardUnknown = false)
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", b) === in)
  }

  test("enums map to names; unknown numbers stay numeric") {
    val b = ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"color":"BLUE"}""", discardUnknown = false)
    assert(b === bytes(0x50, 0x02))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", b) === """{"color":"BLUE"}""")
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x50, 0x63)) === """{"color":99}""")
    // zero-valued enum is omitted from the wire (proto3 implicit presence)
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"color":"COLOR_UNSPECIFIED"}""",
      discardUnknown = false) === Array.emptyByteArray)
  }

  test("proto3 optional keeps explicit presence for zero values") {
    // non-optional zero scalar is dropped; optional zero is kept on the wire
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"z":0}""", discardUnknown = false) ===
      Array.emptyByteArray)
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"opt":0}""", discardUnknown = false) ===
      bytes(0x58, 0x00))
  }

  test("oneof members parse as plain fields; repeated strings are unpacked") {
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"name":"x"}""", discardUnknown = false) ===
      bytes(0x62, 0x01, 'x'))
    assert(ProtoSchema.fromJson(kreg, "lab.Kitchen", """{"labels":["a","b"]}""", discardUnknown = false) ===
      bytes(0x72, 0x01, 'a', 0x72, 0x01, 'b'))
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x72, 0x01, 'a', 0x72, 0x01, 'b')) ===
      """{"labels":["a","b"]}""")
  }

  test("unknown wire fields are skipped on decode") {
    // field 99 varint + field 98 len-delim, then known z
    val b = bytes(0x98, 0x06, 0x07, 0x92, 0x06, 0x02, 'h', 'i', 0x10, 0x02)
    assert(ProtoSchema.toJson(kreg, "lab.Kitchen", b) === """{"z":1}""")
  }

  test("malformed input errors loudly (no hangs, no silent truncation)") {
    intercept[IllegalArgumentException](
      ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x10))) // truncated varint
    intercept[IllegalArgumentException](
      ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x42, 0x7f, 'x'))) // length past end
    intercept[IllegalArgumentException](
      ProtoSchema.toJson(kreg, "lab.Kitchen", bytes(0x13))) // group wire type
  }

  test("google.protobuf.Struct/Value/ListValue carry arbitrary JSON") {
    val schema =
      """syntax = "proto3";
        |package lab;
        |import "google/protobuf/struct.proto";
        |message Doc {
        |  string id = 1;
        |  google.protobuf.Struct payload = 2;
        |  google.protobuf.Value anything = 3;
        |}""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    val in = """{"id":"d1","payload":{"a":1.5,"b":"x","c":[true,null],"d":{"e":"deep"}},"anything":[1.5,"two"]}"""
    val b = ProtoSchema.fromJson(reg, "lab.Doc", in, discardUnknown = false)
    assert(ProtoSchema.toJson(reg, "lab.Doc", b) === in)
    // bare Value round-trips every JSON shape, including top-level scalars
    for (v <- Seq("null", "true", "3.5", "\"s\"", "[1.5,[2.5]]", """{"k":{"n":null}}""")) {
      val vb = ProtoSchema.fromJson(reg, "google.protobuf.Value", v, discardUnknown = false)
      assert(ProtoSchema.toJson(reg, "google.protobuf.Value", vb) === v, s"value $v")
    }
    // known wire shape: Value(number 1.5) = field 2 fixed64
    assert(ProtoSchema.fromJson(reg, "google.protobuf.Value", "1.5", discardUnknown = false) ===
      bytes(0x11, 0, 0, 0, 0, 0, 0, 0xf8, 0x3f))
  }

  test("fixed64 is unsigned in protojson; repeated enums pack") {
    val schema =
      """syntax = "proto3";
        |package lab2;
        |message M { fixed64 f = 1; repeated Color colors = 2; }
        |enum Color { C0 = 0; RED = 1; BLUE = 2; }""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    // max uint64 as fixed64: parses from the canonical string, renders back
    val b = ProtoSchema.fromJson(reg, "lab2.M",
      """{"f":"18446744073709551615"}""", discardUnknown = false)
    assert(b === bytes(0x09, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff))
    assert(ProtoSchema.toJson(reg, "lab2.M", b) === """{"f":"18446744073709551615"}""")
    // repeated enum: ONE length-delimited packed field (proto3 default)
    assert(ProtoSchema.fromJson(reg, "lab2.M",
      """{"colors":["RED","BLUE"]}""", discardUnknown = false) ===
      bytes(0x12, 0x02, 0x01, 0x02))
    assert(ProtoSchema.toJson(reg, "lab2.M", bytes(0x12, 0x02, 0x01, 0x02)) ===
      """{"colors":["RED","BLUE"]}""")
  }

  test("json_name overrides, enum aliases, and explicit null Values") {
    val schema =
      """syntax = "proto3";
        |package lab;
        |import "google/protobuf/struct.proto";
        |message Named {
        |  string internal_id = 1 [json_name = "ref"];
        |  Status st = 2;
        |  google.protobuf.Value v = 3;
        |}
        |enum Status {
        |  option allow_alias = true;
        |  OK = 0;
        |  STARTED = 1;
        |  RUNNING = 1;
        |}""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    // json_name wins over the lowerCamel derivation, both directions
    val b = ProtoSchema.fromJson(reg, "lab.Named", """{"ref":"abc"}""", discardUnknown = false)
    assert(b === bytes(0x0a, 0x03, 'a', 'b', 'c'))
    assert(ProtoSchema.toJson(reg, "lab.Named", b) === """{"ref":"abc"}""")
    // aliased enum number renders its FIRST name; both names encode
    assert(ProtoSchema.toJson(reg, "lab.Named", bytes(0x10, 0x01)) === """{"st":"STARTED"}""")
    assert(ProtoSchema.fromJson(reg, "lab.Named", """{"st":"RUNNING"}""", discardUnknown = false) ===
      bytes(0x10, 0x01))
    // JSON null IS a value for google.protobuf.Value fields
    val vb = ProtoSchema.fromJson(reg, "lab.Named", """{"v":null}""", discardUnknown = false)
    assert(vb === bytes(0x1a, 0x02, 0x08, 0x00)) // len-delim Value{null_value: 0}
    assert(ProtoSchema.toJson(reg, "lab.Named", vb) === """{"v":null}""")
  }

  test("google.protobuf.FieldMask maps comma-joined camelCase paths") {
    val schema =
      """syntax = "proto3";
        |package lab;
        |import "google/protobuf/field_mask.proto";
        |message Patch { google.protobuf.FieldMask mask = 1; }""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    val b = ProtoSchema.fromJson(reg, "lab.Patch",
      """{"mask":"userId,displayName"}""", discardUnknown = false)
    // paths stored snake_case on the wire
    assert(b === bytes(0x0a, 0x17) ++ bytes(0x0a, 0x07) ++ "user_id".getBytes("UTF-8") ++
      bytes(0x0a, 0x0c) ++ "display_name".getBytes("UTF-8"))
    assert(ProtoSchema.toJson(reg, "lab.Patch", b) === """{"mask":"userId,displayName"}""")
  }

  test("confluent message-index framing (serde_protobuf.go zigzag path)") {
    val schema =
      """syntax = "proto3";
        |package sr;
        |message A { int32 x = 1; }
        |message B {
        |  message Inner { string s = 1; }
        |  int64 id = 1;
        |}""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    // first top-level message: single-0 shortcut
    assert(ProtoSchema.messageIndexBytes(reg, "sr.A") === Array[Byte](0))
    // second top-level: count=1 (zigzag 2), index=1 (zigzag 2)
    assert(ProtoSchema.messageIndexBytes(reg, "sr.B") === bytes(0x02, 0x02))
    // nested path [1, 0]: count=2 → 4, then 2, 0
    assert(ProtoSchema.messageIndexBytes(reg, "sr.B.Inner") === bytes(0x04, 0x02, 0x00))
    // read side resolves the path back
    assert(ProtoSchema.readMessageIndexes(bytes(0x00, 0x77), 0) === ((1, Vector(0))))
    assert(ProtoSchema.messageByIndexes(reg, Vector(0)) === "sr.A")
    assert(ProtoSchema.messageByIndexes(reg, Vector(1, 0)) === "sr.B.Inner")
    // full frame round-trip through the schema-registry codec
    val framed = graft.functions.Formats.schemaRegistryEncodeProto(
      """{"id":"747"}""", 7, schema, "sr.B")
    assert(framed(0) === 0.toByte) // magic
    assert(graft.functions.Formats.schemaRegistryDecodeProto(framed, Map(7 -> schema)) ===
      """{"id":"747"}""")
    // frame layout: magic+id (5) + indexes (2) + wire (tag 0x08 + varint 747 = 3)
    assert(framed.length === 5 + 2 + 3)
  }

  test("registryFor loads .proto files from an import_paths directory") {
    val dir = java.nio.file.Files.createTempDirectory("protos").toFile
    dir.deleteOnExit()
    java.nio.file.Files.write(new java.io.File(dir, "person.proto").toPath, personProto.getBytes("UTF-8"))
    java.nio.file.Files.write(new java.io.File(dir, "house.proto").toPath, houseProto.getBytes("UTF-8"))
    val out = ProtoSchema.decodeFile(dir.getAbsolutePath, "testing.Person",
      bytes(0x0a, 0x04, 'j', 'o', 'h', 'n', 0x20, 0x0a), useProtoNames = false, emitUnpopulated = false)
    assert(out === """{"firstName":"john","age":10}""")
    // registry is cached per path set: same instance on second call
    assert(ProtoSchema.registryFor(Seq(dir.getAbsolutePath)) eq
      ProtoSchema.registryFor(Seq(dir.getAbsolutePath)))
  }
}
