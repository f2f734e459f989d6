package graft

import java.util.Base64

import graft.blob.{Bloblang, Interp}
import graft.blob.Bloblang.VBytes
import graft.functions.ParquetCodec
import org.scalatest.funsuite.AnyFunSuite

/** In-memory parquet file codec: schema build, encode/decode round-trips,
  * nested LIST/MAP/STRUCT, optional-null handling, compression codecs, and
  * the `parse_parquet` interpreter method (impl/parquet/bloblang.go:25). */
class ParquetCodecSpec extends AnyFunSuite {

  private val flatSpec =
    """[{"name":"id","type":"INT64"},
       {"name":"n","type":"INT32"},
       {"name":"w","type":"DOUBLE"},
       {"name":"f","type":"FLOAT"},
       {"name":"ok","type":"BOOLEAN"},
       {"name":"s","type":"UTF8"},
       {"name":"raw","type":"BYTE_ARRAY","optional":true}]"""

  test("flat round-trip preserves every primitive type") {
    val rows = Vector(
      Map[String, Any]("id" -> 7L, "n" -> 3L, "w" -> 1.5, "f" -> 2.25, "ok" -> true,
        "s" -> "héllo", "raw" -> VBytes(Array[Byte](0, 1, -1))),
      Map[String, Any]("id" -> -9L, "n" -> -2L, "w" -> -0.5, "f" -> 0.0, "ok" -> false,
        "s" -> "", "raw" -> null))
    val bytes = ParquetCodec.encodeValues(rows, flatSpec)
    val back = ParquetCodec.decodeValues(bytes)
    assert(back.length == 2)
    val r0 = back(0).asInstanceOf[Map[String, Any]]
    assert(r0("id") == 7L && r0("n") == 3L && r0("w") == 1.5 && r0("f") == 2.25)
    assert(r0("ok") == true && r0("s") == "héllo")
    assert(r0("raw").asInstanceOf[VBytes].bytes.toSeq == Seq[Byte](0, 1, -1))
    val r1 = back(1).asInstanceOf[Map[String, Any]]
    assert(r1("raw") == null && r1("s") == "")
  }

  test("nested LIST, MAP and STRUCT round-trip") {
    val spec =
      """[{"name":"id","type":"INT64"},
         {"name":"tags","type":"LIST","fields":[{"name":"element","type":"UTF8"}]},
         {"name":"attrs","type":"MAP","fields":[
           {"name":"key","type":"UTF8"},{"name":"value","type":"INT64"}]},
         {"name":"cloud","type":"STRUCT","optional":true,"fields":[
           {"name":"provider","type":"UTF8"},{"name":"region","type":"UTF8","optional":true}]}]"""
    val rows = Vector(
      Map[String, Any]("id" -> 1L,
        "tags" -> Vector("a", "b", "c"),
        "attrs" -> Map[String, Any]("x" -> 10L, "y" -> 20L),
        "cloud" -> Map[String, Any]("provider" -> "gcp", "region" -> null)),
      Map[String, Any]("id" -> 2L,
        "tags" -> Vector.empty[Any],
        "attrs" -> Map.empty[String, Any],
        "cloud" -> null))
    val back = ParquetCodec.decodeValues(ParquetCodec.encodeValues(rows, spec))
    val r0 = back(0).asInstanceOf[Map[String, Any]]
    assert(r0("tags") == Vector("a", "b", "c"))
    assert(r0("attrs") == Map("x" -> 10L, "y" -> 20L))
    assert(r0("cloud") == Map("provider" -> "gcp", "region" -> null))
    val r1 = back(1).asInstanceOf[Map[String, Any]]
    assert(r1("tags") == Vector() && r1("attrs") == Map() && r1("cloud") == null)
  }

  test("every supported compression codec round-trips") {
    val rows = (0 until 200).map(i =>
      Map[String, Any]("id" -> i.toLong, "n" -> i.toLong, "w" -> i * 0.5,
        "f" -> i * 0.25, "ok" -> (i % 2 == 0), "s" -> ("row" * (i % 5)) , "raw" -> null)).toVector
    for (c <- Seq("uncompressed", "snappy", "gzip", "zstd")) {
      val back = ParquetCodec.decodeValues(ParquetCodec.encodeValues(rows, flatSpec, c))
      assert(back.length == 200, c)
      assert(back(199).asInstanceOf[Map[String, Any]]("id") == 199L, c)
    }
  }

  test("required null and out-of-range int32 fail loudly") {
    val spec = """[{"name":"id","type":"INT64"},{"name":"n","type":"INT32"}]"""
    intercept[IllegalArgumentException](ParquetCodec.encodeValues(
      Vector(Map[String, Any]("id" -> null, "n" -> 1L)), spec))
    intercept[IllegalArgumentException](ParquetCodec.encodeValues(
      Vector(Map[String, Any]("id" -> 1L, "n" -> (Int.MaxValue.toLong + 1))), spec))
  }

  test("file bytes are deterministic for identical rows") {
    val rows = (0 until 50).map(i =>
      Map[String, Any]("id" -> i.toLong, "n" -> i.toLong, "w" -> 0.5, "f" -> 0.5,
        "ok" -> true, "s" -> s"v$i", "raw" -> null)).toVector
    val a = ParquetCodec.encodeValues(rows, flatSpec, "zstd")
    val b = ParquetCodec.encodeValues(rows, flatSpec, "zstd")
    assert(a.toSeq == b.toSeq)
  }

  test("parse_parquet interpreter method decodes file bytes to row array") {
    val rows = Vector(
      Map[String, Any]("id" -> 1L, "s" -> "a"),
      Map[String, Any]("id" -> 2L, "s" -> "b"))
    val bytes = ParquetCodec.encodeValues(rows,
      """[{"name":"id","type":"INT64"},{"name":"s","type":"UTF8"}]""")
    val b64 = Base64.getEncoder.encodeToString(bytes)
    val out = Interp.run(
      Bloblang.parse("""root = content().decode("base64").parse_parquet()"""),
      b64, Map.empty, Map.empty)
    assert(out == Some("""[{"id":1,"s":"a"},{"id":2,"s":"b"}]"""))
  }

  test("foreign-writer list layouts decode per the parquet-format compat rules") {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.Path
    // Non-standard single-field wrapper group ("item", not list/bag/element):
    // parquet-mr's isElementType rule says ONLY the names "array" and
    // "<parent>_tuple" mark the repeated group as the element itself — any
    // other single-field repeated group is the 3-level wrapper.
    def writeListFile(schemaText: String, build: SimpleGroup => Unit): Array[Byte] = {
      val schema = MessageTypeParser.parseMessageType(schemaText)
      val conf = new Configuration()
      GroupWriteSupport.setSchema(schema, conf)
      val f = java.io.File.createTempFile("flist", ".parquet")
      f.delete()
      val w = ExampleParquetWriter.builder(new Path(f.getAbsolutePath)).withConf(conf).build()
      val g = new SimpleGroup(schema)
      build(g)
      w.write(g); w.close()
      val bs = java.nio.file.Files.readAllBytes(f.toPath)
      f.delete()
      bs
    }
    val wrapped = writeListFile(
      """message m {
        |  optional group xs (LIST) {
        |    repeated group item { required int64 x; }
        |  }
        |}""".stripMargin, g => {
        val xs = g.addGroup("xs")
        Seq(1L, 2L, 3L).foreach(v => xs.addGroup("item").add("x", v))
      })
    val r1 = ParquetCodec.decodeValues(wrapped).head.asInstanceOf[Map[String, Any]]
    assert(r1("xs") == Vector(1L, 2L, 3L))
    // and the "array" name means the repeated group IS the element
    val legacy = writeListFile(
      """message m {
        |  optional group ys (LIST) {
        |    repeated group array { required int64 x; }
        |  }
        |}""".stripMargin, g => {
        val ys = g.addGroup("ys")
        Seq(7L, 8L).foreach(v => ys.addGroup("array").add("x", v))
      })
    val r2 = ParquetCodec.decodeValues(legacy).head.asInstanceOf[Map[String, Any]]
    assert(r2("ys").asInstanceOf[Vector[Any]].map(_.asInstanceOf[Map[String, Any]]("x")) ==
      Vector(7L, 8L))
  }

  test("truncated or garbage bytes error loudly, not hang") {
    intercept[Exception](ParquetCodec.decodeValues(Array[Byte](1, 2, 3)))
    val good = ParquetCodec.encodeValues(
      Vector(Map[String, Any]("id" -> 1L)), """[{"name":"id","type":"INT64"}]""")
    intercept[Exception](ParquetCodec.decodeValues(good.dropRight(8)))
  }
}
