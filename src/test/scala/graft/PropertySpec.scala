package graft

import graft.functions.{Codecs, Formats, Udfs}
import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the byte-level codecs: round-trips over arbitrary
  * inputs, wire-length laws, and boundary behavior the example-based
  * specs can't sweep. (Plain scalacheck generators — the scalatest
  * bridge artifact isn't in the offline cache.)
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 60): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val bytesGen: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])

  test("compression codecs round-trip arbitrary byte arrays") {
    val codecs = Seq[(String, Array[Byte] => Array[Byte], Array[Byte] => Array[Byte])](
      ("gzip", Udfs.gzipCompress, Udfs.gzipDecompress),
      ("flate", Codecs.flateCompress, Codecs.flateDecompress),
      ("zlib", Codecs.zlibCompress, Codecs.zlibDecompress),
      ("bzip2", Codecs.bzip2Compress, Codecs.bzip2Decompress),
      ("zstd", Codecs.zstdCompress, Codecs.zstdDecompress),
      ("lz4", Codecs.lz4Compress, Codecs.lz4Decompress),
      ("snappy", Codecs.snappyCompress, Codecs.snappyDecompress))
    for (bs <- samples(bytesGen); (name, c, d) <- codecs)
      assert(d(c(bs)).toSeq == bs.toSeq, s"$name failed on ${bs.length} bytes")
  }

  test("proto codec law: toJson(fromJson(doc)) is identity over random typed docs") {
    import graft.functions.ProtoSchema
    val schema =
      """syntax = "proto3";
        |package prop;
        |message Inner { string s = 1; repeated int64 xs = 2; }
        |message Doc {
        |  int64 a = 1;
        |  string b = 2;
        |  double c = 3;
        |  bool d = 4;
        |  sint32 e = 5;
        |  repeated string tags = 6;
        |  Inner inner = 7;
        |  map<string, string> m = 8;
        |}""".stripMargin
    val reg = ProtoSchema.parse(Seq(schema))
    // Generators avoid proto3 implicit-presence ambiguity: non-optional
    // scalars that equal their default are omitted from the wire, so the
    // identity law holds for non-default values (the gate queries cover the
    // default-handling side via emit_unpopulated / coalesce).
    val strGen = Gen.alphaNumStr.map(_.take(12)).suchThat(_.nonEmpty)
    val docGen: Gen[String] = for {
      a <- Gen.choose(1L, Long.MaxValue)
      b <- strGen
      // fractional-only: whole doubles render in integer form (protojson),
      // which is the same VALUE but a different parsed TYPE on compare
      c <- Gen.choose(-1e6, 1e6).suchThat(x => x != math.rint(x))
      e <- Gen.oneOf(Gen.choose(Int.MinValue, -1), Gen.choose(1, Int.MaxValue))
      tags <- Gen.listOfN(3, strGen)
      xs <- Gen.listOfN(4, Gen.choose(Long.MinValue, Long.MaxValue))
      s <- strGen
      mk <- strGen
      mv <- strGen
    } yield {
      val tagsJs = tags.map(t => s""""$t"""").mkString("[", ",", "]")
      val xsJs = xs.map(x => s""""$x"""").mkString("[", ",", "]")
      s"""{"a":"$a","b":"$b","c":$c,"d":true,"e":$e,"tags":$tagsJs,""" +
        s""""inner":{"s":"$s","xs":$xsJs},"m":{"$mk":"$mv"}}"""
    }
    for (doc <- samples(docGen, 40)) {
      val wire = ProtoSchema.fromJson(reg, "prop.Doc", doc, discardUnknown = false)
      val back = ProtoSchema.toJson(reg, "prop.Doc", wire)
      // structural equality (key order is canonical on the way back)
      assert(graft.blob.Interp.parseJsonTyped(back) == graft.blob.Interp.parseJsonTyped(doc),
        s"round-trip drifted:\n  in:  $doc\n  out: $back")
    }
  }

  test("bcrypt/argon2 laws: verify(hash(pw)) holds, wrong password rejected, 72-byte truncation") {
    import graft.functions.{Argon2, Bcrypt}
    val pwGen = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(30)),
      Gen.listOf(Gen.oneOf("é", "ü", "中", "🙂", "a", " ")).map(_.mkString.take(20)))
    for ((pw, i) <- samples(pwGen, 8).zipWithIndex) {
      val bh = Bcrypt.hash(pw, Bcrypt.saltFromSeed(4, i.toLong))
      assert(Bcrypt.check(pw, bh), s"bcrypt self-verify failed for ${pw.length}-char pw")
      assert(!Bcrypt.check(pw + "x", bh))
      val ah = Argon2.hash(pw, Argon2.saltFromSeed(i.toLong), variant = 2, t = 1, mKiB = 8, p = 1)
      assert(Argon2.check(pw, ah), s"argon2 self-verify failed for ${pw.length}-char pw")
      assert(!Argon2.check(pw + "x", ah))
    }
    // bcrypt truncates the key at 72 bytes (crypt(3) law): same prefix → same hash
    val long1 = "a" * 72 + "tail-one"
    val long2 = "a" * 72 + "other-tail"
    val salt = Bcrypt.saltFromSeed(4, 99L)
    assert(Bcrypt.hash(long1, salt) === Bcrypt.hash(long2, salt))
    // …but argon2 does NOT truncate
    assert(Argon2.hash(long1, Argon2.saltFromSeed(99L), 2, 1, 8, 1) !==
      Argon2.hash(long2, Argon2.saltFromSeed(99L), 2, 1, 8, 1))
  }

  test("nanoid: 21 chars from the 64-char alphabet, never throws (1000 draws)") {
    val alphabet = "useandom-26T198340PX75pxJACKVERYMINDBUSHWOLF_GQZbfghjklqvwyzrict".toSet
    for (_ <- 1 to 1000) {
      val id = Udfs.nanoid()
      assert(id.length == 21)
      assert(id.forall(alphabet.contains))
    }
  }

  test("ascii85/z85 round-trip; z85 requires 4-byte alignment") {
    for (bs <- samples(bytesGen))
      assert(Codecs.ascii85Decode(Codecs.ascii85Encode(bs)).toSeq == bs.toSeq)
    for (bs0 <- samples(bytesGen)) {
      val bs = bs0.take(bs0.length / 4 * 4)
      assert(Codecs.z85Decode(Codecs.z85Encode(bs)).toSeq == bs.toSeq)
    }
  }

  test("protobuf wire codec round-trips arbitrary flat documents") {
    val desc = Formats.protoDescriptor("1:int64:a,2:string:s,3:double:d")
    val docGen = for {
      a <- Gen.chooseNum(0L, 1L << 60)
      s <- Gen.asciiPrintableStr.map(_.filter(c => c != '"' && c != '\\'))
      d <- Gen.chooseNum(-1e12, 1e12)
    } yield (a, s, d)
    for ((a, s, d) <- samples(docGen)) {
      val dStr = graft.blob.Interp.fmtDouble(d)
      val json = s"""{"a":$a,"s":"$s","d":$dStr}"""
      val back = Formats.protoToJson(Formats.protoFromJson(json, desc), desc)
      val m = graft.blob.Interp.parseJsonTyped(back).asInstanceOf[Map[String, Any]]
      assert(m("a") == a && m("s") == s)
      // double survives bit-exactly through fixed64
      assert(java.lang.Double.doubleToLongBits(graft.blob.Interp.toNum(m("d"))) ==
        java.lang.Double.doubleToLongBits(dStr.toDouble))
    }
  }

  test("avro codec round-trips arbitrary long/string records with correct zigzag length") {
    val schema = """{"type":"record","name":"r","fields":[
      {"name":"x","type":"long"},{"name":"s","type":"string"}]}"""
    val gen = for {
      x <- Arbitrary.arbitrary[Long]
      s <- Gen.asciiPrintableStr.map(_.filter(c => c != '"' && c != '\\').take(90))
    } yield (x, s)
    // avro longs AND string lengths are zigzag varints
    def zzVarintLen(v: Long): Int = {
      val zz = (v << 1) ^ (v >> 63)
      math.max(1, (70 - java.lang.Long.numberOfLeadingZeros(zz)) / 7)
    }
    for ((x, s) <- samples(gen)) {
      val bytes = Formats.avroFromJson(s"""{"x":$x,"s":"$s"}""", schema)
      val sLen = s.getBytes("UTF-8").length
      assert(bytes.length == zzVarintLen(x) + zzVarintLen(sLen) + sLen,
        s"x=$x sLen=$sLen got=${bytes.length}")
      val back = Formats.avroToJson(bytes, schema)
      assert(graft.blob.Interp.parseJsonTyped(back)
        .asInstanceOf[Map[String, Any]]("x") == x)
    }
  }

  test("schema registry framing: id round-trips over the full non-negative int range") {
    for (id <- samples(Gen.chooseNum(0, Int.MaxValue))) {
      val (gotId, payload) = Formats.schemaRegistryUnframe(
        Formats.schemaRegistryFrame(Array[Byte](1, 2, 3), id))
      assert(gotId == id && payload.toSeq == Seq[Byte](1, 2, 3))
    }
  }

  test("batch policy count law: every batch except the last has exactly n rows") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    for ((n, rows) <- samples(Gen.zip(Gen.chooseNum(1, 15), Gen.chooseNum(1, 50)), 8)) {
      val df = (0 until rows).map(i => (1L, i.toLong)).toDF("k", "o")
      val sizes = graft.operators.BatchPolicy.byCount(df, col("k"), col("o"), n)
        .groupBy("batch_id").count().orderBy("batch_id")
        .select("count").as[Long].collect().toSeq
      assert(sizes.init.forall(_ == n.toLong))
      assert(sizes.last <= n.toLong && sizes.last >= 1)
      assert(sizes.sum == rows.toLong)
    }
  }
}
