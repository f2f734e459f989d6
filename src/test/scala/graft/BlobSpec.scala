package graft

import graft.functions.{Blob, Udfs}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bloblang-method equivalence: golden cases from the reference docs
  * (website/docs/guides/bloblang/methods.md examples, re-derived). */
class BlobSpec extends SparkSpec {
  import spark.implicits._

  private def eval1[T](c: Column): T =
    Seq(1).toDF("one").select(c.as("r")).collect().head.getAs[T]("r")

  /** Array results come back as mutable ArraySeq — normalize to List. */
  private def evalSeq[T](c: Column): Seq[T] =
    eval1[scala.collection.Seq[T]](c).toList

  test("string methods") {
    assert(eval1[String](Blob.uppercase(lit("hello world"))) == "HELLO WORLD")
    assert(eval1[String](Blob.capitalize(lit("hello world"))) == "Hello World")
    assert(eval1[String](Blob.reverseS(lit("abc"))) == "cba")
    assert(eval1[String](Blob.trimPrefix(lit("v2_name"), "v2_")) == "name")
    assert(eval1[String](Blob.trimPrefix(lit("name"), "v2_")) == "name")
    assert(eval1[String](Blob.trimSuffix(lit("name.json"), ".json")) == "name")
    assert(eval1[String](Blob.replaceAll(lit("a.b.c"), ".", "-")) == "a-b-c") // literal, not regex
    assert(eval1[String](Blob.quote(lit("a\"b\nc"))) == "\"a\\\"b\\nc\"")
    assert(eval1[Int](Blob.indexOf(lit("hello"), "llo")) == 2) // bento is 0-based
    assert(eval1[Boolean](Blob.hasPrefix(lit("foobar"), lit("foo"))))
    assert(eval1[Boolean](Blob.hasSuffix(lit("foobar"), lit("bar"))))
    assert(eval1[String](Blob.formatS("%s-%d", lit("x"), lit(7))) == "x-7")
    assert(eval1[String](Blob.slice(lit("hello world"), 0, 5)) == "hello")
    assert(evalSeq[String](Blob.splitS(lit("a.b.c"), ".")) == Seq("a", "b", "c"))
  }

  test("regex methods") {
    assert(eval1[Boolean](Blob.reMatch(lit("foo123"), "[0-9]+")))
    assert(eval1[String](Blob.reReplaceAll(lit("a1b2"), "[0-9]", "#")) == "a#b#")
    assert(evalSeq[String](Blob.reFindAll(lit("a1 b22 c333"), "[0-9]+")) == Seq("1", "22", "333"))
    assert(eval1[String](Blob.reFind(lit("key=value"), "key=(\\w+)", 1)) == "value")
  }

  test("encoding and hashing") {
    assert(eval1[String](Blob.encodeBase64(lit("hello"))) == "aGVsbG8=")
    assert(eval1[String](Blob.decodeBase64(lit("aGVsbG8=")).cast("string")) == "hello")
    assert(eval1[String](Blob.encodeHex(lit("hi"))) == "6869")
    assert(eval1[String](Blob.hashMd5(lit("abc"))) == "900150983cd24fb0d6963f7d28e17f72")
    assert(eval1[String](Blob.hashSha256(lit("abc"))) ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(eval1[Long](Blob.hashCrc32(lit("abc"))) == 891568578L)
  }

  test("structured methods: arrays and maps") {
    val arr = array(lit(3), lit(1), lit(2))
    assert(evalSeq[Int](Blob.sortA(arr)) == Seq(1, 2, 3))
    assert(evalSeq[Int](Blob.uniqueA(array(lit(1), lit(1), lit(2)))) == Seq(1, 2))
    assert(eval1[Int](Blob.index(arr, 0)) == 3) // 0-based like bento
    assert(eval1[Int](Blob.lengthA(arr)) == 3)
    assert(eval1[Double](Blob.sumA(arr)) == 6.0)
    assert(evalSeq[Int](Blob.mapEach(arr, _ * 10)) == Seq(30, 10, 20))
    assert(evalSeq[Int](Blob.filterA(arr, _ > 1)) == Seq(3, 2))
    assert(eval1[Int](Blob.fold(arr, lit(0), (a, v) => a + v)) == 6)
    assert(eval1[Boolean](Blob.all(arr, _ > 0)))
    assert(!eval1[Boolean](Blob.any(arr, _ > 5)))
    assert(evalSeq[Int](Blob.rangeA(0, 3)) == Seq(0, 1, 2))
    val m = map(lit("a"), lit(1), lit("b"), lit(2))
    assert(evalSeq[String](Blob.keys(m)).toSet == Set("a", "b"))
    assert(eval1[Map[String, Int]](Blob.withoutKeys(m, Seq("a"))) == Map("b" -> 2))
    assert(evalSeq[org.apache.spark.sql.Row](Blob.enumerated(array(lit("x"), lit("y"))))
      .map(r => (r.getInt(0), r.getString(1))) == Seq((0, "x"), (1, "y")))
  }

  test("coercion, pipe and match") {
    assert(eval1[Double](Blob.number(lit("1.5"))) == 1.5)
    assert(eval1[String](Blob.pipe(lit(null).cast("string"), lit("fallback"))) == "fallback")
    assert(eval1[String](Blob.matchCase(
      Seq((lit(false), lit("a")), (lit(true), lit("b"))), lit("dflt"))) == "b")
    assert(eval1[String](Blob.iff(lit(1) > 0, lit("pos"), lit("neg"))) == "pos")
  }

  test("timestamps") {
    assert(eval1[Long](Blob.tsUnix(Blob.tsParse(lit("2024-01-02 03:04:05"), "yyyy-MM-dd HH:mm:ss")))
      == 1704164645L)
    assert(eval1[String](Blob.tsFormat(timestamp_seconds(lit(1704164645L)), "yyyy/MM/dd"))
      == "2024/01/02")
  }

  test("cosine similarity on known vectors") {
    val a = array(lit(1.0), lit(0.0))
    val b = array(lit(0.0), lit(1.0))
    assert(eval1[Double](Blob.cosineSimilarity(a, a)) == 1.0)
    assert(eval1[Double](Blob.cosineSimilarity(a, b)) == 0.0)
    assert(math.abs(eval1[Double](Blob.cosineSimilarity(
      array(lit(1.0), lit(1.0)), a)) - math.sqrt(0.5)) < 1e-12)
  }

  test("UDF long tail: gzip roundtrip, slug, strip_html, durations, form-url") {
    val payload = "the quick brown fox".getBytes("UTF-8")
    assert(Udfs.gzipDecompress(Udfs.gzipCompress(payload)).toSeq == payload.toSeq)
    assert(Udfs.slug("Hello, World! Héllo") == "hello-world-hello")
    assert(Udfs.stripHtml("<p>Hi <b>there</b></p><script>x<y</script>") == "Hi there")
    assert(Udfs.parseDuration("1h30m") == 5400L * 1000000000L)
    assert(Udfs.parseDuration("250ms") == 250000000L)
    assert(Udfs.parseDurationIso("PT1H30M") == 5400L * 1000000000L)
    assert(Udfs.parseFormUrlEncoded("a=1&b=hello%20world") == Map("a" -> "1", "b" -> "hello world"))
    val (re, names) = Udfs.grokToRegex("%{IP:ip} - %{WORD:user}")
    assert(names == Seq("ip", "user"))
    assert("10.0.0.1 - alice".matches(re))
  }

  test("registered SQL functions are callable from spark.sql") {
    val r = spark.sql("SELECT blob_slug('A B'), blob_parse_duration('2s')").collect().head
    assert(r.getString(0) == "a-b")
    assert(r.getLong(1) == 2000000000L)
  }
}
