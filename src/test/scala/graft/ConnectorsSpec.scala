package graft

import graft.conn.{Outputs, Sources}
import graft.core.Msg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Scanner + output-routing + checkpoint-recovery tests (SURVEY §2.5-2.8). */
class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit(); d
  }
  private def write(f: java.io.File, s: String): Unit =
    java.nio.file.Files.writeString(f.toPath, s)

  test("lines scanner reads one message per line") {
    val d = tmpDir("lines")
    write(new java.io.File(d, "a.txt"), "one\ntwo\nthree")
    val got = Sources.lines(spark, d.getPath).as[String].collect().sorted
    assert(got.toSeq == Seq("one", "three", "two"))
  }

  test("csv scanner reads header + typed columns") {
    val d = tmpDir("csv")
    write(new java.io.File(d, "a.csv"), "name,n\nalpha,1\nbeta,2")
    val got = Sources.csv(spark, d.getPath).orderBy("n")
      .as[(String, Int)].collect()
    assert(got.toSeq == Seq(("alpha", 1), ("beta", 2)))
  }

  test("json_documents scanner reads multi-line docs") {
    val d = tmpDir("jsond")
    write(new java.io.File(d, "a.json"), "{\n  \"k\": 1\n}")
    val got = Sources.jsonDocuments(spark, d.getPath, multiLine = true)
      .select("k").as[Long].collect()
    assert(got.toSeq == Seq(1L))
  }

  test("chunker scanner splits file bytes into fixed chunks") {
    val d = tmpDir("chunk")
    write(new java.io.File(d, "a.txt"), "abcdefghij")
    val got = Sources.chunker(spark, d.getPath, 4).orderBy("chunk_idx")
      .select("content").as[String].collect()
    assert(got.toSeq == Seq("abcd", "efgh", "ij"))
  }

  test("chunker scanner crosses newlines (DOTALL split)") {
    val d = tmpDir("chunknl")
    write(new java.io.File(d, "a.txt"), "ab\ncd\nef\ngh")
    val got = Sources.chunker(spark, d.getPath, 4).orderBy("chunk_idx")
      .select("content").as[String].collect()
    assert(got.toSeq == Seq("ab\nc", "d\nef", "\ngh"))
  }

  test("byte-exact chunker slices raw bytes of multi-byte content") {
    val d = tmpDir("chunkb")
    // "é" is 2 bytes in UTF-8 — the text chunker would slice at character 4,
    // the byte chunker must slice at byte 4, splitting mid-codepoint.
    val bytes = "aébécd".getBytes("UTF-8") // 8 bytes: 61 C3A9 62 C3A9 63 64
    java.nio.file.Files.write(new java.io.File(d, "a.bin").toPath, bytes)
    val got = Sources.chunkerBytes(spark, d.getPath, 4).orderBy("chunk_idx")
      .select("content").as[Array[Byte]].collect()
    assert(got.map(_.toSeq).toSeq == bytes.grouped(4).map(_.toSeq).toSeq)
    assert(got.forall(_.length <= 4) && got.map(_.length).sum == bytes.length)
  }

  test("skip_bom scanner strips a BOM") {
    val df = Seq("﻿hello", "plain").toDF("content")
    val got = Sources.skipBom(df).as[String].collect().sorted
    assert(got.toSeq == Seq("hello", "plain"))
  }

  test("to_the_end, re_match, xml_documents, decompress scanners frame correctly") {
    val d = tmpDir("scan")
    write(new java.io.File(d, "log.txt"), "INFO a b\nmore\nWARN c\nINFO d")
    assert(Sources.toTheEnd(spark, d.getPath).as[String].collect().head
      == "INFO a b\nmore\nWARN c\nINFO d")
    // re_match: each (INFO|WARN) opens a message and belongs to it
    val msgs = Sources.reMatch(spark, d.getPath, "(INFO|WARN)")
      .orderBy("msg_idx").select("content").as[String].collect().toSeq
    assert(msgs == Seq("INFO a b\nmore\n", "WARN c\n", "INFO d"))

    val dx = tmpDir("xml")
    write(new java.io.File(dx, "docs.xml"),
      "<root><doc id=\"1\"><v>a</v></doc>junk<doc id=\"2\"><v>b</v></doc></root>")
    val xs = Sources.xmlDocuments(spark, dx.getPath, "doc").as[String].collect().sorted.toSeq
    assert(xs == Seq("<doc id=\"1\"><v>a</v></doc>", "<doc id=\"2\"><v>b</v></doc>"))

    val dz = tmpDir("gz")
    val gz = new java.io.File(dz, "x.gz")
    java.nio.file.Files.write(gz.toPath,
      graft.functions.Udfs.gzipCompress("packed\npayload".getBytes("UTF-8")))
    val inflated = Sources.decompress(spark, dz.getPath, "gzip")
      .select("content").as[String].collect().head
    assert(inflated == "packed\npayload")

    // avro scanner: write an OCF with the avro lib, read via the scanner
    val da = tmpDir("avro")
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}""")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
    w.create(schema, new java.io.File(da, "data.avro"))
    for (i <- 1 to 3) {
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put("x", i.toLong); w.append(rec)
    }
    w.close()
    val av = Sources.avroScanner(spark, da.getPath).as[String].collect().sorted.toSeq
    assert(av == Seq("""{"x": 1}""", """{"x": 2}""", """{"x": 3}"""))

    // switch scanner: per-glob scanner choice, unioned
    val sw = Sources.switchScanner(spark, Seq(
      "*.txt" -> (s => Sources.lines(s, d.getPath)),
      "*.xml" -> (s => Sources.xmlDocuments(s, dx.getPath, "doc").toDF("content"))))
    assert(sw.count() == 4 + 2)
  }

  test("YAML pipeline config: file input -> mapping/jq/dedupe -> file output end-to-end") {
    import graft.conn.PipelineConfig
    val in = tmpDir("cfgin")
    val out = tmpDir("cfgout")
    write(new java.io.File(in, "data.jsonl"),
      """{"user":"a","n":1}
        |{"user":"b","n":2}
        |{"user":"a","n":3}
        |{"user":"c","n":60}""".stripMargin)
    val cfg = s"""
input:
  file:
    paths: [ ${in.getPath}/*.jsonl ]
    scanner:
      lines: {}
pipeline:
  processors:
    - mapping: |
        root.user = this.user
        root.score = this.n * 10
        root = if this.n > 50 { deleted() }
    - dedupe:
        key: "$${! json(\\"user\\") }"
output:
  file:
    path: ${out.getPath}/result
"""
    val loaded = PipelineConfig.load(cfg)
    val df = loaded.run(spark)
    // deleted() dropped n=60; dedupe kept first message per user
    val got = spark.read.text(out.getPath + "/result").as[String].collect()
      .map(s => graft.blob.Interp.parseJsonTyped(s).asInstanceOf[Map[String, Any]])
      .map(m => m("user").toString -> m("score")).toMap
    assert(got == Map("a" -> 10L, "b" -> 20L))
    assert(df.columns.contains(Msg.ContentCol)) // envelope survives the run

    // generate input + jq + template compose the same way
    val cfg2 = """
input:
  generate:
    count: 3
    mapping: 'root.v = this.seq_id.number() + 1'
pipeline:
  processors:
    - jq:
        query: ".v"
"""
    val vals = PipelineConfig.load(cfg2).run(spark)
      .select(Msg.ContentCol).as[String].collect().sorted.toSeq
    assert(vals == Seq("1", "2", "3"))
  }

  test("YAML config switch/try/catch: checks route, errors flow to catch branch") {
    import graft.conn.PipelineConfig
    val cfg = """
input:
  generate:
    count: 4
    mapping: 'root.n = this.seq_id.number()'
pipeline:
  processors:
    - switch:
        - check: 'this.n >= 2'
          processors:
            - mapping: 'root.big = this.n'
        - processors:
            - mapping: 'root.small = this.n'
    - try:
        - mapping: 'root.v = this.big.not_null()'
    - catch:
        - mapping: 'root = {"v": -1}'
"""
    val out = PipelineConfig.load(cfg).run(spark)
      .select(get_json_object(col(Msg.ContentCol), "$.v").cast("long")).as[Long]
      .collect().sorted.toSeq
    // n=0,1 -> small branch -> try fails (-1 via catch); n=2,3 -> big -> v=n
    assert(out == Seq(-1L, -1L, 2L, 3L))
  }

  test("YAML config branch: request_map -> child -> result_map grafts onto the original") {
    import graft.conn.PipelineConfig
    val cfg = """
input:
  generate:
    count: 3
    mapping: 'root.n = this.seq_id.number()'
pipeline:
  processors:
    - branch:
        request_map: 'root.v = this.n * 10'
        processors:
          - mapping: 'root.doubled = this.v * 2'
        result_map: 'root.enriched = this.doubled'
"""
    val rows = PipelineConfig.load(cfg).run(spark)
      .select(
        get_json_object(col(Msg.ContentCol), "$.n").cast("long"),
        get_json_object(col(Msg.ContentCol), "$.enriched").cast("long"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    // original field n survives; enriched = n*10*2
    assert(rows == Seq((0L, 0L), (1L, 20L), (2L, 40L)))
  }

  test("YAML config group_by, while, and output broker/switch routing") {
    import graft.conn.PipelineConfig
    val outA = tmpDir("swa"); val outB = tmpDir("swb")
    val cfg = s"""
input:
  generate:
    count: 6
    mapping: 'root.n = this.seq_id.number()'
pipeline:
  processors:
    - group_by:
        - check: 'this.n < 2'
          processors:
            - mapping: 'root = {"n": this.n, "g": "low"}'
        - check: 'this.n >= 2'
          processors:
            - mapping: 'root = {"n": this.n, "g": "high"}'
    - while:
        check: 'this.n < 4'
        max_loops: 10
        processors:
          - mapping: 'root = {"n": this.n + 2, "g": this.g}'
output:
  switch:
    cases:
      - check: 'this.g == "low"'
        output:
          file:
            path: ${outA.getPath}/r
      - output:
          file:
            path: ${outB.getPath}/r
"""
    PipelineConfig.load(cfg).run(spark)
    def read(d: java.io.File): Seq[Long] = spark.read.text(d.getPath + "/r").as[String].collect()
      .map(s => graft.blob.Interp.toLong(
        graft.blob.Interp.parseJsonTyped(s).asInstanceOf[Map[String, Any]]("n"))).toSeq.sorted
    // while runs children on the whole batch until no row passes the
    // check: two iterations (+2 each) since low rows start at 0/1
    assert(read(outA) == Seq(4L, 5L))
    assert(read(outB) == Seq(6L, 7L, 8L, 9L))
  }

  test("output switch routes rows to first matching sink; default gets rest") {
    val (hi, mid, rest) = (collector(), collector(), collector())
    val df = Seq(500, 50, 5).toDF("n")
    Outputs.switch(Seq(
      (col("n") >= 100) -> hi.sink,
      (col("n") >= 10) -> mid.sink),
      default = Some(rest.sink))(df, 0L)
    assert(hi.rows == Set(500) && mid.rows == Set(50) && rest.rows == Set(5))
  }

  test("output broker fan_out delivers every batch to every sink") {
    val (a, b) = (collector(), collector())
    Outputs.fanOut(Seq(a.sink, b.sink))(Seq(1, 2).toDF("n"), 0L)
    assert(a.rows == Set(1, 2) && b.rows == Set(1, 2))
  }

  test("output round_robin alternates sinks by batch id") {
    val (a, b) = (collector(), collector())
    val router = Outputs.roundRobin(Seq(a.sink, b.sink))
    router(Seq(1).toDF("n"), 0L)
    router(Seq(2).toDF("n"), 1L)
    router(Seq(3).toDF("n"), 2L)
    assert(a.rows == Set(1, 3) && b.rows == Set(2))
  }

  test("output fallback tries next sink on failure; retry retries then succeeds") {
    val ok = collector()
    var calls = 0
    val flaky: Outputs.Sink = { df =>
      calls += 1
      if (calls < 3) throw new RuntimeException("down")
      ok.sink(df)
    }
    Outputs.fallback(Seq(_ => throw new RuntimeException("dead"), ok.sink))(Seq(7).toDF("n"), 0L)
    assert(ok.rows == Set(7))
    ok.clear()
    Outputs.retrySink(flaky, maxAttempts = 3, backoffMs = 1)(Seq(9).toDF("n"))
    assert(calls == 3 && ok.rows == Set(9))
    intercept[RuntimeException] {
      Outputs.fallback(Seq(_ => throw new RuntimeException("a")))(Seq(1).toDF("n"), 0L)
    }
  }

  test("withDlq splits errored rows to the dlq sink") {
    val (main, dlq) = (collector(), collector())
    val df = Seq((1, null: String), (2, "bad")).toDF("n", Msg.ErrorCol)
    Outputs.withDlq(main.sink, dlq.sink)(df, 0L)
    assert(main.rows == Set(1) && dlq.rows == Set(2))
  }

  test("checkpointed stream resumes after stop without duplicating batches") {
    val in = tmpDir("ckpt-in")
    val out = tmpDir("ckpt-out")
    val ckpt = tmpDir("ckpt-meta")
    write(new java.io.File(in, "f1.json"), """{"n": 1}""" + "\n" + """{"n": 2}""")

    def start() = Outputs.start(
      Sources.fileStream(spark, in.getPath, "n LONG", maxFilesPerTrigger = 1),
      (df, _) => if (!df.isEmpty)
        df.write.mode("append").parquet(out.getPath),
      ckpt.getPath,
      Trigger.AvailableNow())

    val q1 = start(); q1.awaitTermination(60000)
    assert(spark.read.parquet(out.getPath).count() == 2)

    // new file arrives while stopped; restart from the same checkpoint:
    // f1 must NOT be reprocessed (offsets come from the checkpoint log)
    write(new java.io.File(in, "f2.json"), """{"n": 3}""")
    val q2 = start(); q2.awaitTermination(60000)
    val got = spark.read.parquet(out.getPath).select("n").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L), s"expected exactly-once resume, got ${got.toSeq}")
  }

  test("kafka reader wiring exposes the connector option set") {
    // connector jar is not bundled here; assert the configured options
    // (the part we own) rather than a live connection
    val r = Sources.kafkaReader(spark, "broker:9092", "events", "earliest", Some(500L))
    // DataStreamReader has no public option inspection; round-trip through
    // its toString/load failure is environment-dependent — assert the
    // envelope transform instead on a kafka-shaped frame
    val frame = Seq(("k", "v", "events", 0, 42L)).toDF("key", "value", "topic", "partition", "offset")
    val env = Sources.kafkaToEnvelope(frame).collect().head
    assert(env.getAs[String](Msg.ContentCol) == "v")
    assert(env.getAs[Map[String, String]](Msg.MetaCol)("kafka_offset") == "42")
    assert(env.getAs[Long](Msg.SeqCol) == 42L)
  }

  private case class Collector(buf: scala.collection.mutable.Set[Int]) {
    val sink: Outputs.Sink = df => buf ++= df.select(df.columns.head).as[Int](implicitly).collect()
    def rows: Set[Int] = buf.toSet
    def clear(): Unit = buf.clear()
  }
  private def collector(): Collector = Collector(scala.collection.mutable.Set.empty[Int])
}
