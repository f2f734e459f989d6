package graft

import graft.core.Msg
import graft.operators.OpenSnowcat
import graft.operators.OpenSnowcat.{Config, Transform}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.immutable.VectorMap

/** opensnowcat processor contract, porting the reference's own cases
  * (internal/impl/opensnowcat/processor_opensnowcat_test.go:22-788 over
  * testdata/page_view.tsv): TSV→flattened-JSON, TSV→enriched-JSON,
  * drop filters on direct columns and iglu schema property paths (OR
  * logic), PII transforms, set_metadata, schema discovery. */
class OpenSnowcatSpec extends SparkSpec {

  // In-repo copy of the reference's public-format page_view.tsv fixture
  // (a sample Snowplow enriched event in the PUBLIC 131-column format) —
  // no runtime path dependency on the reference checkout.
  private lazy val pageView: String = {
    val in = getClass.getResourceAsStream("/page_view.tsv")
    try new String(in.readAllBytes(), "UTF-8").stripSuffix("\n") finally in.close()
  }

  private def envelope(lines: String*): DataFrame = {
    import spark.implicits._
    lines.toDF("raw").select(
      col("raw").as(Msg.ContentCol),
      map().cast("map<string,string>").as(Msg.MetaCol),
      lit(null).cast("string").as(Msg.ErrorCol),
      monotonically_increasing_id().as(Msg.SeqCol))
  }

  private def run(cfg: Config, lines: String*): Seq[(String, Map[String, String])] =
    OpenSnowcat.processor(cfg)(envelope(lines: _*))
      .select(col(Msg.ContentCol), col(Msg.MetaCol))
      .collect().toSeq
      .map(r => (r.getString(0), Option(r.getMap[String, String](1)).map {
        m => scala.collection.mutable.Map(m.toSeq: _*).toMap
      }.getOrElse(Map.empty)))

  private def parse(s: String): VectorMap[String, Any] =
    graft.blob.Interp.parseJsonTyped(s).asInstanceOf[VectorMap[String, Any]]

  test("json format flattens the real page_view TSV (reference TestProcessPageViewJSON)") {
    val Seq((json, _)) = run(Config(outputFormat = "json"), pageView)
    val m = parse(json)
    assert(m("app_id") == "snwcat")
    assert(m("event") == "page_view")
    assert(m("event_id") == "9fd5fd06-24ad-471b-9f73-f1a054cb0b31")
    assert(m("user_id") == "joaocorreia")

    val ua = m("contexts_com_snowplowanalytics_snowplow_ua_parser_context_1")
      .asInstanceOf[Vector[Any]]
    assert(ua.length == 1)
    val ua0 = ua.head.asInstanceOf[VectorMap[String, Any]]
    assert(ua0("useragentFamily") == "Chrome")
    assert(ua0("osFamily") == "Mac OS X")

    val wp = m("contexts_com_snowplowanalytics_snowplow_web_page_1").asInstanceOf[Vector[Any]]
    assert(wp.head.asInstanceOf[VectorMap[String, Any]]("id") ==
      "9689656e-ebab-4c10-9413-59a6dcefadd2")

    val fp = m("contexts_com_fingerprintjs_fingerprint_1").asInstanceOf[Vector[Any]]
    assert(fp.head.asInstanceOf[VectorMap[String, Any]]("visitorId") == "nmnY3NEe0lGJc4tzh5KM")

    // nested objects preserved: data[0].city.names.en
    val loc = m("contexts_com_dbip_location_1").asInstanceOf[Vector[Any]]
    val names = loc.head.asInstanceOf[VectorMap[String, Any]]("city")
      .asInstanceOf[VectorMap[String, Any]]("names").asInstanceOf[VectorMap[String, Any]]
    assert(names("en") == "Del Mar")

    // arrays within contexts preserved, multiple items in one schema key
    val cookies = m("contexts_org_ietf_http_cookie_1").asInstanceOf[Vector[Any]]
    assert(cookies.length >= 2)
    assert(cookies(0).asInstanceOf[VectorMap[String, Any]]("name") == "_gaexp")
    assert(cookies(1).asInstanceOf[VectorMap[String, Any]]("name") == "ajs_user_id")

    val clearbit = m("contexts_com_clearbit_company_1").asInstanceOf[Vector[Any]]
      .head.asInstanceOf[VectorMap[String, Any]]
    assert(clearbit("name") == "SnowcatCloud")
    assert(clearbit("tech").asInstanceOf[Vector[Any]].head == "google_apps")

    // camelCase iglu names flatten to snake_case
    assert(m.contains("contexts_org_w3_performance_timing_1"))
    // typed top-level fields: tstamps to ISO, ints, booleans
    assert(m("collector_tstamp") == "2022-03-21T22:12:43.358Z")
    assert(m("domain_sessionidx") == 36L)
  }

  test("tsv format passes through unchanged when nothing matches") {
    val Seq((out, _)) = run(Config(outputFormat = "tsv"), pageView)
    assert(out == pageView)
  }

  test("drop filter on direct column (reference TestProcessPageViewTSV_FilterByIP)") {
    assert(run(Config(drop = Map("user_ipaddress" -> Seq("75.80.110.186"))), pageView).isEmpty)
    // non-matching filter keeps the event byte-identical
    val kept = run(Config(drop = Map("user_ipaddress" -> Seq("192.168.1.1"))), pageView)
    assert(kept.map(_._1) == Seq(pageView))
  }

  test("drop filter on iglu schema property path (reference FilterBySchemaProperty)") {
    val path = "com_snowplowanalytics_snowplow_ua_parser_context.useragentFamily"
    assert(run(Config(drop = Map(path -> Seq("Chrome"))), pageView).isEmpty)
    assert(run(Config(drop = Map(path -> Seq("Firefox"))), pageView).map(_._1) == Seq(pageView))
    val osPath = "com_snowplowanalytics_snowplow_ua_parser_context.osFamily"
    assert(run(Config(drop = Map(osPath -> Seq("Mac OS X"))), pageView).isEmpty)
  }

  test("multiple drop filters use OR logic (reference FilterMultipleConditions)") {
    val cfg = Config(drop = Map(
      "user_ipaddress" -> Seq("192.168.1.1"), // no match
      "useragent" -> Seq("bot", "crawler"), // no match
      "com_snowplowanalytics_snowplow_ua_parser_context.useragentFamily" ->
        Seq("Firefox", "Safari"), // no match
      "com_snowplowanalytics_snowplow_ua_parser_context.osFamily" ->
        Seq("Mac OS X"), // MATCH -> drop
      "nl.basjes.yauaa_context.deviceClass" -> Seq("Phone"))) // no match
    assert(run(cfg, pageView).isEmpty)

    val none = cfg.copy(drop = cfg.drop.updated(
      "com_snowplowanalytics_snowplow_ua_parser_context.osFamily",
      Seq("Windows", "Linux")))
    assert(run(none, pageView).map(_._1) == Seq(pageView))
  }

  test("PII transforms: hash, redact, anonymize_ip (reference TransformFields)") {
    val cfg = Config(
      outputFormat = "tsv",
      salt = "test-salt-12345", hashAlgo = "SHA-256",
      transforms = Map(
        "user_ipaddress" -> Transform("anonymize_ip", anonOctets = 2, anonSegments = 4),
        "user_id" -> Transform("hash", hashAlgo = "SHA-256", salt = "test-salt-12345"),
        "network_userid" -> Transform("redact", redactValue = "[REDACTED]")))
    val Seq((out, _)) = run(cfg, pageView)
    val cols = out.split("\t", -1)
    assert(cols(OpenSnowcat.colIndex("user_ipaddress")) == "75.80.x.x")
    val uid = cols(OpenSnowcat.colIndex("user_id"))
    assert(uid != "joaocorreia" && uid.length == 64)
    val expected = graft.conn.Aws.SigV4.sha256Hex(
      "joaocorreiatest-salt-12345".getBytes("UTF-8"))
    assert(uid == expected, "hash is sha256(value + salt) hex")
    assert(cols(OpenSnowcat.colIndex("network_userid")) == "[REDACTED]")
    assert(cols(OpenSnowcat.colIndex("app_id")) == "snwcat")
    assert(cols(OpenSnowcat.colIndex("event_id")) == "9fd5fd06-24ad-471b-9f73-f1a054cb0b31")
  }

  test("anonymize_ip masks IPv6 segments and leaves invalid shapes alone") {
    val mk = (ip: String) => {
      val fields = OpenSnowcat.columns.indices.map(i =>
        if (i == OpenSnowcat.colIndex("user_ipaddress")) ip else "v")
      fields.mkString("\t")
    }
    val cfg = Config(outputFormat = "tsv", transforms = Map(
      "user_ipaddress" -> Transform("anonymize_ip", anonOctets = 2, anonSegments = 3)))
    val out = run(cfg, mk("2001:db8:85a3:0:0:8a2e:370:7334"), mk("not-an-ip"), mk(""))
      .map(_._1.split("\t", -1)(OpenSnowcat.colIndex("user_ipaddress")))
    assert(out(0) == "2001:db8:85a3:0:0:x:x:x")
    assert(out(1) == "not-an-ip", "invalid IPv4 shape passes through")
    assert(out(2) == "", "empty value never transformed")
  }

  test("json via the combined single-parse path is byte-identical to the direct build") {
    val cfg = Config(outputFormat = "json",
      setMetadata = Map("ua_family" ->
        "com_snowplowanalytics_snowplow_ua_parser_context.useragentFamily"))
    val Seq((json, meta)) = run(cfg, pageView)
    val direct = OpenSnowcat.flatJson(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(pageView.split("\t", -1)))
    assert(json == direct, "combined path diverged from the direct flat build")
    assert(meta("ua_family") == "Chrome")
  }

  test("enriched_json via the combined single-parse path is byte-identical to the direct build") {
    // a schema-path consumer (set_metadata) + enriched output triggers
    // the combined props+fragment UDF; its spliced output must equal
    // enrichedJson applied directly to the same line
    val cfg = Config(outputFormat = "enriched_json",
      setMetadata = Map("ua_family" ->
        "com_snowplowanalytics_snowplow_ua_parser_context.useragentFamily"))
    val Seq((json, meta)) = run(cfg, pageView)
    val direct = OpenSnowcat.enrichedJson(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(pageView.split("\t", -1)))
    assert(json == direct, "combined path diverged from the direct enriched build")
    assert(meta("ua_family") == "Chrome", "schema-path metadata resolved in the same pass")
  }

  test("enriched_json nests schemas as vendor_name keys (reference TestProcessPageViewEnrichedJSON)") {
    val Seq((json, _)) = run(Config(outputFormat = "enriched_json"), pageView)
    val m = parse(json)
    assert(m("app_id") == "snwcat")
    assert(m("user_id") == "joaocorreia")

    val contexts = m("contexts").asInstanceOf[VectorMap[String, Any]]
    val derived = m("derived_contexts").asInstanceOf[VectorMap[String, Any]]

    val ua = derived("com_snowplowanalytics_snowplow_ua_parser_context")
      .asInstanceOf[VectorMap[String, Any]]
    assert(ua.keySet == Set("version", "data"), "only version and data")
    assert(ua("version") == "1-0-0")
    val uaData = ua("data").asInstanceOf[Vector[Any]]
    assert(uaData.length == 1)
    assert(uaData.head.asInstanceOf[VectorMap[String, Any]]("useragentFamily") == "Chrome")

    val wp = contexts("com_snowplowanalytics_snowplow_web_page")
      .asInstanceOf[VectorMap[String, Any]]
    assert(wp("data").asInstanceOf[Vector[Any]].head
      .asInstanceOf[VectorMap[String, Any]]("id") == "9689656e-ebab-4c10-9413-59a6dcefadd2")

    // multiple items in one schema's data array
    val cookies = derived("org_ietf_http_cookie").asInstanceOf[VectorMap[String, Any]]
    val cookieData = cookies("data").asInstanceOf[Vector[Any]]
    assert(cookieData.length >= 2)
    assert(cookieData(0).asInstanceOf[VectorMap[String, Any]]("name") == "_gaexp")

    // nested path derived_contexts[com_dbip_location].data[0].city.names.en
    val loc = derived("com_dbip_location").asInstanceOf[VectorMap[String, Any]]
    val en = loc("data").asInstanceOf[Vector[Any]].head
      .asInstanceOf[VectorMap[String, Any]]("city").asInstanceOf[VectorMap[String, Any]]("names")
      .asInstanceOf[VectorMap[String, Any]]("en")
    assert(en == "Del Mar")

    // the flattened _1-suffixed keys belong to the json format only
    assert(!m.contains("contexts_com_snowplowanalytics_snowplow_web_page_1"))
    assert(!m.contains("derived_contexts_com_dbip_location_1"))
  }

  test("set_metadata from direct columns and iglu paths (reference TestSetMetadata*)") {
    val cfg = Config(outputFormat = "tsv", setMetadata = Map(
      "eid" -> "event_id",
      "app_id" -> "app_id",
      "user" -> "user_id",
      "fingerprint" -> "event_fingerprint",
      "ua_family" -> "com_snowplowanalytics_snowplow_ua_parser_context.useragentFamily",
      "visitor_id" -> "com_fingerprintjs_fingerprint.visitorId",
      "web_page_id" -> "com_snowplowanalytics_snowplow_web_page.id",
      "txn" -> "txn_id")) // empty column -> key absent
    val Seq((out, meta)) = run(cfg, pageView)
    assert(out == pageView, "TSV payload unchanged")
    assert(meta("eid") == "9fd5fd06-24ad-471b-9f73-f1a054cb0b31")
    assert(meta("app_id") == "snwcat")
    assert(meta("user") == "joaocorreia")
    assert(meta.get("fingerprint").exists(_.nonEmpty))
    assert(meta("ua_family") == "Chrome")
    assert(meta("visitor_id") == "nmnY3NEe0lGJc4tzh5KM")
    assert(meta("web_page_id") == "9689656e-ebab-4c10-9413-59a6dcefadd2")
    assert(!meta.contains("txn"), "empty TSV values never set metadata")
  }

  test("unstruct_event shreds in both formats (SDK unwrap in json; column as-is in enriched)") {
    val unstruct =
      """{"schema":"iglu:com.snowplowanalytics.snowplow/unstruct_event/jsonschema/1-0-0","data":{"schema":"iglu:com.snowplowanalytics.snowplow/link_click/jsonschema/1-0-1","data":{"targetUrl":"https://x.test/a","elementId":"btn"}}}"""
    val fields = OpenSnowcat.columns.map {
      case "app_id" => "a1"; case "event" => "unstruct"
      case "unstruct_event" => unstruct; case _ => ""
    }
    val line = fields.mkString("\t")

    val Seq((flat, _)) = run(Config(outputFormat = "json"), line)
    val fm = parse(flat)
    // flat json unwraps the iglu unstruct_event envelope and keys by the
    // INNER schema, snake_cased with the model suffix
    val lc = fm("unstruct_event_com_snowplowanalytics_snowplow_link_click_1")
      .asInstanceOf[VectorMap[String, Any]]
    assert(lc("targetUrl") == "https://x.test/a" && lc("elementId") == "btn")
    assert(!fm.contains("unstruct_event"), "raw column never passes through in json format")

    val Seq((enr, _)) = run(Config(outputFormat = "enriched_json"), line)
    val em = parse(enr)
    // enriched_json keys by the COLUMN's own schema (reference
    // parseUnstructEventFromTSV reads the envelope map directly)
    val ue = em("unstruct_event").asInstanceOf[VectorMap[String, Any]]
    val wrap = ue("com_snowplowanalytics_snowplow_unstruct_event").asInstanceOf[VectorMap[String, Any]]
    assert(wrap("version") == "1-0-0")
    assert(wrap("data").asInstanceOf[Vector[Any]].length == 1)
  }

  test("schema extractor table (reference TestExtractSchemasFromEvent, all 8 cases)") {
    val sp = "iglu:com.snowplowanalytics.snowplow"
    def wrap(inner: String*) =
      s"""{"schema":"$sp/contexts/jsonschema/1-0-0","data":[${inner.mkString(",")}]}"""
    def ctx(schema: String, data: String) = s"""{"schema":"$schema","data":$data}"""
    val cases: Seq[(String, String, String, String, Set[String])] = Seq(
      ("single context schema",
        wrap(ctx(s"$sp/web_page/jsonschema/1-0-0", """{"id":"test-page-id"}""")), "", "",
        Set(s"$sp/contexts/jsonschema/1-0-0", s"$sp/web_page/jsonschema/1-0-0")),
      ("multiple contexts",
        wrap(ctx(s"$sp/web_page/jsonschema/1-0-0", """{"id":"page-1"}"""),
          ctx(s"$sp/ua_parser_context/jsonschema/1-0-0", """{"useragentFamily":"Chrome"}""")),
        "", "",
        Set(s"$sp/contexts/jsonschema/1-0-0", s"$sp/web_page/jsonschema/1-0-0",
          s"$sp/ua_parser_context/jsonschema/1-0-0")),
      ("unstruct event", "", "",
        ctx(s"$sp/unstruct_event/jsonschema/1-0-0",
          ctx(s"$sp/page_view/jsonschema/1-0-0", """{"pageUrl":"https://example.com"}""")),
        Set(s"$sp/unstruct_event/jsonschema/1-0-0", s"$sp/page_view/jsonschema/1-0-0")),
      ("derived contexts", "",
        wrap(ctx(s"$sp/client_session/jsonschema/1-0-1", """{"sessionId":"session-123"}""")), "",
        Set(s"$sp/contexts/jsonschema/1-0-0", s"$sp/client_session/jsonschema/1-0-1")),
      ("all three fields combined",
        wrap(ctx(s"$sp/web_page/jsonschema/1-0-0", """{"id":"page-1"}""")),
        wrap(ctx(s"$sp/ua_parser_context/jsonschema/1-0-0", """{"useragentFamily":"Chrome"}""")),
        ctx(s"$sp/unstruct_event/jsonschema/1-0-0",
          ctx(s"$sp/page_view/jsonschema/1-0-0", """{"pageUrl":"https://example.com"}""")),
        Set(s"$sp/contexts/jsonschema/1-0-0", s"$sp/web_page/jsonschema/1-0-0",
          s"$sp/ua_parser_context/jsonschema/1-0-0", s"$sp/unstruct_event/jsonschema/1-0-0",
          s"$sp/page_view/jsonschema/1-0-0")),
      ("duplicate schemas deduplicated",
        wrap(ctx(s"$sp/web_page/jsonschema/1-0-0", """{"id":"page-1"}"""),
          ctx(s"$sp/web_page/jsonschema/1-0-0", """{"id":"page-2"}""")), "", "",
        Set(s"$sp/contexts/jsonschema/1-0-0", s"$sp/web_page/jsonschema/1-0-0")),
      ("empty fields", "", "", "", Set.empty),
      ("invalid JSON does not crash", "not valid json", "", "", Set.empty))
    for ((name, c, d, u, expected) <- cases) {
      val fields = OpenSnowcat.columns.map {
        case "contexts" => c; case "derived_contexts" => d
        case "unstruct_event" => u; case _ => ""
      }
      val line = fields.mkString("\t")
      import spark.implicits._
      val got = Seq(line).toDF("content")
        .select(explode(OpenSnowcat.discoveredSchemas(col("content"))).as("uri"))
        .collect().map(_.getString(0)).toSet
      assert(got == expected, s"case: $name")
    }
  }

  test("schema delivery POSTs the template-substituted payload (reference schema_delivery)") {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/internal/schema-discovery",
      (x: com.sun.net.httpserver.HttpExchange) => {
        got.add(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
        x.sendResponseHeaders(200, 2); x.getResponseBody.write("{}".getBytes); x.close()
      })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/internal/schema-discovery"
      assert(!OpenSnowcat.deliverSchemas(Nil, endpoint), "empty set is a no-op")
      assert(got.isEmpty)
      val delivered = OpenSnowcat.deliverSchemas(
        Seq("iglu:com.acme/a/jsonschema/1-0-0", "iglu:com.acme/b/jsonschema/2-0-0"),
        endpoint, template = """{"schemas": {{SCHEMAS}}, "src": "graft"}""")
      assert(delivered)
      assert(got.poll() ==
        """{"schemas": ["iglu:com.acme/a/jsonschema/1-0-0","iglu:com.acme/b/jsonschema/2-0-0"], "src": "graft"}""")
    } finally server.stop(0)
  }

  test("the reference's documented Transform YAML example runs via PipelineConfig") {
    val tsvFile = java.nio.file.Files.createTempFile("osc", ".tsv")
    java.nio.file.Files.writeString(tsvFile, pageView + "\n")
    // processor_opensnowcat.go's "Transform" example, verbatim fields
    val yaml =
      s"""input:
         |  file:
         |    paths: [$tsvFile]
         |pipeline:
         |  processors:
         |    - opensnowcat:
         |        output_format: json
         |        filters:
         |          transform:
         |            salt: "your-secret-salt-here"
         |            hash_algo: SHA-256
         |            fields:
         |              user_id:
         |                strategy: hash
         |              user_ipaddress:
         |                strategy: anonymize_ip
         |                anon_octets: 2
         |                anon_segments: 3
         |              network_userid:
         |                strategy: redact
         |                redact_value: "[REDACTED]"
         |""".stripMargin
    val frame = graft.conn.PipelineConfig.load(yaml).frame(spark)
    val Seq(json) = frame.select(col(Msg.ContentCol)).collect().toSeq.map(_.getString(0))
    val m = parse(json)
    assert(m("user_ipaddress") == "75.80.x.x")
    assert(m("user_id") == graft.conn.Aws.SigV4.sha256Hex(
      "joaocorreiayour-secret-salt-here".getBytes("UTF-8")))
    assert(m("network_userid") == "[REDACTED]")
    assert(m("app_id") == "snwcat" && m("event") == "page_view")
    java.nio.file.Files.delete(tsvFile)
  }

  test("schema discovery collects every iglu URI (reference schema_extractor)") {
    val df = envelope(pageView)
      .select(explode(OpenSnowcat.discoveredSchemas(col(Msg.ContentCol))).as("uri"))
    val uris = df.agg(collect_set(col("uri"))).collect()(0).getSeq[String](0).toSet
    assert(uris.contains("iglu:com.snowplowanalytics.snowplow/web_page/jsonschema/1-0-0"))
    assert(uris.contains("iglu:com.fingerprintjs/fingerprint/jsonschema/1-0-0"))
    assert(uris.contains("iglu:org.w3/PerformanceTiming/jsonschema/1-0-0"))
    assert(uris.forall(_.startsWith("iglu:")))
  }
}
