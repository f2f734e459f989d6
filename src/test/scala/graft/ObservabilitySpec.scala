package graft

import scala.collection.immutable.VectorMap

import graft.conn.Observability.{Ilp, Loki, Prometheus, Splunk, Statsd}
import graft.conn.Aws.Json
import org.scalatest.funsuite.AnyFunSuite

/** Observability sink protocols: statsd datagram format + accumulation
  * semantics, InfluxDB/QuestDB line-protocol escaping round-trips,
  * Splunk HEC auth + concatenated-JSON bodies, Loki push streams. */
class ObservabilitySpec extends AnyFunSuite {

  // ------------------------------------------------------------- statsd
  test("statsd: counters sum, gauges last-write, timers accumulate; tags ride the key") {
    val srv = new Statsd.MiniStatsd().start()
    val c = new Statsd.Client("127.0.0.1", srv.port)
    try {
      c.counter("req.count"); c.counter("req.count", 4)
      c.gauge("queue.depth", 10); c.gauge("queue.depth", 3)
      c.timing("latency", 1.5); c.timing("latency", 2.5)
      c.counter("tagged", 1, tags = Map("env" -> "t", "az" -> "a"))
      c.flush()
      val deadline = System.currentTimeMillis() + 3000
      while (srv.counters.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(srv.counters("req.count") == 5.0)
      assert(srv.gauges("queue.depth") == 3.0)
      assert(srv.timers("latency") == Vector(1.5, 2.5))
      assert(srv.counters("tagged|#az:a,env:t") == 1.0, "sorted dogstatsd tags")
    } finally { c.close(); srv.stop() }
  }

  test("statsd: client batches newline-separated metrics under the MTU") {
    val srv = new Statsd.MiniStatsd().start()
    val c = new Statsd.Client("127.0.0.1", srv.port)
    try {
      (1 to 500).foreach(i => c.counter(s"k${i % 7}"))
      c.flush()
      val deadline = System.currentTimeMillis() + 3000
      while (srv.counters.values.sum < 500 && System.currentTimeMillis() < deadline) Thread.sleep(20)
      assert(srv.counters.values.sum == 500.0)
      assert(srv.counters.size == 7)
    } finally { c.close(); srv.stop() }
  }

  // ---------------------------------------------------------------- ILP
  test("line protocol: escaping round-trips measurements, tags, typed fields") {
    val p = Ilp.Point("cpu load,1", Map("host" -> "h 1", "dc=x" -> "a,b"),
      Map("usage" -> 0.5, "cores" -> 8L, "label" -> "say \"hi\"", "ok" -> true), 1700000000000000000L)
    val back = Ilp.parse(Ilp.render(p))
    assert(back == p)
  }

  test("ILP TCP collector gathers points from concurrent writers") {
    val srv = new Ilp.MiniIlp().start()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        val c = new Ilp.Client("127.0.0.1", srv.port)
        try (0 until 25).foreach(i => c.write(Ilp.Point("evt", Map("t" -> t.toString),
          Map("n" -> (t * 100 + i).toLong), 1000L + i)))
        finally c.close()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val deadline = System.currentTimeMillis() + 3000
    while (srv.points.size < 100 && System.currentTimeMillis() < deadline) Thread.sleep(20)
    assert(srv.points.size == 100)
    assert(srv.points.map(_.fields("n").asInstanceOf[Long]).sorted ==
      (0 until 4).flatMap(t => (0 until 25).map(i => (t * 100 + i).toLong)).sorted)
    srv.stop()
  }

  // ------------------------------------------------------------- splunk
  test("splunk HEC: token enforced; concatenated event envelopes land with metadata") {
    val srv = new Splunk.MiniHec("tok-123").start()
    val good = new Splunk.Client(srv.endpoint, "tok-123")
    val bad = new Splunk.Client(srv.endpoint, "wrong")
    try {
      good.send(Seq(
        Json.obj("event" -> Json.obj("msg" -> "a"), "sourcetype" -> "graft", "index" -> "main", "time" -> 1.5),
        Json.obj("event" -> "plain-string", "sourcetype" -> "graft", "index" -> "main", "time" -> 2.5)))
      assert(srv.events.size == 2)
      assert(srv.events.map(_.time) == Vector(1.5, 2.5))
      assert(srv.events(1).event == "plain-string")
      val e = intercept[IllegalArgumentException](bad.send(Seq(Json.obj("event" -> "x"))))
      assert(e.getMessage.contains("403"))
    } finally { good.close(); bad.close(); srv.stop() }
  }

  // --------------------------------------------------------- prometheus
  test("prometheus: registry exposes typed families; scrape parses labels and values back") {
    import graft.conn.Observability.Prometheus
    val reg = new Prometheus.Registry
    reg.incCounter("msgs_total", 3, Map("component" -> "input"))
    reg.incCounter("msgs_total", 2, Map("component" -> "input"))
    reg.incCounter("msgs_total", 7, Map("component" -> "output"))
    reg.setGauge("backlog", 12.5)
    val text = reg.exposition
    assert(text.contains("# TYPE msgs_total counter"))
    assert(text.contains("""msgs_total{component="input"} 5"""))
    assert(text.contains("# TYPE backlog gauge"))
    val ep = new Prometheus.Endpoint(reg).start()
    try {
      val samples = Prometheus.scrape(ep.url)
      assert(samples.find(s => s.name == "msgs_total" && s.labels.get("component").contains("input"))
        .exists(_.value == 5.0))
      assert(samples.find(_.name == "backlog").exists(_.value == 12.5))
      reg.incCounter("msgs_total", 1, Map("component" -> "output"))
      assert(Prometheus.scrape(ep.url)
        .find(s => s.labels.get("component").contains("output")).exists(_.value == 8.0),
        "scrape sees live registry state")
    } finally ep.stop()
  }

  // --------------------------------------------------------------- loki
  test("loki push: streams grouped by labels, ns timestamps and lines kept") {
    val srv = new Loki.MiniLoki().start()
    val c = new Loki.Client(srv.endpoint)
    try {
      c.push(Seq(
        Loki.Entry(Map("app" -> "graft", "level" -> "info"), 1000L, "started"),
        Loki.Entry(Map("app" -> "graft", "level" -> "info"), 2000L, "working"),
        Loki.Entry(Map("app" -> "graft", "level" -> "error"), 3000L, "boom")))
      assert(srv.entries.size == 3)
      assert(srv.entries.filter(_.labels("level") == "info").map(_.line) == Vector("started", "working"))
      assert(srv.entries.find(_.line == "boom").exists(_.tsNs == 3000L))
    } finally { c.close(); srv.stop() }
  }

  // ----------------------------------------------------------- json_api
  test("json_api metrics: flat JSON object on /stats and /metrics; timer percentiles") {
    val reg = new Prometheus.Registry
    reg.incCounter("input_received", 5)
    reg.incCounter("output_sent", 3, Map("label" -> "a"))
    reg.setGauge("buffer_backlog", 7)
    (1 to 100).foreach(i => reg.observeTiming("proc_latency", i / 1000.0))
    val ep = new Prometheus.JsonApi.Endpoint(reg).start()
    try {
      val http = new graft.conn.Aws.Http
      val stats = Json.asObj(Json.parse(
        http.request("GET", ep.url, Nil, Array.emptyByteArray).bodyStr))
      val metrics = Json.asObj(Json.parse(http.request("GET",
        ep.url.replace("/stats", "/metrics"), Nil, Array.emptyByteArray).bodyStr))
      http.close()
      assert(stats == metrics, "both endpoints serve the same object")
      assert(stats("input_received") == 5L || stats("input_received") == 5.0)
      assert(stats.contains("""output_sent{label="a"}"""))
      assert(stats("buffer_backlog") == 7L || stats("buffer_backlog") == 7.0)
      // exact nearest-rank pins over samples 0.001..0.100: p-q of n=100
      // is the ceil(q*100)th sorted sample — p50=50th=0.050, p99=99th=
      // 0.099 (an implementation returning the max for p99 fails here)
      val lat = Json.asObj(stats("proc_latency"))
      assert(lat("p50").asInstanceOf[Double] == 0.050)
      assert(lat("p90").asInstanceOf[Double] == 0.090)
      assert(lat("p99").asInstanceOf[Double] == 0.099)
    } finally ep.stop()
  }

  test("logger metrics: one line per metric; flush_metrics resets counters and timers") {
    val reg = new Prometheus.Registry
    reg.incCounter("count_a", 2)
    reg.observeTiming("lat", 0.5)
    reg.setGauge("g", 1.5)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    Prometheus.LoggerMetrics.flush(reg, out += _, flushMetrics = true)
    assert(out.toSeq == Seq("metric=count_a value=2", "metric=g value=1.5", "metric=lat samples=1"))
    out.clear()
    Prometheus.LoggerMetrics.flush(reg, out += _)
    assert(out.toSeq == Seq("metric=g value=1.5"), "counters and timers reset; gauges persist")
  }
}
