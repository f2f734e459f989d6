package graft

import graft.conn.Cloudwatch
import org.scalatest.funsuite.AnyFunSuite

/** aws_cloudwatch metrics contract (metrics_cloudwatch.go): Query-
  * protocol PutMetricData, the accumulate-then-flush model, 20-datum
  * chunking, value-histogram gauges/timings with the 150-value cap. */
class CloudwatchSpec extends AnyFunSuite {

  test("counters sum scalars; gauges/timings ship value histograms; flush drains") {
    val srv = new Cloudwatch.MiniCloudWatch().start()
    val c = new Cloudwatch.Client(srv.endpoint)
    try {
      val stats = new Cloudwatch.Stats("ns1")
      stats.incr("sent", 3, Seq("output" -> "s3"))
      stats.incr("sent", 2, Seq("output" -> "s3"))
      stats.incr("sent", 7, Seq("output" -> "kafka"))
      stats.gauge("backlog", 5)
      stats.gauge("backlog", 5)
      stats.gauge("backlog", 9)
      stats.timing("latency", 1500000) // 1.5 ms in ns -> 1500 µs
      stats.flush(c)
      val ds = srv.datums("ns1")
      assert(ds.size == 4)
      val s3 = ds.find(d => d.metricName == "sent" && d.dimensions == Seq("output" -> "s3")).get
      assert(s3.value.contains(5.0) && s3.unit == "Count")
      assert(ds.find(d => d.dimensions == Seq("output" -> "kafka")).get.value.contains(7.0))
      val backlog = ds.find(_.metricName == "backlog").get
      assert(backlog.value.isEmpty)
      assert(backlog.values.toMap == Map(5.0 -> 2.0, 9.0 -> 1.0), "value histogram with counts")
      val lat = ds.find(_.metricName == "latency").get
      assert(lat.unit == "Microseconds" && lat.values == Seq((1500.0, 1.0)))
      // flush drained: a second flush ships nothing new
      stats.flush(c)
      assert(srv.datums("ns1").size == 4)
    } finally { c.close(); srv.stop() }
  }

  test("flush chunks at 20 datums per PutMetricData; fixture enforces the caps") {
    val srv = new Cloudwatch.MiniCloudWatch().start()
    val c = new Cloudwatch.Client(srv.endpoint)
    try {
      val stats = new Cloudwatch.Stats("ns2")
      (1 to 47).foreach(i => stats.incr(s"m$i"))
      stats.flush(c) // 47 datums -> 3 calls, all accepted
      assert(srv.datums("ns2").size == 47)
      // a raw over-limit call is rejected by the client guard
      val tooMany = (1 to 21).map(i => Cloudwatch.Datum(s"x$i", "Count", Nil, Some(1.0), Nil))
      intercept[IllegalArgumentException](c.putMetricData("ns2", tooMany))
      // the fixture rejects >10 dimensions like the API
      val wide = Cloudwatch.Datum("wide", "Count",
        (1 to 11).map(i => s"d$i" -> "v"), Some(1.0), Nil)
      val e = intercept[IllegalArgumentException](c.putMetricData("ns2", Seq(wide)))
      assert(e.getMessage.contains("dimensions"))
    } finally { c.close(); srv.stop() }
  }

  test("value histogram trims toward the 150-value cap, singletons first") {
    val srv = new Cloudwatch.MiniCloudWatch().start()
    val c = new Cloudwatch.Client(srv.endpoint)
    try {
      val stats = new Cloudwatch.Stats("ns3")
      // 100 repeated values (count 2 each) + 1000 singletons
      (1 to 100).foreach(v => { stats.gauge("g", v); stats.gauge("g", v) })
      (1000 to 1999).foreach(v => stats.gauge("g", v))
      stats.flush(c)
      val d = srv.datums("ns3").head
      assert(d.values.size <= Cloudwatch.MaxValues)
      val repeated = d.values.filter(_._2 > 1).map(_._1.toLong).toSet
      assert((1L to 100L).toSet.subsetOf(repeated),
        "every repeated value survives the trim; singletons go first")
    } finally { c.close(); srv.stop() }
  }
}
