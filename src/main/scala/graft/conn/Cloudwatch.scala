package graft.conn

import java.net.URLDecoder
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.mutable

import graft.conn.Aws.{AwsHttp, MiniAwsService, SigV4}

/** AWS CloudWatch metrics sink (impl/aws/metrics_cloudwatch.go:19-527 —
  * the reference wraps aws-sdk-go-v2/service/cloudwatch) over the
  * PUBLIC Query protocol: SigV4-signed form-encoded POST with
  * Action=PutMetricData and indexed members
  * (`MetricData.member.N.MetricName`, `.Value` OR `.Values.member.M` +
  * `.Counts.member.M`, `.Dimensions.member.K.Name/.Value`, `.Unit`),
  * XML responses.
  *
  * The reference's accumulation model carried 1:1 (cloudWatchStat):
  *  - counters ADD between flushes and ship one scalar `Value`;
  *  - gauges and timings APPEND into a value→count histogram shipped
  *    as `Values`/`Counts`, trimmed to 150 distinct values (the API
  *    cap; singletons dropped first), timings stored in microseconds;
  *  - flush drains the datum map and PutMetricData's it in ≤20-datum
  *    chunks (the request cap the reference batches to), ≤10
  *    dimensions each.
  */
object Cloudwatch {

  val MaxMetricsPerCall = 20
  val MaxValues = 150
  val MaxDimensions = 10

  final case class Datum(metricName: String, unit: String,
                         dimensions: Seq[(String, String)],
                         value: Option[Double],
                         values: Seq[(Double, Double)]) // (value, count)

  // ------------------------------------------------------------- fixture
  final class MiniCloudWatch(creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("monitoring", creds) {
    // namespace -> received datums in arrival order
    private val store = new CTrieMap[String, mutable.ArrayBuffer[Datum]]()

    def datums(namespace: String): Vector[Datum] =
      store.get(namespace).map(b => b.synchronized(b.toVector)).getOrElse(Vector.empty)

    private def parseForm(body: Array[Byte]): Map[String, String] =
      new String(body, UTF_8).split('&').filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (URLDecoder.decode(kv, "UTF-8"), "")
        else (URLDecoder.decode(kv.substring(0, i), "UTF-8"),
          URLDecoder.decode(kv.substring(i + 1), "UTF-8"))
      }.toMap

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val form = parseForm(body)
      def err(code: String, msg: String) =
        (400, Seq("Content-Type" -> "text/xml"),
          s"<ErrorResponse><Error><Code>$code</Code><Message>$msg</Message></Error></ErrorResponse>".getBytes(UTF_8))
      form.getOrElse("Action", "") match {
        case "PutMetricData" =>
          val ns = form.getOrElse("Namespace", "")
          if (ns.isEmpty) return err("MissingParameter", "Namespace")
          val parsed = Iterator.from(1).map { i =>
            val p = s"MetricData.member.$i"
            form.get(s"$p.MetricName").map { name =>
              val dims = Iterator.from(1).map { k =>
                form.get(s"$p.Dimensions.member.$k.Name")
                  .map(_ -> form.getOrElse(s"$p.Dimensions.member.$k.Value", ""))
              }.takeWhile(_.isDefined).flatten.toVector
              val values = Iterator.from(1).map { m =>
                form.get(s"$p.Values.member.$m").map(v => (v.toDouble,
                  form.get(s"$p.Counts.member.$m").map(_.toDouble).getOrElse(1.0)))
              }.takeWhile(_.isDefined).flatten.toVector
              Datum(name, form.getOrElse(s"$p.Unit", "None"), dims,
                form.get(s"$p.Value").map(_.toDouble), values)
            }
          }.takeWhile(_.isDefined).flatten.toVector
          if (parsed.isEmpty) return err("MissingParameter", "MetricData")
          if (parsed.size > MaxMetricsPerCall)
            return err("InvalidParameterValue", s"${parsed.size} metric data: limit $MaxMetricsPerCall")
          parsed.find(_.dimensions.size > MaxDimensions) match {
            case Some(d) => return err("InvalidParameterValue",
              s"${d.metricName}: ${d.dimensions.size} dimensions, limit $MaxDimensions")
            case None => ()
          }
          parsed.find(_.values.size > MaxValues) match {
            case Some(d) => return err("InvalidParameterValue",
              s"${d.metricName}: ${d.values.size} values, limit $MaxValues")
            case None => ()
          }
          val buf = store.getOrElseUpdate(ns, mutable.ArrayBuffer.empty)
          buf.synchronized(buf ++= parsed)
          (200, Seq("Content-Type" -> "text/xml"),
            "<PutMetricDataResponse><ResponseMetadata><RequestId>r1</RequestId></ResponseMetadata></PutMetricDataResponse>".getBytes(UTF_8))
        case other => err("InvalidAction", other)
      }
    }
  }

  // -------------------------------------------------------------- client
  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "monitoring", creds)

    /** one PutMetricData call (≤20 datums — callers chunk) */
    def putMetricData(namespace: String, datums: Seq[Datum]): Unit = {
      require(datums.size <= MaxMetricsPerCall, s"chunk to $MaxMetricsPerCall datums")
      val params = Seq("Action" -> "PutMetricData", "Version" -> "2010-08-01",
        "Namespace" -> namespace) ++
        datums.zipWithIndex.flatMap { case (d, i0) =>
          val p = s"MetricData.member.${i0 + 1}"
          Seq(s"$p.MetricName" -> d.metricName, s"$p.Unit" -> d.unit) ++
            d.dimensions.zipWithIndex.flatMap { case ((k, v), j) =>
              Seq(s"$p.Dimensions.member.${j + 1}.Name" -> k,
                s"$p.Dimensions.member.${j + 1}.Value" -> v)
            } ++
            d.value.map(v => s"$p.Value" -> fmt(v)).toSeq ++
            d.values.zipWithIndex.flatMap { case ((v, c), m) =>
              Seq(s"$p.Values.member.${m + 1}" -> fmt(v),
                s"$p.Counts.member.${m + 1}" -> fmt(c))
            }
        }
      val body = params.map { case (k, v) =>
        s"${java.net.URLEncoder.encode(k, "UTF-8")}=${java.net.URLEncoder.encode(v, "UTF-8")}"
      }.mkString("&")
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-www-form-urlencoded"),
        body = body.getBytes(UTF_8))
      require(r.status == 200, s"PutMetricData: ${r.status} ${r.bodyStr}")
    }

    private def fmt(v: Double): String =
      if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString else v.toString

    override def close(): Unit = aws.close()
  }

  // -------------------------------------------- accumulator + flush
  /** The reference's between-flush accumulation (cloudWatchStat):
    * counters sum a scalar; gauges/timings build a value→count
    * histogram trimmed to the 150-value API cap (singletons dropped
    * first — metrics_cloudwatch.go trimValuesMap:142-162); timings
    * record MICROSECONDS (the most granular CloudWatch unit,
    * Timing:216-221 divides nanos by 1000). */
  final class Stats(namespace: String) {
    private final class Acc(val name: String, val unit: String,
                            val dims: Seq[(String, String)]) {
      var scalar = 0.0
      var hasScalar = false
      val hist = mutable.Map[Long, Long]()
    }
    private val accs = mutable.LinkedHashMap[String, Acc]()
    private val lock = new Object

    private def acc(name: String, unit: String, dims: Seq[(String, String)]): Acc = {
      require(dims.size <= MaxDimensions, s"$name: ${dims.size} dimensions")
      val id = name + dims.map { case (k, v) => s"|$k=$v" }.mkString
      accs.getOrElseUpdate(id, new Acc(name, unit, dims))
    }

    def incr(name: String, by: Long = 1, dims: Seq[(String, String)] = Nil): Unit =
      lock.synchronized { val a = acc(name, "Count", dims); a.scalar += by.toDouble; a.hasScalar = true }

    def gauge(name: String, v: Long, dims: Seq[(String, String)] = Nil): Unit =
      lock.synchronized { append(acc(name, "None", dims), v) }

    /** timing in nanoseconds, stored in µs like the reference */
    def timing(name: String, deltaNs: Long, dims: Seq[(String, String)] = Nil): Unit =
      lock.synchronized { append(acc(name, "Microseconds", dims), deltaNs / 1000) }

    private def append(a: Acc, v: Long): Unit = {
      a.hist.updateWith(v) { case Some(c) => Some(c + 1); case None => Some(1L) }
      if (a.hist.size > MaxValues * 5) {
        // drop singletons first, then arbitrary keys, down to the cap
        val singles = a.hist.iterator.collect { case (k, 1L) => k }.toList
        singles.iterator.takeWhile(_ => a.hist.size > MaxValues).foreach(a.hist.remove)
        while (a.hist.size > MaxValues) a.hist.remove(a.hist.head._1)
      }
    }

    /** drain and ship in ≤20-datum chunks (flush:455-511) */
    def flush(client: Client): Unit = {
      val drained = lock.synchronized {
        val out = accs.values.toVector
        accs.clear()
        out
      }
      val datums = drained.map { a =>
        if (a.hasScalar) Datum(a.name, a.unit, a.dims, Some(a.scalar), Nil)
        else {
          val capped = if (a.hist.size <= MaxValues) a.hist.toVector
            else (a.hist.view.filter(_._2 > 1).take(MaxValues).toVector ++
              a.hist.view.filter(_._2 == 1).toVector).take(MaxValues)
          Datum(a.name, a.unit, a.dims, None,
            capped.map { case (v, c) => (v.toDouble, c.toDouble) })
        }
      }
      datums.grouped(MaxMetricsPerCall).foreach(chunk =>
        client.putMetricData(namespace, chunk))
    }
  }
}
