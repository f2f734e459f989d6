package graft

import graft.operators.HttpServerInput
import org.apache.spark.sql.functions._

import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.Executors

/** `http_server` input + `sync_response` semantics
  * (input_http_server.go:178, processor_sync_response.go:37).
  */
class HttpServingSpec extends SparkSpec {

  private def daemonClient(): HttpClient =
    HttpClient.newBuilder().executor(Executors.newFixedThreadPool(4,
      (r: Runnable) => { val th = new Thread(r); th.setDaemon(true); th })).build()

  test("sync_response returns the pipeline-processed payload; path+verb are metadata") {
    val in = new HttpServerInput(timeoutSec = 30)
    val port = in.start()
    val client = daemonClient()
    val n = 40
    val futs = (0 until n).map { i =>
      val req = HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/post/shard${i % 2}"))
        .POST(HttpRequest.BodyPublishers.ofString(s"""{"k":$i}""")).build()
      client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
    }
    val out = in.serve(spark, b => b.select(
        col("msg_id"),
        get_json_object(col("content"), "$.k").cast("long").as("k"),
        col("http_server_request_path").as("p"),
        col("http_server_verb").as("v"))
      .withColumn("response", concat(lit("got:"), col("k") * 10)),
      expected = n)
    val bodies = futs.map(_.join()) // join BEFORE stop: responses in flight
    in.stop()
    val rows = out.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("p"), r.getAs[String]("v"))).toSet
    assert(rows == (0 until n).map(i => (i.toLong, s"/post/shard${i % 2}", "POST")).toSet)
    assert(bodies.forall(_.statusCode == 200))
    assert(bodies.map(_.body()).toSet == (0 until n).map(i => s"got:${i * 10}").toSet)
  }

  test("dedupeBodies: redelivered bodies answer from cache, count once") {
    val in = new HttpServerInput(timeoutSec = 30)
    val port = in.start()
    val client = daemonClient()
    // 10 unique bodies, each delivered 3x (producer retry storm)
    val futs = for (i <- 0 until 10; _ <- 0 until 3) yield {
      val req = HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/post"))
        .POST(HttpRequest.BodyPublishers.ofString(s"""{"k":$i}""")).build()
      client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
    }
    val out = in.serve(spark, b => b.select(
        col("msg_id"),
        get_json_object(col("content"), "$.k").cast("long").as("k"))
      .withColumn("response", concat(lit("r:"), col("k"))),
      expected = 10, dedupeBodies = true) // UNIQUE bodies, not arrivals
    val bodies = futs.map(_.join())
    in.stop()
    assert(out.count() == 10, "each unique body processed exactly once")
    assert(bodies.forall(_.statusCode == 200))
    // every copy of body k gets the SAME response (idempotent retries)
    assert(bodies.map(_.body()).sorted ==
      (0 until 10).flatMap(i => Seq.fill(3)(s"r:$i")).sorted)
  }

  test("pipeline-dropped messages get an empty 200, never a hung client") {
    val in = new HttpServerInput(timeoutSec = 30)
    val port = in.start()
    val client = daemonClient()
    val futs = (0 until 10).map { i =>
      val req = HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/post"))
        .POST(HttpRequest.BodyPublishers.ofString(i.toString)).build()
      client.sendAsync(req, HttpResponse.BodyHandlers.ofString())
    }
    // the pipeline keeps only even payloads — odd ones are dropped rows
    val out = in.serve(spark, b => b
      .withColumn("k", col("content").cast("long"))
      .filter(col("k") % 2 === 0)
      .withColumn("response", concat(lit("even:"), col("k"))),
      expected = 10)
    val bodies = futs.map(_.join())
    in.stop()
    assert(out.count() == 5)
    assert(bodies.forall(_.statusCode == 200))
    assert(bodies.map(_.body()).count(_.isEmpty) == 5)
    assert(bodies.map(_.body()).filter(_.nonEmpty).toSet ==
      Set("even:0", "even:2", "even:4", "even:6", "even:8"))
  }
}
