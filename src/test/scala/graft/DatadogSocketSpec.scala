package graft

import graft.conn.Observability.Datadog
import graft.operators.SocketServerInput
import org.scalatest.funsuite.AnyFunSuite

/** datadog_logs output (logs-intake v2 contract) and socket_server
  * input (listen-mode accept loop) fixtures. */
class DatadogSocketSpec extends AnyFunSuite {

  test("datadog_logs: gzip/deflate/identity encodings round-trip; auth + limits enforced") {
    val srv = new Datadog.MiniDatadogLogs("k3y").start()
    try {
      for ((enc, i) <- Seq("gzip", "deflate", "identity").zipWithIndex) {
        val c = new Datadog.Client(srv.endpoint, "k3y", contentEncoding = enc)
        try c.submit(Seq(Datadog.LogItem(s"m$i", "src", "env:t", s"h$i", "svc",
          "info", 1700000000000L + i)))
        finally c.close()
      }
      val logs = srv.logs
      assert(logs.map(_.message).toSet == Set("m0", "m1", "m2"))
      assert(logs.forall(_.service == "svc"))
      assert(logs.map(_.timestampMs).sorted == Seq(1700000000000L, 1700000000001L, 1700000000002L))

      val bad = new Datadog.Client(srv.endpoint, "wrong")
      try {
        val e = intercept[IllegalArgumentException](
          bad.submit(Seq(Datadog.LogItem("x", "", "", "", "", "", 0))))
        assert(e.getMessage.contains("403"))
      } finally bad.close()

      val big = new Datadog.Client(srv.endpoint, "k3y")
      try {
        val e = intercept[IllegalArgumentException](big.submit(
          (1 to 1001).map(i => Datadog.LogItem(s"b$i", "", "", "", "", "", 0))))
        assert(e.getMessage.contains("400"), "over 1000 logs per batch rejected")
      } finally big.close()
    } finally srv.stop()
  }

  test("datadog_logs: optional fields are omitted from the payload, not sent empty") {
    val srv = new Datadog.MiniDatadogLogs("k").start()
    try {
      val c = new Datadog.Client(srv.endpoint, "k", contentEncoding = "identity")
      try c.submit(Seq(Datadog.LogItem("bare", "", "", "", "", "", 0)))
      finally c.close()
      val l = srv.logs.head
      assert(l.message == "bare" && l.ddsource == "" && l.status == "" && l.timestampMs == 0)
    } finally srv.stop()
  }

  test("socket_server tcp: concurrent connections interleave, each line-scanned") {
    val in = new SocketServerInput("tcp").start()
    try {
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          val s = new java.net.Socket(java.net.InetAddress.getLoopbackAddress, in.port)
          val w = new java.io.PrintWriter(s.getOutputStream)
          (0 until 25).foreach(i => w.println(s"c$t-m$i"))
          w.flush(); s.close()
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      in.awaitCount(100)
      val got = in.received
      assert(got.size == 100)
      assert(got.toSet == (for (t <- 0 until 4; i <- 0 until 25) yield s"c$t-m$i").toSet)
    } finally in.stop()
  }

  test("socket_server udp: packets may carry several newline-separated messages") {
    val in = new SocketServerInput("udp").start()
    try {
      val s = new java.net.DatagramSocket()
      val payload = "a\nb\nc\n".getBytes("UTF-8")
      s.send(new java.net.DatagramPacket(payload, payload.length,
        java.net.InetAddress.getLoopbackAddress, in.port))
      s.close()
      in.awaitCount(3)
      assert(in.received == Vector("a", "b", "c"))
    } finally in.stop()
  }

  test("socket_server rejects unsupported networks like the reference") {
    val e = intercept[IllegalArgumentException](new SocketServerInput("carrier-pigeon"))
    assert(e.getMessage.contains("unsupported"))
  }
}
