package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Grpc
import org.scalatest.funsuite.AnyFunSuite

/** gRPC over the from-scratch HTTP/2 + HPACK stack: unary and
  * server-streaming calls, trailer-carried status codes, multiplexed
  * concurrent streams on one connection, and frame-spanning messages. */
class GrpcSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withGrpc[T](services: Map[String, Grpc.Handler])(f: Grpc.Client => T): T = {
    val srv = new Grpc.GrpcServer(services).start()
    val c = new Grpc.Client("127.0.0.1", srv.port)
    try f(c) finally { c.close(); srv.stop() }
  }

  test("unary echo round-trip over the full h2 handshake") {
    withGrpc(Map("/graft.Echo/Shout" -> Grpc.Unary(req =>
      b(new String(req, UTF_8).toUpperCase)))) { c =>
      assert(new String(c.unary("/graft.Echo/Shout", b("hello grpc")), UTF_8) == "HELLO GRPC")
      // same connection, sequential calls reuse the HPACK tables
      assert(new String(c.unary("/graft.Echo/Shout", b("again")), UTF_8) == "AGAIN")
    }
  }

  test("server-streaming: N messages then a clean grpc-status 0 end") {
    withGrpc(Map("/graft.Feed/Count" -> Grpc.ServerStreaming((req, emit) => {
      val n = new String(req, UTF_8).toInt
      (1 to n).foreach(i => emit(b(s"msg-$i")))
    }))) { c =>
      val call = c.serverStream("/graft.Feed/Count", b("5"))
      val got = Iterator.continually(call.next()).takeWhile(_.isDefined).flatten
        .map(new String(_, UTF_8)).toVector
      assert(got == (1 to 5).map(i => s"msg-$i"))
    }
  }

  test("unknown method is UNIMPLEMENTED (12); handler exceptions surface as INTERNAL (13)") {
    withGrpc(Map("/graft.Bad/Boom" -> Grpc.Unary(_ =>
      throw new RuntimeException("kaput")))) { c =>
      val e1 = intercept[Grpc.GrpcError](c.unary("/graft.Nope/Missing", b("x")))
      assert(e1.status == 12)
      val e2 = intercept[Grpc.GrpcError](c.unary("/graft.Bad/Boom", b("x")))
      assert(e2.status == 13 && e2.getMessage.contains("kaput"))
    }
  }

  test("messages larger than one DATA frame (16384) span frames and reassemble") {
    withGrpc(Map("/graft.Big/Rev" -> Grpc.Unary(req => req.reverse))) { c =>
      val big = Array.tabulate[Byte](100000)(i => (i % 251).toByte)
      val resp = c.unary("/graft.Big/Rev", big)
      assert(resp.toSeq == big.reverse.toSeq)
    }
  }

  test("concurrent streams multiplex over one connection") {
    withGrpc(Map("/graft.Echo/Slow" -> Grpc.Unary(req => {
      Thread.sleep(50); req
    }))) { c =>
      val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val threads = (1 to 8).map { i =>
        new Thread(() => results.add(new String(c.unary("/graft.Echo/Slow", b(s"r$i")), UTF_8)))
      }
      val t0 = System.currentTimeMillis()
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(results.size == 8)
      import scala.jdk.CollectionConverters._
      assert(results.asScala.toSet == (1 to 8).map(i => s"r$i").toSet)
      assert(System.currentTimeMillis() - t0 < 8 * 50 + 2000,
        "calls overlapped rather than serializing")
    }
  }
}
