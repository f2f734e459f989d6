package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.{CountDownLatch, TimeUnit}

import graft.conn.Nsq
import org.scalatest.funsuite.AnyFunSuite

/** NSQ V2 protocol: handshake, pub/sub with RDY flow control, channel
  * fan-out vs consumer splitting, FIN/REQ, requeue-on-death. */
class NsqSpec extends AnyFunSuite {

  private def withServer[T](f: Nsq.MiniNsq => T): T = {
    val srv = new Nsq.MiniNsq().start()
    try f(srv) finally srv.stop()
  }

  test("publish/subscribe round-trip with FIN ack and binary body") {
    withServer { srv =>
      val sub = new Nsq.Client(srv.address)
      val pub = new Nsq.Client(srv.address)
      try {
        sub.subscribe("events", "ch1")
        val blob = Array[Byte](0, -1, 10, 13, 65)
        pub.publish("events", blob)
        val d = sub.nextDelivery()
        assert(d.body.toSeq == blob.toSeq && d.attempts == 1)
        assert(d.id.length == 16)
        sub.fin(d.id)
      } finally { sub.close(); pub.close() }
    }
  }

  test("every channel receives every message; same-channel consumers split") {
    withServer { srv =>
      val chA = new Nsq.Client(srv.address)
      val chB1 = new Nsq.Client(srv.address)
      val chB2 = new Nsq.Client(srv.address)
      val pub = new Nsq.Client(srv.address)
      try {
        chA.subscribe("t", "analytics")
        chB1.subscribe("t", "billing")
        chB2.subscribe("t", "billing")
        (1 to 10).foreach(i => pub.publish("t", s"m$i".getBytes(UTF_8)))
        // channel "analytics" (one consumer) sees all 10
        val a = (1 to 10).map { _ =>
          val d = chA.nextDelivery(); chA.fin(d.id); new String(d.body, UTF_8)
        }
        assert(a.toSet == (1 to 10).map(i => s"m$i").toSet)
        // channel "billing" (two consumers) sees each message exactly once
        val got = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
        val count = new java.util.concurrent.atomic.AtomicInteger(0)
        Seq(chB1, chB2).foreach { c =>
          val th = new Thread(() => {
            try while (true) {
              val d = c.nextDelivery(); c.fin(d.id)
              got.add(new String(d.body, UTF_8)); count.incrementAndGet()
            } catch { case _: Throwable => () }
          })
          th.setDaemon(true); th.start()
        }
        val deadline = System.currentTimeMillis + 5000
        while (count.get() < 10 && System.currentTimeMillis < deadline) Thread.sleep(20)
        assert(count.get() == 10, "split stream delivers each message once")
        assert(got.size == 10)
      } finally { chA.close(); chB1.close(); chB2.close(); pub.close() }
    }
  }

  test("RDY window gates delivery; FIN re-arms it (continual-RDY client)") {
    withServer { srv =>
      val sub = new Nsq.Client(srv.address)
      val pub = new Nsq.Client(srv.address)
      try {
        sub.subscribe("g", "ch", maxInFlight = 2) // window of 2
        (1 to 5).foreach(i => pub.publish("g", s"m$i".getBytes(UTF_8)))
        // the full stream drains through the bounded window: each FIN
        // consumes window budget and the client re-arms RDY at half
        val got = (1 to 5).map { _ =>
          val d = sub.nextDelivery(); sub.fin(d.id); new String(d.body, UTF_8)
        }
        assert(got.toSet == (1 to 5).map(i => s"m$i").toSet)
      } finally { sub.close(); pub.close() }
    }
  }

  test("REQ requeues with incremented attempts; death requeues unFINished") {
    withServer { srv =>
      val pub = new Nsq.Client(srv.address)
      try {
        val sub1 = new Nsq.Client(srv.address)
        sub1.subscribe("w", "ch")
        pub.publish("w", "job".getBytes(UTF_8))
        val d1 = sub1.nextDelivery()
        assert(d1.attempts == 1)
        sub1.requeue(d1.id)
        val d2 = sub1.nextDelivery()
        assert(d2.attempts == 2, "REQ increments attempts")
        sub1.close() // dies with d2 unFINished
        Thread.sleep(100)
        val sub2 = new Nsq.Client(srv.address)
        try {
          sub2.subscribe("w", "ch")
          val d3 = sub2.nextDelivery()
          assert(new String(d3.body, UTF_8) == "job" && d3.attempts == 3)
          sub2.fin(d3.id)
        } finally sub2.close()
      } finally pub.close()
    }
  }
}
