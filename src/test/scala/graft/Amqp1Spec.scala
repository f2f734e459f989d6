package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Amqp1
import graft.conn.Amqp1._
import org.scalatest.funsuite.AnyFunSuite

/** AMQP 1.0: the typed encoding round-trips (described types, the
  * compact/full format-code pairs), the open/begin/attach handshake,
  * credit-driven deliveries, accepted-disposition settlement, and
  * redelivery of unsettled transfers after detach. */
class Amqp1Spec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  test("type codec round-trips primitives, compact forms, nesting and described types") {
    val v = VDescribed(VULong(0x75), VList(Vector(
      VNull, VBool(true), VBool(false),
      VULong(0), VULong(7), VULong(1L << 40),
      VUInt(0), VUInt(200), VUInt(70000),
      VLong(-5), VLong(1L << 50),
      VStr("héllo"), VStr("x" * 300),
      VSym("amqp:accepted:list"), VBin(Array[Byte](0, 1, -1)),
      VList(Vector.empty), VList(Vector(VStr("a"), VUInt(1))),
      VMap(Vector((VSym("k"), VStr("v")))))))
    val back = new Decoder(encode(v)).read()
    // binary arrays break case-class equality; compare rendered shape
    def norm(x: Value): Any = x match {
      case VBin(bs) => bs.toSeq
      case VList(items) => items.map(norm)
      case VMap(items) => items.map { case (k2, v2) => (norm(k2), norm(v2)) }
      case VDescribed(d, inner) => (norm(d), norm(inner))
      case other => other
    }
    assert(norm(back) == norm(v))
    // compact encodings actually used: smallulong, uint0, smalluint
    assert(encode(VULong(7)).toSeq == Seq(0x53.toByte, 7.toByte))
    assert(encode(VUInt(0)).toSeq == Seq(0x43.toByte))
    assert(encode(VList(Vector.empty)).toSeq == Seq(0x45.toByte))
  }

  private def withBroker[T](f: (MiniAmqp1, String) => T): T = {
    val srv = new MiniAmqp1().start()
    try f(srv, srv.address) finally srv.stop()
  }

  test("send → credit-driven receive → accept settles; depth drains") {
    withBroker { (srv, addr) =>
      val snd = new Sender(addr, "jobs")
      val rcv = new Receiver(addr, "jobs")
      try {
        (1 to 5).foreach(i => snd.send(b(s"m$i")))
        val deadline = System.currentTimeMillis() + 10000 // generous: the suite runs 32-way parallel
        while (srv.depth("jobs") < 5 && System.currentTimeMillis() < deadline) Thread.sleep(20)
        assert(srv.depth("jobs") == 5)
        rcv.flow(3)
        val three = (1 to 3).map(_ => rcv.receive().get)
        assert(three.map(d => new String(d.body, UTF_8)) == Seq("m1", "m2", "m3"))
        assert(rcv.receive(300).isEmpty, "credit exhausted, no more deliveries")
        three.foreach(rcv.accept)
        rcv.flow(10)
        val rest = (1 to 2).map(_ => rcv.receive().get)
        rest.foreach(rcv.accept)
        val drainDeadline = System.currentTimeMillis() + 10000
        while (srv.depth("jobs") > 0 && System.currentTimeMillis() < drainDeadline) Thread.sleep(20)
        assert(srv.depth("jobs") == 0, "accepted dispositions settle everything")
      } finally { snd.close(); rcv.close() }
    }
  }

  test("unsettled deliveries redeliver after detach (at-least-once re-attach contract)") {
    withBroker { (_, addr) =>
      val snd = new Sender(addr, "q2")
      try {
        snd.send(b("keep"))
        val r1 = new Receiver(addr, "q2")
        r1.flow(1)
        val d1 = r1.receive().get
        assert(new String(d1.body, UTF_8) == "keep")
        r1.detach() // never accepted
        r1.close()
        val r2 = new Receiver(addr, "q2")
        try {
          r2.flow(1)
          val d2 = r2.receive().get
          assert(new String(d2.body, UTF_8) == "keep", "unsettled delivery came back")
          r2.accept(d2)
        } finally r2.close()
      } finally snd.close()
    }
  }

  test("detaching one link keeps the sibling link's standing credit (per-handle detach)") {
    withBroker { (_, addr) =>
      val snd1 = new Sender(addr, "qa")
      val snd2 = new Sender(addr, "qb")
      // ONE connection, TWO receiver links (handles 1 and 2) — the
      // multi-link shape real amqp1 clients use; Receiver can't express it
      val Array(host, portS) = addr.split(":")
      val sock = new java.net.Socket(host, portS.toInt)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 1, 0, 0)); out.flush()
        val hdr = new Array[Byte](8); in.readFully(hdr)
        def attach(handle: Long, source: String): Unit = {
          Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Attach), VList(Vector(
            VStr(s"l$handle"), VUInt(handle), VBool(true), VNull, VNull,
            VDescribed(VULong(0x28), VList(Vector(VStr(source)))),
            VDescribed(VULong(0x29), VList(Vector(VStr(""))))))))
          Amqp1.readAmqpFrame(in); ()
        }
        def flow(handle: Long, credit: Long): Unit =
          Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Flow), VList(Vector(
            VNull, VUInt(65535), VUInt(0), VUInt(65535), VUInt(handle),
            VUInt(0), VUInt(credit)))))
        def transfer(): (Long, String) = {
          sock.setSoTimeout(5000)
          val f = Amqp1.readAmqpFrame(in)
          val fs = f.performative.value.asInstanceOf[VList].items
          val handle = fs(0) match { case VUInt(x) => x; case VULong(x) => x; case _ => -1L }
          (handle, new String(Amqp1.messageSections(f.payload)._2, UTF_8))
        }
        attach(1, "qa"); attach(2, "qb")
        flow(1, 5); flow(2, 5)
        snd1.send(b("a1")); snd2.send(b("b1"))
        val first = Seq(transfer(), transfer()).sortBy(_._1)
        assert(first == Seq((1L, "a1"), (2L, "b1")))
        // detach handle 1 ONLY — handle 2's remaining credit must survive
        Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Detach),
          VList(Vector(VUInt(1), VBool(true)))))
        Amqp1.readAmqpFrame(in) // detach echo
        snd2.send(b("b2"))
        assert(transfer() == ((2L, "b2")),
          "sibling link delivers on its STANDING credit after the detach")
      } finally { sock.close(); snd1.close(); snd2.close() }
    }
  }

  test("End tears down SENDER links on the session: transfers after End are not accepted") {
    withBroker { (srv, addr) =>
      val Array(host, portS) = addr.split(":")
      val sock = new java.net.Socket(host, portS.toInt)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 1, 0, 0)); out.flush()
        val hdr = new Array[Byte](8); in.readFully(hdr)
        // sender-role attach (role=false), handle 7, target queue qx
        Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Attach), VList(Vector(
          VStr("l7"), VUInt(7), VBool(false), VNull, VNull,
          VDescribed(VULong(0x28), VList(Vector(VStr("")))),
          VDescribed(VULong(0x29), VList(Vector(VStr("qx"))))))))
        Amqp1.readAmqpFrame(in) // attach echo
        Amqp1.readAmqpFrame(in) // credit flow
        def transfer(n: Int, body: String): Unit =
          Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Transfer), VList(Vector(
            VUInt(7), VUInt(n.toLong),
            VBin(java.nio.ByteBuffer.allocate(4).putInt(n).array()),
            VUInt(0), VBool(true)))), Amqp1.messagePayload(b(body)))
        transfer(1, "m1")
        val deadline = System.currentTimeMillis() + 3000
        while (srv.depth("qx") < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(srv.depth("qx") == 1, "pre-End transfer accepted")
        // End the session: the sender link's handle must die with it
        Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.End), VList(Vector.empty)))
        Amqp1.readAmqpFrame(in) // end echo
        transfer(2, "m2")
        Thread.sleep(300)
        assert(srv.depth("qx") == 1, "transfer on an ended session is NOT accepted")
      } finally sock.close()
    }
  }

  test("same handle on two channels names two links: sender attach must not clobber the receiver") {
    withBroker { (srv, addr) =>
      val Array(host, portS) = addr.split(":")
      val sock = new java.net.Socket(host, portS.toInt)
      try {
        val out = new java.io.BufferedOutputStream(sock.getOutputStream)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(sock.getInputStream))
        out.write(Array[Byte]('A', 'M', 'Q', 'P', 0, 1, 0, 0)); out.flush()
        val hdr = new Array[Byte](8); in.readFully(hdr)
        // receiver-role attach (role=true: peer receives), handle 0 on
        // channel 0, source queue qcc
        Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Attach), VList(Vector(
          VStr("rcv"), VUInt(0), VBool(true), VNull, VNull,
          VDescribed(VULong(0x28), VList(Vector(VStr("qcc")))),
          VDescribed(VULong(0x29), VList(Vector(VStr(""))))))))
        Amqp1.readAmqpFrame(in) // attach echo
        // sender-role attach with the SAME handle 0 on channel 1 —
        // AMQP handles are per-session, so this is a DIFFERENT link
        Amqp1.writeFrame(out, 1, VDescribed(VULong(Code.Attach), VList(Vector(
          VStr("snd"), VUInt(0), VBool(false), VNull, VNull,
          VDescribed(VULong(0x28), VList(Vector(VStr("")))),
          VDescribed(VULong(0x29), VList(Vector(VStr("qcc"))))))))
        Amqp1.readAmqpFrame(in) // attach echo
        Amqp1.readAmqpFrame(in) // credit flow for the sender link
        // publish via the channel-1 sender link
        Amqp1.writeFrame(out, 1, VDescribed(VULong(Code.Transfer), VList(Vector(
          VUInt(0), VUInt(1), VBin(Array[Byte](0, 0, 0, 1)), VUInt(0), VBool(true)))),
          Amqp1.messagePayload(b("cc-msg")))
        val deadline = System.currentTimeMillis() + 3000
        while (srv.depth("qcc") < 1 && System.currentTimeMillis() < deadline)
          Thread.sleep(20)
        assert(srv.depth("qcc") == 1, "transfer on the channel-1 sender link accepted")
        // grant credit on the channel-0 receiver link: the delivery must
        // arrive as a transfer framed on CHANNEL 0 (the receiver's
        // session), proving the sender attach didn't steal the handle
        Amqp1.writeFrame(out, 0, VDescribed(VULong(Code.Flow), VList(Vector(
          VNull, VUInt(65535), VUInt(0), VUInt(65535), VUInt(0), VUInt(0), VUInt(10)))))
        val f = Amqp1.readAmqpFrame(in)
        assert(f.performative.descriptor == VULong(Code.Transfer), "delivery arrives")
        assert(f.channel == 0, s"delivery framed on the receiver's channel, got ${f.channel}")
      } finally sock.close()
    }
  }

  test("released disposition redelivers with delivery-count bumped (service-bus abandon)") {
    withBroker { (srv, addr) =>
      val snd = new Sender(addr, "sbq")
      try (1 to 3).foreach(i => snd.send(b(s"m$i"))) finally snd.close()
      val rcv = new Receiver(addr, "sbq")
      try {
        rcv.flow(10)
        val first = (1 to 3).map(_ => rcv.receive().get)
        assert(first.forall(_.deliveryCount == 0L), "first delivery: count 0")
        // abandon m2; complete the others
        val m2 = first.find(d => new String(d.body, UTF_8) == "m2").get
        rcv.release(m2)
        first.filterNot(_ eq m2).foreach(rcv.accept)
        rcv.flow(10)
        val redelivered = rcv.receive().get
        assert(new String(redelivered.body, UTF_8) == "m2")
        assert(redelivered.deliveryCount == 1L, "abandon bumps the delivery count")
        rcv.accept(redelivered)
        assert(rcv.receive(300).isEmpty)
        // the accepted DISPOSITION settles asynchronously broker-side —
        // poll instead of asserting instantly (the in-suite flake)
        val settleDeadline = System.currentTimeMillis() + 10000
        while (srv.depth("sbq") > 0 && System.currentTimeMillis() < settleDeadline)
          Thread.sleep(20)
        assert(srv.depth("sbq") == 0)
      } finally rcv.close()
    }
  }

  test("two queues on one broker stay isolated; binary bodies survive the data section") {
    withBroker { (_, addr) =>
      val sa = new Sender(addr, "qa")
      val sb = new Sender(addr, "qb")
      val ra = new Receiver(addr, "qa")
      try {
        val bin = Array.tabulate[Byte](300)(_.toByte) // >255 forces bin32/str32 paths
        sa.send(bin)
        sb.send(b("other"))
        ra.flow(5)
        assert(ra.receive().get.body.toSeq == bin.toSeq)
        assert(ra.receive(300).isEmpty, "qb traffic never reaches the qa link")
      } finally { sa.close(); sb.close(); ra.close() }
    }
  }
}
