package graft

import java.math.BigInteger
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.conn.Ssh
import graft.conn.Ssh.{Creds, MiniSshd, SftpStatusException, WireOut}

/** From-scratch SSH2 + SFTP v3 (conn/Ssh.scala). The crypto raw-byte
  * conventions are pinned against PUBLIC RFC vectors (RFC 7748 §6.1,
  * RFC 8032 §7.1) — both endpoints are ours, so an encoding mistake
  * could otherwise cancel out invisibly. */
class SshSpec extends AnyFunSuite {

  private def hex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  private def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ---------------------------------------------------------- primitives

  test("X25519 shared secret matches the RFC 7748 section 6.1 DH vector") {
    val alicePriv = hex("77076d0a7318a57d3c16c17251b26645df4c2f87ebc0992ab177fba51db92c2a")
    val bobPub = hex("de9edb7d7b7dc1b4d35b61c2ece435373f8343c85b78674dadfc7e146f882b4f")
    val kf = java.security.KeyFactory.getInstance("X25519")
    val priv = kf.generatePrivate(new java.security.spec.XECPrivateKeySpec(
      java.security.spec.NamedParameterSpec.X25519, alicePriv))
    val shared = Ssh.Curve.sharedSecret(priv, bobPub)
    assert(toHex(shared) ===
      "4a5d9d5ba4ce2de1728e3bf480350f25e07e21c947d19e3376f09b3c1e161742")
  }

  test("Ed25519 signature and raw public-key codec match RFC 8032 test 1") {
    val seed = hex("9d61b19deffd5a60ba844af492ec2cc44449c5697b326919703bac031cae7f60")
    val pubRaw = hex("d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a")
    val kf = java.security.KeyFactory.getInstance("Ed25519")
    val priv = kf.generatePrivate(new java.security.spec.EdECPrivateKeySpec(
      java.security.spec.NamedParameterSpec.ED25519, seed))
    val sig = Ssh.Curve.edSign(priv, Array.emptyByteArray)
    assert(toHex(sig) ===
      "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e065224901555fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b")
    val pub = Ssh.Curve.edPubFromRaw(pubRaw)
    assert(Ssh.Curve.edVerify(pub, Array.emptyByteArray, sig))
    assert(toHex(Ssh.Curve.edPubRaw(pub)) === toHex(pubRaw))
    assert(!Ssh.Curve.edVerify(pub, Array[Byte](1), sig))
  }

  test("mpint encoding: zero, high-bit padding, minimal form (RFC 4251 section 5)") {
    def enc(v: BigInteger): Array[Byte] = new WireOut().putMpint(v).result()
    assert(toHex(enc(BigInteger.ZERO)) === "00000000")
    // 0x80 needs a leading zero byte so it reads as positive
    assert(toHex(enc(BigInteger.valueOf(0x80L))) === "000000020080")
    assert(toHex(enc(BigInteger.valueOf(0x7fL))) === "000000017f")
    // the RFC's own example: 9a378f9b2e332a7
    assert(toHex(enc(new BigInteger("9a378f9b2e332a7", 16))) === "00000008" + "09a378f9b2e332a7")
  }

  test("RFC 4253 key derivation is deterministic, letter-distinct, and extends") {
    val k = new BigInteger(1, Array.fill[Byte](32)(7))
    val h = Array.fill[Byte](32)(3)
    val sid = h
    val a16 = Ssh.deriveKey(k, h, 'A', sid, 16)
    val b16 = Ssh.deriveKey(k, h, 'B', sid, 16)
    val a64 = Ssh.deriveKey(k, h, 'A', sid, 64)
    assert(a16.length === 16 && b16.length === 16 && a64.length === 64)
    assert(toHex(a16) !== toHex(b16))
    // extension keeps the prefix (K1 || K2 structure)
    assert(toHex(a64.take(16)) === toHex(a16))
    assert(toHex(Ssh.deriveKey(k, h, 'A', sid, 64)) === toHex(a64))
  }

  // ------------------------------------------------- transport + subsystem

  private def withServer(f: (MiniSshd, String) => Unit): Unit = {
    val root = Files.createTempDirectory("sshspec")
    val srv = new MiniSshd(root, "graft", "hunter2").start()
    try f(srv, srv.address)
    finally {
      srv.stop()
      // best-effort cleanup
      import scala.jdk.CollectionConverters._
      Files.walk(root).sorted(java.util.Comparator.reverseOrder()).iterator().asScala
        .foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => () })
    }
  }

  test("password auth succeeds; wrong password and wrong user are rejected") {
    withServer { (srv, addr) =>
      val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
        pinnedHostPub = Some(srv.hostPubRaw))
      try assert(c.realpath(".") === "/") finally c.close()
      intercept[java.io.IOException] {
        Ssh.connect(addr, Creds("graft", password = Some("wrong")))
      }
      intercept[java.io.IOException] {
        Ssh.connect(addr, Creds("mallory", password = Some("hunter2")))
      }
    }
  }

  test("publickey auth: authorized Ed25519 key signs in; unauthorized key is rejected") {
    val root = Files.createTempDirectory("sshspec-pk")
    val userKey = Ssh.Curve.genEd25519()
    val srv = new MiniSshd(root, "graft", "hunter2",
      authorizedKey = Some(Ssh.Curve.edPubRaw(userKey.getPublic))).start()
    try {
      val c = Ssh.connect(srv.address, Creds("graft", ed25519Key = Some(userKey)))
      try {
        c.writeAll("/via-key.txt", "signed".getBytes("UTF-8"))
        assert(new String(c.readAll("/via-key.txt"), "UTF-8") === "signed")
      } finally c.close()
      val stranger = Ssh.Curve.genEd25519()
      intercept[java.io.IOException] {
        Ssh.connect(srv.address, Creds("graft", ed25519Key = Some(stranger)))
      }
    } finally srv.stop()
  }

  test("pinned host key mismatch aborts the handshake") {
    withServer { (_, addr) =>
      val bogus = new Array[Byte](32); bogus(0) = 42
      val e = intercept[java.io.IOException] {
        Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
          pinnedHostPub = Some(bogus))
      }
      assert(e.getMessage.contains("host key mismatch"))
    }
  }

  test("file round-trip at 5 MiB exercises channel windowing and chunked io") {
    withServer { (srv, addr) =>
      val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
        pinnedHostPub = Some(srv.hostPubRaw))
      try {
        val rnd = new java.util.Random(20260814L)
        val big = new Array[Byte](5 * 1024 * 1024)
        rnd.nextBytes(big)
        c.writeAll("/data/big.bin", big)
        val back = c.readAll("/data/big.bin")
        assert(back.length === big.length)
        assert(java.util.Arrays.equals(back, big))
        assert(c.stat("/data/big.bin").size === big.length.toLong)
      } finally c.close()
    }
  }

  test("mkdirs, listDir, glob, rename, remove, append") {
    withServer { (srv, addr) =>
      val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
        pinnedHostPub = Some(srv.hostPubRaw))
      try {
        c.writeAll("/in/a/part-0.txt", "alpha\n".getBytes("UTF-8"))
        c.writeAll("/in/a/part-1.txt", "beta\n".getBytes("UTF-8"))
        c.writeAll("/in/a/skip.json", "{}".getBytes("UTF-8"))
        c.mkdirs("/in/a") // idempotent on existing dirs
        val names = c.listDir("/in/a").map(_._1).sorted
        assert(names === Vector("part-0.txt", "part-1.txt", "skip.json"))
        assert(c.glob("/in/a/part-*.txt") === Vector("/in/a/part-0.txt", "/in/a/part-1.txt"))
        assert(c.glob("/in/a/part-?.txt") === Vector("/in/a/part-0.txt", "/in/a/part-1.txt"))
        assert(c.glob("/in/a/part-0.txt") === Vector("/in/a/part-0.txt")) // non-glob passthrough
        // append mode (the reference output's codec: append, output.go:167)
        c.writeAll("/in/a/part-0.txt", "more\n".getBytes("UTF-8"), append = true)
        assert(new String(c.readAll("/in/a/part-0.txt"), "UTF-8") === "alpha\nmore\n")
        c.rename("/in/a/part-1.txt", "/in/a/renamed.txt")
        assert(c.exists("/in/a/renamed.txt") && !c.exists("/in/a/part-1.txt"))
        c.remove("/in/a/renamed.txt")
        assert(!c.exists("/in/a/renamed.txt"))
        val err = intercept[SftpStatusException](c.readAll("/in/a/renamed.txt"))
        assert(err.code === Ssh.FxNoSuchFile)
      } finally c.close()
    }
  }

  test("path traversal outside the served root is denied") {
    withServer { (srv, addr) =>
      val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
        pinnedHostPub = Some(srv.hostPubRaw))
      try {
        val e = intercept[SftpStatusException](c.readAll("/../escape.txt"))
        assert(e.code === Ssh.FxPermissionDenied)
        val e2 = intercept[SftpStatusException](c.stat("/a/../../etc/passwd"))
        assert(e2.code === Ssh.FxPermissionDenied)
      } finally c.close()
    }
  }

  test("concurrent clients: 8 connections handshake and transfer in parallel") {
    withServer { (srv, addr) =>
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (0 until 8).map { i =>
        new Thread(() => {
          try {
            val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")),
              pinnedHostPub = Some(srv.hostPubRaw))
            try {
              val body = s"payload-$i".getBytes("UTF-8")
              c.writeAll(s"/par/worker-$i.txt", body)
              assert(java.util.Arrays.equals(c.readAll(s"/par/worker-$i.txt"), body))
            } finally c.close()
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join(30000))
      assert(errs.isEmpty, s"parallel sftp errors: ${errs.toArray.mkString("; ")}")
      val c = Ssh.connect(addr, Creds("graft", password = Some("hunter2")))
      try assert(c.glob("/par/worker-*.txt").size === 8) finally c.close()
    }
  }
}
