package graft.conn

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Nanomsg connector (impl/nanomsg/input.go, output.go — the reference
  * wraps go.nanomsg.org/mangos; "Currently only PULL and SUB sockets
  * are supported" on the input, PUSH/PUB on the output) over the PUBLIC
  * SP TCP mapping (nanomsg RFC sp-tcp-mapping): an 8-byte connection
  * header `0x00 'S' 'P' 0x00 <protocol uint16 BE> 0x00 0x00` validated
  * for peer compatibility, then messages as 8-byte big-endian length +
  * payload. SUB filtering is SUBSCRIBER-side prefix matching — the SP
  * pub/sub RFC places filtering at the receiver (unlike ZMTP's
  * upstream subscription forwarding), which the SubClient implements.
  */
object Nanomsg {

  // SP protocol numbers (public nanomsg constants)
  val Pair = 16; val Pub = 32; val Sub = 33; val Req = 48; val Rep = 49
  val Push = 80; val Pull = 81

  private val peerOf = Map(Push -> Pull, Pull -> Push, Pub -> Sub, Sub -> Pub,
    Req -> Rep, Rep -> Req, Pair -> Pair)

  private def header(protocol: Int): Array[Byte] =
    Array[Byte](0x00, 'S'.toByte, 'P'.toByte, 0x00,
      ((protocol >> 8) & 0xff).toByte, (protocol & 0xff).toByte, 0x00, 0x00)

  private def handshake(sock: Socket, myProtocol: Int): (DataInputStream, java.io.OutputStream) = {
    val in = new DataInputStream(new BufferedInputStream(sock.getInputStream))
    val out = new BufferedOutputStream(sock.getOutputStream)
    out.write(header(myProtocol)); out.flush()
    val h = new Array[Byte](8); in.readFully(h)
    require(h(0) == 0 && h(1) == 'S' && h(2) == 'P' && h(3) == 0, "sp: bad connection header")
    val peer = ((h(4) & 0xff) << 8) | (h(5) & 0xff)
    require(peerOf.get(myProtocol).contains(peer),
      s"sp: protocol $myProtocol incompatible with peer $peer")
    (in, out)
  }

  private def writeMsg(out: java.io.OutputStream, body: Array[Byte]): Unit = {
    out.write(ByteBuffer.allocate(8).putLong(body.length.toLong).array())
    out.write(body)
  }
  private def readMsg(in: DataInputStream): Array[Byte] = {
    val lb = new Array[Byte](8); in.readFully(lb)
    val len = ByteBuffer.wrap(lb).getLong.toInt
    val body = new Array[Byte](len); in.readFully(body)
    body
  }

  /** bound PULL fair-queuing messages from all connected PUSH peers —
    * the input's bind-side default (input.go). */
  final class PullServer {
    private val msgQueue = new java.util.concurrent.LinkedBlockingQueue[Array[Byte]]()
    @volatile private var server: ServerSocket = _
    def port: Int = server.getLocalPort
    def start(): this.type = {
      server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
      val acceptor = new Thread(() => {
        try while (true) {
          val sock = server.accept()
          val t = new Thread(() => {
            try {
              val (in, _) = handshake(sock, Pull)
              while (true) msgQueue.put(readMsg(in))
            } catch { case _: Throwable => () } finally sock.close()
          })
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      })
      acceptor.setDaemon(true); acceptor.start()
      this
    }
    def receive(timeoutMs: Long = 5000): Option[Array[Byte]] =
      Option(msgQueue.poll(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    def stop(): Unit = if (server != null) server.close()
  }

  final class PushClient(host: String, port: Int) extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val (_, out) = handshake(sock, Push)
    def send(body: Array[Byte]): Unit = synchronized { writeMsg(out, body); out.flush() }
    override def close(): Unit = { out.flush(); sock.close() }
  }

  /** bound PUB broadcasting every message to every connected SUB (the
    * SP pub/sub contract: filtering is the receiver's job) */
  final class PubServer {
    private val peers = new scala.collection.mutable.ArrayBuffer[(Socket, java.io.OutputStream)]()
    @volatile private var server: ServerSocket = _
    def port: Int = server.getLocalPort
    def subscriberCount: Int = peers.synchronized(peers.size)
    def start(): this.type = {
      server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
      val acceptor = new Thread(() => {
        try while (true) {
          val sock = server.accept()
          val t = new Thread(() => {
            try {
              val (in, out) = handshake(sock, Pub)
              peers.synchronized(peers += ((sock, out)))
              while (in.read() >= 0) () // drain until close
            } catch { case _: Throwable => () }
            finally { peers.synchronized(peers.filterInPlace(_._1 ne sock)); sock.close() }
          })
          t.setDaemon(true); t.start()
        } catch { case _: Throwable => () }
      })
      acceptor.setDaemon(true); acceptor.start()
      this
    }
    def publish(body: Array[Byte]): Unit = peers.synchronized {
      peers.foreach { case (_, out) =>
        try { writeMsg(out, body); out.flush() } catch { case _: Throwable => () }
      }
    }
    def stop(): Unit = if (server != null) server.close()
  }

  /** connecting SUB with receiver-side prefix filters (input.go:46
    * sub_filters; `""` subscribes to everything) */
  final class SubClient(host: String, port: Int, filters: Seq[String]) extends AutoCloseable {
    private val sock = new Socket(host, port)
    sock.setTcpNoDelay(true)
    private val (in, _) = handshake(sock, Sub)
    private val filterBytes = filters.map(_.getBytes(UTF_8))

    /** next message passing a filter, or None on timeout */
    def receive(timeoutMs: Int = 5000): Option[Array[Byte]] = {
      sock.setSoTimeout(timeoutMs)
      try {
        while (true) {
          val m = readMsg(in)
          val pass = filterBytes.isEmpty || filterBytes.exists(f =>
            f.length <= m.length && java.util.Arrays.equals(f, m.take(f.length)))
          if (pass) return Some(m)
        }
        None
      } catch { case _: java.net.SocketTimeoutException => None }
      finally sock.setSoTimeout(0)
    }
    override def close(): Unit = sock.close()
  }
}
