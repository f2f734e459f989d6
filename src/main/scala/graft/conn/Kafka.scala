package graft.conn

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream}
import java.net.{InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicBoolean
import java.util.zip.CRC32

import scala.collection.mutable

/** Kafka wire protocol (internal/impl/kafka/: the reference's flagship
  * input/output family wraps sarama/franz-go; no kafka broker, client
  * library, or spark-sql-kafka jar exists in this sandbox) — both ends
  * from the PUBLIC Apache Kafka protocol specification, the established
  * from-scratch precedent ([[Ws]]/[[Resp]]/[[Nats]]/[[Mqtt]]/[[Amqp]]).
  *
  * Implemented at protocol version 0 (documented stable wire format):
  * length-prefixed request frames `api_key api_version correlation_id
  * client_id body`, correlation-echoed responses, and the APIs the
  * connector surface needs — Metadata (3), Produce (0) with required
  * acks, Fetch (1) with per-partition offsets and high watermark. The
  * MessageSet codec is byte-exact per the spec: `offset(8) size(4)
  * crc32(4) magic(1) attributes(1) key(bytes) value(bytes)` with the
  * CRC over magic..value — [[messageSetBytes]]/[[readMessageSet]] are
  * pure functions unit-tested against hand-computed vectors.
  *
  * Partitioning is the real Kafka contract: a topic is N independent
  * ordered logs; producers pick the partition, consumers own
  * (partition, offset) cursors. The Spark operator layer maps exactly
  * onto that — one producer client per Spark partition, and one FETCH
  * CURSOR PER KAFKA PARTITION running executor-side, which is the same
  * parallelism shape as Spark's own kafka source (1 task per topic
  * partition). Declared out: consumer groups/rebalancing (Spark owns
  * offsets via checkpoints — the same reason its kafka source commits
  * nothing), record-batch v2 (zstd/varint batches), idempotent/
  * transactional produce, SASL/TLS.
  */
object Kafka {

  // ---------------------------------------------------------- primitives

  private def readExact(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"kafka stream closed at $off/$n bytes")
      off += r
    }
    buf
  }

  final class W {
    private val bo = new java.io.ByteArrayOutputStream()
    private val d = new DataOutputStream(bo)
    def i8(v: Int): W = { d.writeByte(v); this }
    def i16(v: Int): W = { d.writeShort(v); this }
    def i32(v: Int): W = { d.writeInt(v); this }
    def i64(v: Long): W = { d.writeLong(v); this }
    def str(s: String): W = {
      if (s == null) i16(-1)
      else { val b = s.getBytes(UTF_8); d.writeShort(b.length); d.write(b) }
      this
    }
    def bytes(b: Array[Byte]): W = {
      if (b == null) i32(-1) else { d.writeInt(b.length); d.write(b) }
      this
    }
    def raw(b: Array[Byte]): W = { d.write(b); this }
    def result: Array[Byte] = { d.flush(); bo.toByteArray }
  }

  final class R(buf: Array[Byte]) {
    private val d = new DataInputStream(new java.io.ByteArrayInputStream(buf))
    def i8(): Int = d.readByte().toInt
    def i16(): Int = d.readShort().toInt
    def i32(): Int = d.readInt()
    def i64(): Long = d.readLong()
    def str(): String = {
      val n = d.readShort()
      if (n < 0) null else new String(readExact(d, n), UTF_8)
    }
    def bytes(): Array[Byte] = {
      val n = d.readInt()
      if (n < 0) null else readExact(d, n)
    }
    def raw(n: Int): Array[Byte] = readExact(d, n)
    def remaining: Int = d.available()
  }

  // --------------------------------------------------- message set codec

  /** One message in a partition log. */
  final case class Msg(offset: Long, key: Array[Byte], value: Array[Byte])

  /** Serialize messages as a v0 MessageSet starting at `baseOffset`.
    * CRC32 covers magic..value (spec: message = crc + crc'd payload). */
  def messageSetBytes(baseOffset: Long, msgs: Seq[(Array[Byte], Array[Byte])]): Array[Byte] = {
    val out = new W()
    msgs.zipWithIndex.foreach { case ((k, v), i) =>
      val body = new W().i8(0).i8(0).bytes(k).bytes(v).result // magic 0, no attrs
      val crc = new CRC32()
      crc.update(body)
      val msg = new W().i32(crc.getValue.toInt).raw(body).result
      out.i64(baseOffset + i).i32(msg.length).raw(msg)
    }
    out.result
  }

  /** Parse a v0 MessageSet, verifying each CRC. Tolerates a trailing
    * partial message (the spec allows truncation at maxBytes). */
  def readMessageSet(buf: Array[Byte]): Vector[Msg] = {
    val out = Vector.newBuilder[Msg]
    val r = new R(buf)
    while (r.remaining >= 12) {
      val offset = r.i64()
      val size = r.i32()
      if (r.remaining < size) return out.result() // truncated tail
      val msg = new R(r.raw(size))
      val crc = msg.i32()
      val magic = msg.i8(); val attrs = msg.i8()
      val key = msg.bytes(); val value = msg.bytes()
      val check = new CRC32()
      val rebuilt = new W().i8(magic).i8(attrs).bytes(key).bytes(value).result
      check.update(rebuilt)
      if (check.getValue.toInt != crc)
        throw new java.io.IOException(s"kafka message CRC mismatch at offset $offset")
      out += Msg(offset, key, value)
    }
    out.result()
  }

  // -------------------------------------------------------------- broker

  /** Minimal Kafka broker: auto-created topics with a fixed partition
    * count, append-only in-memory logs, Metadata/Produce/Fetch at v0.
    * Thread-per-connection, all daemon. */
  final class MiniKafka(numPartitions: Int = 4) {
    private val lock = new Object
    private val logs = mutable.LinkedHashMap[(String, Int), mutable.ArrayBuffer[Msg]]()
    private val topics = mutable.LinkedHashSet[String]()
    private val running = new AtomicBoolean(true)
    private var server: ServerSocket = _

    def start(): MiniKafka = {
      server = new ServerSocket(0, 64, InetAddress.getLoopbackAddress)
      val acceptor = new Thread(() => {
        while (running.get()) {
          try {
            val s = server.accept()
            val th = new Thread(() => serve(s)); th.setDaemon(true); th.start()
          } catch { case _: Throwable => () }
        }
      }, "mini-kafka-accept")
      acceptor.setDaemon(true)
      acceptor.start()
      this
    }

    def port: Int = server.getLocalPort
    def bootstrap: String = s"127.0.0.1:$port"
    def stop(): Unit = {
      running.set(false)
      try server.close() catch { case _: Throwable => () }
    }

    private def logOf(topic: String, partition: Int): mutable.ArrayBuffer[Msg] = {
      topics.add(topic)
      logs.getOrElseUpdate((topic, partition), mutable.ArrayBuffer[Msg]())
    }

    private def handle(apiKey: Int, apiVersion: Int, body: R): Array[Byte] = apiKey match {
      case 3 => // Metadata v0: [topics] → brokers + topic/partition layout
        val nReq = body.i32()
        val req = (0 until nReq).map(_ => body.str())
        val names = lock.synchronized {
          val known = if (req.isEmpty) topics.toVector else req.toVector
          known.foreach(t => (0 until numPartitions).foreach(p => logOf(t, p)))
          known
        }
        val w = new W()
        w.i32(1).i32(0).str("127.0.0.1").i32(port) // one broker, node 0
        w.i32(names.length)
        names.foreach { t =>
          w.i16(0).str(t).i32(numPartitions)
          (0 until numPartitions).foreach { p =>
            w.i16(0).i32(p).i32(0) // error, partition id, leader node 0
            w.i32(1).i32(0)        // replicas [0]
            w.i32(1).i32(0)        // isr [0]
          }
        }
        w.result

      case 0 => // Produce v0: acks, timeout, [topic [partition msgset]]
        body.i16(); body.i32()
        val w = new W()
        val nTopics = body.i32()
        w.i32(nTopics)
        (0 until nTopics).foreach { _ =>
          val topic = body.str()
          val nParts = body.i32()
          w.str(topic).i32(nParts)
          (0 until nParts).foreach { _ =>
            val partition = body.i32()
            val setSize = body.i32()
            val msgs = readMessageSet(body.raw(setSize))
            val baseOffset = lock.synchronized {
              val log = logOf(topic, partition)
              val base = log.length.toLong
              msgs.zipWithIndex.foreach { case (m, i) =>
                log.append(Msg(base + i, m.key, m.value))
              }
              base
            }
            w.i32(partition).i16(0).i64(baseOffset)
          }
        }
        w.result

      case 1 => // Fetch v0: replica, max_wait, min_bytes, [topic [part offset maxBytes]]
        body.i32(); body.i32(); body.i32()
        val w = new W()
        val nTopics = body.i32()
        w.i32(nTopics)
        (0 until nTopics).foreach { _ =>
          val topic = body.str()
          val nParts = body.i32()
          w.str(topic).i32(nParts)
          (0 until nParts).foreach { _ =>
            val partition = body.i32()
            val offset = body.i64()
            val maxBytes = body.i32()
            val (set, hw) = lock.synchronized {
              val log = logOf(topic, partition)
              val slice = log.iterator.dropWhile(_.offset < offset)
                .map(m => (m.key, m.value)).toVector
              // respect maxBytes by trimming whole messages
              var budget = maxBytes
              val kept = Vector.newBuilder[(Array[Byte], Array[Byte])]
              slice.foreach { kv =>
                val sz = 26 + (if (kv._1 == null) 0 else kv._1.length) +
                  (if (kv._2 == null) 0 else kv._2.length)
                if (budget - sz >= 0) { kept += kv; budget -= sz }
              }
              (messageSetBytes(offset, kept.result()), log.length.toLong)
            }
            w.i32(partition).i16(0).i64(hw).i32(set.length).raw(set)
          }
        }
        w.result

      case other =>
        throw new java.io.IOException(s"unhandled kafka api key $other")
    }

    private def serve(sock: Socket): Unit = {
      sock.setTcpNoDelay(true)
      val in = new BufferedInputStream(sock.getInputStream)
      val out = new BufferedOutputStream(sock.getOutputStream)
      try {
        while (true) {
          val len = new DataInputStream(in).readInt()
          val req = new R(readExact(in, len))
          val apiKey = req.i16(); val apiVersion = req.i16()
          val corr = req.i32(); req.str() // client id
          val resp = handle(apiKey, apiVersion, req)
          val framed = new W().i32(corr).raw(resp).result
          out.synchronized {
            new DataOutputStream(out).writeInt(framed.length)
            out.write(framed)
            out.flush()
          }
        }
      } catch {
        case _: EOFException => ()
        case _: java.net.SocketException => ()
      } finally { try sock.close() catch { case _: Throwable => () } }
    }
  }

  // -------------------------------------------------------------- client

  final case class PartitionMeta(partition: Int, leader: Int)
  final case class TopicMeta(topic: String, partitions: Vector[PartitionMeta])

  /** Blocking client: one socket, correlated request/response. One per
    * Spark partition in the operator layer. */
  final class Client(bootstrap: String, clientId: String = "graft") extends AutoCloseable {
    private val Array(h, p) = bootstrap.split(":")
    private val sock = new Socket(h, p.toInt)
    sock.setTcpNoDelay(true)
    private val in = new BufferedInputStream(sock.getInputStream)
    private val out = new BufferedOutputStream(sock.getOutputStream)
    private var corr = 0

    private def call(apiKey: Int, body: Array[Byte]): R = synchronized {
      corr += 1
      val req = new W().i16(apiKey).i16(0).i32(corr).str(clientId).raw(body).result
      new DataOutputStream(out).writeInt(req.length)
      out.write(req)
      out.flush()
      val len = new DataInputStream(in).readInt()
      val r = new R(readExact(in, len))
      val got = r.i32()
      require(got == corr, s"correlation id $got != $corr")
      r
    }

    def metadata(topic: String): TopicMeta = {
      val r = call(3, new W().i32(1).str(topic).result)
      val nBrokers = r.i32()
      (0 until nBrokers).foreach { _ => r.i32(); r.str(); r.i32() }
      val nTopics = r.i32()
      require(nTopics == 1, s"expected 1 topic, got $nTopics")
      r.i16() // topic error
      val name = r.str()
      val nParts = r.i32()
      val parts = (0 until nParts).map { _ =>
        r.i16() // partition error
        val id = r.i32(); val leader = r.i32()
        val nRep = r.i32(); (0 until nRep).foreach(_ => r.i32())
        val nIsr = r.i32(); (0 until nIsr).foreach(_ => r.i32())
        PartitionMeta(id, leader)
      }.toVector
      TopicMeta(name, parts)
    }

    /** Produce with acks=1; returns the base offset assigned. */
    def produce(topic: String, partition: Int,
                msgs: Seq[(Array[Byte], Array[Byte])]): Long = {
      val set = messageSetBytes(0L, msgs) // broker assigns real offsets
      val body = new W().i16(1).i32(10000).i32(1).str(topic).i32(1)
        .i32(partition).i32(set.length).raw(set).result
      val r = call(0, body)
      r.i32(); r.str(); r.i32(); // 1 topic, name, 1 partition
      val part = r.i32(); val err = r.i16(); val base = r.i64()
      require(err == 0, s"produce error $err on partition $part")
      base
    }

    /** Fetch from (topic, partition, offset); returns (messages, highWatermark). */
    def fetch(topic: String, partition: Int, offset: Long,
              maxBytes: Int = 1 << 20): (Vector[Msg], Long) = {
      val body = new W().i32(-1).i32(100).i32(1).i32(1).str(topic).i32(1)
        .i32(partition).i64(offset).i32(maxBytes).result
      val r = call(1, body)
      r.i32(); r.str(); r.i32() // 1 topic, name, 1 partition
      val part = r.i32(); val err = r.i16(); val hw = r.i64()
      require(err == 0, s"fetch error $err on partition $part")
      val setSize = r.i32()
      (readMessageSet(r.raw(setSize)), hw)
    }

    override def close(): Unit = { try sock.close() catch { case _: Throwable => () } }
  }

  // ------------------------------------------------------ operator layer

  /** kafka output: each Spark partition produces through its own client;
    * the kafka partition is chosen per row (the reference's partitioner
    * contract — key-hash or explicit). Buffered per kafka partition and
    * flushed in chunks so the produce count scales with chunks, not rows. */
  def output(df: org.apache.spark.sql.DataFrame, bootstrap: String, topic: String,
             partitionOf: org.apache.spark.sql.Row => Int,
             keyOf: org.apache.spark.sql.Row => Array[Byte],
             valueOf: org.apache.spark.sql.Row => Array[Byte],
             chunk: Int = 500): Unit = {
    df.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      if (rows.nonEmpty) {
        val c = new Client(bootstrap)
        try {
          val pending = mutable.HashMap[Int, mutable.ArrayBuffer[(Array[Byte], Array[Byte])]]()
          def flush(p: Int): Unit = pending.get(p).filter(_.nonEmpty).foreach { b =>
            c.produce(topic, p, b.toSeq); b.clear()
          }
          rows.foreach { row =>
            val p = partitionOf(row)
            val buf = pending.getOrElseUpdate(p, mutable.ArrayBuffer[(Array[Byte], Array[Byte])]())
            buf.append((keyOf(row), valueOf(row)))
            if (buf.length >= chunk) flush(p)
          }
          pending.keys.foreach(flush)
        } finally c.close()
      }
    }
  }

  /** kafka input: one fetch cursor PER KAFKA PARTITION, running
    * executor-side — the same task shape as Spark's own kafka source.
    * Reads each partition from `startOffset` to its high watermark at
    * call time (bounded, the batch semantics of spark.read.kafka). */
  def input(spark: org.apache.spark.sql.SparkSession, bootstrap: String, topic: String)
      : org.apache.spark.sql.Dataset[(Int, Long, String, String)] = {
    import spark.implicits._
    val meta = {
      val c = new Client(bootstrap)
      try c.metadata(topic) finally c.close()
    }
    val parts = meta.partitions.map(_.partition)
    spark.createDataset(parts).repartition(parts.length)
      .mapPartitions { pids =>
        pids.flatMap { pid =>
          val c = new Client(bootstrap)
          try {
            val out = Vector.newBuilder[(Int, Long, String, String)]
            var offset = 0L
            var hw = Long.MaxValue
            var done = false
            while (!done) {
              val (msgs, highWater) = c.fetch(topic, pid, offset)
              hw = highWater
              msgs.foreach { m =>
                out += ((pid, m.offset,
                  if (m.key == null) null else new String(m.key, UTF_8),
                  if (m.value == null) null else new String(m.value, UTF_8)))
              }
              offset = if (msgs.nonEmpty) msgs.last.offset + 1 else offset
              done = offset >= hw
            }
            out.result()
          } finally c.close()
        }
      }
  }
}
