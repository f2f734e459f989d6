package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Row, SparkSession}

/** The redis connector family (internal/impl/redis/) on Spark:
  *
  *  - `redis` cache resource (cache.go:113-283): get/set/add/delete/exists
  *    with prefix + default TTL — [[Cache]] below, used per-partition.
  *  - `redis` processor (processor.go:17): one command per message, built
  *    from an args mapping; the reply REPLACES the message content.
  *  - `redis_list` input/output (input_list.go:17-97 BLPOP/BRPOP,
  *    output_list.go:99 RPUSH).
  *  - `redis_scan` input (input_scan.go:84-96: SCAN + GET each key).
  *  - `redis_streams` input/output (input_streams.go, output_streams.go:
  *    XADD body + metadata, XRANGE/XREAD consume).
  *  - `redis_pubsub` input/output (input_pubsub.go: SUBSCRIBE push mode).
  *
  * Scale shape: WRITE paths (list/streams push, processor commands, cache
  * set) run executor-side with ONE [[Resp.Client]] per partition
  * ([[graft.operators.External.perPartitionLookup]] lifecycle) — connection
  * count scales with partitions, never rows, exactly the reference's
  * pooled-client contract. READ paths (list drain, scan, stream range,
  * pubsub) are single-connection in the reference too — a redis queue is
  * non-replayable single-cursor ingest; the scale path drains it into a
  * durable spool (parquet/kafka) that Spark then reads partitioned. The
  * gate proves the protocol + operator envelope; at scale only the URL
  * changes.
  */
object Redis {

  /** Parse `redis://host:port`. */
  def hostPort(url: String): (String, Int) = {
    val u = java.net.URI.create(url)
    (u.getHost, u.getPort)
  }

  // ------------------------------------------------------------ cache

  /** `redis` cache resource (cache.go): the four cache-processor verbs
    * over one client connection, implementing the same [[graft.operators.
    * CacheBackends.KvBackend]] trait as the pure backends (so multilevel
    * can stack an lru in front of it). TTLs in milliseconds; `add` is
    * SET NX (ErrKeyAlreadyExists → false), matching the reference. */
  final class Cache(url: String, prefix: String = "", defaultTtlMs: Long = 0)
      extends graft.operators.CacheBackends.KvBackend {
    private val (h, p) = hostPort(url)
    private val c = new Resp.Client(h, p)
    private def pk(key: String): String = prefix + key
    private def ttlOf(ttlMs: Long): Long = if (ttlMs > 0) ttlMs else defaultTtlMs

    def get(key: String): Option[Array[Byte]] =
      Option(c.cmd("GET", pk(key)) match {
        case Resp.Bulk(d) => d
        case other => throw new IllegalStateException(s"GET: $other")
      })
    def set(key: String, value: Array[Byte], ttlMs: Long = 0): Unit = {
      val t = ttlOf(ttlMs)
      if (t > 0) c.cmd("SET", pk(key), value, "PX", t)
      else c.cmd("SET", pk(key), value)
      ()
    }
    /** SET NX: false if the key already existed. */
    def add(key: String, value: Array[Byte], ttlMs: Long = 0): Boolean = {
      val t = ttlOf(ttlMs)
      val r = if (t > 0) c.cmd("SET", pk(key), value, "PX", t, "NX")
        else c.cmd("SET", pk(key), value, "NX")
      r != Resp.NullBulk
    }
    def delete(key: String): Unit = { c.cmd("DEL", pk(key)); () }
    override def exists(key: String): Boolean = c.long("EXISTS", pk(key)) == 1
    override def close(): Unit = c.close()
  }

  // -------------------------------------------------------- processor

  /** `redis` processor (processor.go:17): for each row, run `command`
    * with `argsOf(row)` args; the reply replaces the content (integers
    * render as decimal strings, arrays as JSON — the reference marshals
    * replies the same way before re-injecting them). Per-partition client
    * lifecycle; the output is (row passthrough cols..., reply). */
  def procCommand[T: Encoder](df: DataFrame, url: String, command: String)(
      argsOf: Row => Seq[Any])(pack: (Row, String) => T): Dataset[T] = {
    val (h, p) = hostPort(url)
    graft.operators.External.perPartitionLookup[Resp.Client, T](df)(
      () => new Resp.Client(h, p)) { (c, row) =>
      pack(row, renderReply(c.cmd(command +: argsOf(row): _*)))
    }(_.close())
  }

  /** Reply → message content, mirroring the reference's marshaling. */
  /** `redis` rate limit (impl/redis/rate_limit.go:46-119): the
    * reference's token-bucket Lua script VERBATIM over EVAL — INCR the
    * window key, PEXPIRE on first touch, and return PTTL as the
    * retry-after when the count exceeds the bucket. The limit is
    * SHARED across every client of the same Redis (here: every Spark
    * task), which is exactly what distinguishes it from the local
    * in-process RateLimiter (External.scala). `access()` returns 0 when
    * admitted or the millis to wait; `waitFor()` is the blocking form
    * the reference's rate_limit processor wraps around it. */
  final class RateLimit(url: String, key: String, count: Long, intervalMs: Long)
      extends AutoCloseable {
    private val (h, p) = hostPort(url)
    private val c = new Resp.Client(h, p)
    private val script =
      """local current = redis.call("INCR",KEYS[1])
        |
        |if current == 1 then
        |    redis.call("PEXPIRE", KEYS[1], tonumber(ARGV[2]))
        |end
        |
        |if current > tonumber(ARGV[1]) then
        |	return redis.call("PTTL", KEYS[1])
        |end
        |
        |return 0
        |""".stripMargin

    /** 0 = admitted; otherwise millis until the window resets */
    def access(): Long = c.long("EVAL", script, "1", key, count.toString, intervalMs.toString)

    /** block until admitted (bounded) */
    def waitFor(maxWaitMs: Long = 30000): Unit = {
      val deadline = System.currentTimeMillis() + maxWaitMs
      var backoff = access()
      while (backoff > 0) {
        require(System.currentTimeMillis() < deadline, s"rate limit $key: starved")
        Thread.sleep(math.min(backoff, 50L))
        backoff = access()
      }
    }
    override def close(): Unit = c.close()
  }

  def renderReply(v: Resp.Value): String = v match {
    case Resp.Simple(s) => s
    case Resp.Int64(n) => n.toString
    case Resp.Bulk(null) => null
    case Resp.Bulk(d) => new String(d, UTF_8)
    case Resp.Arr(null) => "null"
    case Resp.Arr(xs) =>
      xs.map(x => "\"" + renderReply(x).replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
    case Resp.Err(m) => throw new Resp.RedisErrorException(m)
  }

  /** `redis_script` processor (script_processor.go:118-170): run a Lua
    * script per message — keys from `keysOf` (the keys_mapping), args from
    * `argsOf` (the args_mapping) — via EVALSHA with EVAL fallback on
    * NOSCRIPT, the go-redis Script.Run path the reference calls. The
    * reply REPLACES the message content (script_processor.go:168
    * SetStructuredMut), marshaled like the `redis` processor's replies.
    * One client per partition; scripts execute atomically server-side
    * (the fixture interprets them with [[Lua]]). */
  def scriptProc[T: Encoder](df: DataFrame, url: String, script: String)(
      keysOf: Row => Seq[String], argsOf: Row => Seq[Any])(pack: (Row, String) => T): Dataset[T] = {
    val (h, p) = hostPort(url)
    val sha = java.security.MessageDigest.getInstance("SHA-1")
      .digest(script.getBytes(UTF_8)).map("%02x".format(_)).mkString
    graft.operators.External.perPartitionLookup[Resp.Client, T](df)(
      () => new Resp.Client(h, p)) { (c, row) =>
      val keys = keysOf(row)
      val args = argsOf(row)
      val tail: Seq[Any] = (keys.length.toLong +: keys) ++ args
      val reply =
        try c.cmd(("EVALSHA" +: sha +: tail): _*)
        catch {
          case e: Resp.RedisErrorException if e.getMessage.startsWith("NOSCRIPT") =>
            c.cmd(("EVAL" +: script +: tail): _*)
        }
      pack(row, renderReply(reply))
    }(_.close())
  }

  // ------------------------------------------------------- list queue

  /** `redis_list` output (output_list.go:99): RPUSH each row's payload,
    * one client per partition. */
  def listOutput(df: Dataset[String], url: String, key: String): Unit = {
    val (h, p) = hostPort(url)
    df.foreachPartition { rows: Iterator[String] =>
      if (rows.nonEmpty) {
        val c = new Resp.Client(h, p)
        try rows.foreach(v => c.cmd("RPUSH", key, v))
        finally c.close()
      }
    }
  }

  /** `redis_list` input (input_list.go:93-97): BLPOP-drain the queue until
    * a poll timeout says it is dry. Single cursor by protocol — same as
    * the reference's one connection; parallelism at scale = competing
    * consumers, or spool-to-parquet then read partitioned. */
  def listInput(spark: SparkSession, url: String, key: String,
                pollTimeoutSec: Double = 0.2): Dataset[String] = {
    import spark.implicits._
    val (h, p) = hostPort(url)
    val c = new Resp.Client(h, p)
    val out = Vector.newBuilder[String]
    try {
      var done = false
      while (!done) c.cmd("BLPOP", key, pollTimeoutSec) match {
        case Resp.Arr(null) => done = true
        case Resp.Arr(Vector(_, Resp.Bulk(d))) => out += new String(d, UTF_8)
        case other => throw new IllegalStateException(s"BLPOP: $other")
      }
    } finally c.close()
    spark.createDataset(out.result())
  }

  // ------------------------------------------------------------- scan

  /** `redis_scan` input (input_scan.go:84-96): SCAN the keyspace with a
    * glob, GET each key, emit (key, value) rows. */
  def scanInput(spark: SparkSession, url: String, matchGlob: String): Dataset[(String, String)] = {
    import spark.implicits._
    val (h, p) = hostPort(url)
    val c = new Resp.Client(h, p)
    val out = Vector.newBuilder[(String, String)]
    try {
      var cursor = "0"
      var first = true
      while (first || cursor != "0") {
        first = false
        c.cmd("SCAN", cursor, "MATCH", matchGlob, "COUNT", 64L) match {
          case Resp.Arr(Vector(Resp.Bulk(cur), Resp.Arr(keys))) =>
            cursor = new String(cur, UTF_8)
            keys.foreach { case Resp.Bulk(kd) =>
              val key = new String(kd, UTF_8)
              c.cmd("GET", key) match {
                case Resp.Bulk(null) => () // expired between SCAN and GET
                case Resp.Bulk(v) => out += ((key, new String(v, UTF_8)))
                case other => throw new IllegalStateException(s"GET: $other")
              }
            case other => throw new IllegalStateException(s"SCAN key: $other")
            }
          case other => throw new IllegalStateException(s"SCAN: $other")
        }
      }
    } finally c.close()
    spark.createDataset(out.result())
  }

  // ---------------------------------------------------------- streams

  /** `redis_streams` output (output_streams.go): XADD each row as a
    * `body` field (+ metadata fields), auto id, per-partition clients. */
  def streamsOutput(df: Dataset[String], url: String, stream: String,
                    bodyKey: String = "body"): Unit = {
    val (h, p) = hostPort(url)
    df.foreachPartition { rows: Iterator[String] =>
      if (rows.nonEmpty) {
        val c = new Resp.Client(h, p)
        try rows.foreach(v => c.cmd("XADD", stream, "*", bodyKey, v))
        finally c.close()
      }
    }
  }

  /** `redis_streams` input (input_streams.go): full-range XRANGE read;
    * emits (id, body). */
  def streamsInput(spark: SparkSession, url: String, stream: String,
                   bodyKey: String = "body"): Dataset[(String, String)] = {
    import spark.implicits._
    val (h, p) = hostPort(url)
    val c = new Resp.Client(h, p)
    try {
      val entries = c.arr("XRANGE", stream, "-", "+").map {
        case Resp.Arr(Vector(Resp.Bulk(id), Resp.Arr(fields))) =>
          val fv = fields.grouped(2).collect {
            case Vector(Resp.Bulk(f), Resp.Bulk(v)) =>
              (new String(f, UTF_8), new String(v, UTF_8))
          }.toMap
          (new String(id, UTF_8), fv.getOrElse(bodyKey, null))
        case other => throw new IllegalStateException(s"XRANGE entry: $other")
      }
      spark.createDataset(entries)
    } finally c.close()
  }

  // ----------------------------------------------------------- pubsub

  /** `redis_pubsub` output: PUBLISH each row (fire-and-forget, at-most-once
    * — the reference's pubsub contract). */
  def publish(url: String, channel: String, payloads: Seq[String]): Unit = {
    val (h, p) = hostPort(url)
    val c = new Resp.Client(h, p)
    try payloads.foreach(v => c.cmd("PUBLISH", channel, v))
    finally c.close()
  }

  /** `redis_pubsub` input (input_pubsub.go): SUBSCRIBE and collect `n`
    * pushed messages (bounded drain for the gate; unbounded streams spool
    * to durable storage, as with [[Ws]]). Returns after `timeoutMs` even
    * if short. */
  def subscribeCollect(url: String, channel: String, n: Int,
                       ready: java.util.concurrent.CountDownLatch,
                       timeoutMs: Long = 30000): Vector[String] = {
    val (h, p) = hostPort(url)
    val c = new Resp.Client(h, p)
    try {
      c.push("SUBSCRIBE", channel)
      c.readPush() match {
        case Resp.Arr(Vector(Resp.Bulk(k), _, _)) if new String(k, UTF_8) == "subscribe" => ()
        case other => throw new IllegalStateException(s"SUBSCRIBE ack: $other")
      }
      ready.countDown()
      val out = Vector.newBuilder[String]
      var got = 0
      while (got < n) {
        c.readPush() match {
          case Resp.Arr(Vector(Resp.Bulk(t), _, Resp.Bulk(payload)))
              if new String(t, UTF_8) == "message" =>
            out += new String(payload, UTF_8); got += 1
          case other => throw new IllegalStateException(s"push: $other")
        }
      }
      out.result()
    } finally c.close()
  }
}
