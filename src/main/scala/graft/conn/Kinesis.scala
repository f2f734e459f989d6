package graft.conn

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.concurrent.{TrieMap => CTrieMap}
import scala.collection.immutable.VectorMap
import scala.collection.mutable.ArrayBuffer

import graft.conn.Aws.{AwsHttp, Json, MiniAwsService, SigV4}

/** Amazon Kinesis Data Streams connector over the PUBLIC Kinesis JSON
  * protocol (Content-Type application/x-amz-json-1.1, X-Amz-Target
  * Kinesis_20131202.&lt;Action&gt;), SigV4-signed and verified per request.
  *
  * Reference surface being re-expressed:
  *  - input_kinesis.go — shard-parallel GetRecords consumption; the
  *    reference balances shards across clients with a DynamoDB
  *    checkpointer (input_kinesis_checkpointer.go) — on Spark the shard
  *    list IS the task list (one fetch cursor per shard executor-side,
  *    the same shape as the kafka input), and offsets live in the
  *    engine's own checkpoint story, so the external checkpointer table
  *    is deliberately not reproduced.
  *  - output_kinesis.go — PutRecords batches of ≤500 with the partition
  *    key interpolated per message and failed-entry retry.
  *
  * Record routing follows the public service contract: the 128-bit MD5
  * of the partition key selects the shard whose HashKeyRange contains it;
  * sequence numbers are per-shard monotone. The reference wraps
  * aws-sdk-go-v2/service/kinesis and has no routing logic to port.
  */
object Kinesis {

  final case class Shard(shardId: String, startHash: BigInteger, endHash: BigInteger)
  final case class Record(data: Array[Byte], partitionKey: String,
                          sequenceNumber: String, arrivalTs: Long)

  private val HashSpace = BigInteger.ONE.shiftLeft(128) // 2^128

  def shardIdName(i: Int): String = f"shardId-$i%012d"

  /** MD5(partitionKey) as an unsigned 128-bit integer — the documented
    * PutRecord routing hash. */
  def routingHash(partitionKey: String): BigInteger =
    new BigInteger(1, java.security.MessageDigest.getInstance("MD5")
      .digest(partitionKey.getBytes(UTF_8)))

  def shardRanges(n: Int): Seq[Shard] = (0 until n).map { i =>
    val start = HashSpace.multiply(BigInteger.valueOf(i)).divide(BigInteger.valueOf(n))
    val end = HashSpace.multiply(BigInteger.valueOf(i + 1)).divide(BigInteger.valueOf(n))
      .subtract(BigInteger.ONE)
    Shard(shardIdName(i), start, end)
  }

  // ------------------------------------------------------------- fixture
  private final class ShardState {
    val records = new ArrayBuffer[Record]()
    var seq = 0L
  }

  final class MiniKinesis(creds: SigV4.Credentials = Aws.testCreds)
      extends MiniAwsService("kinesis", creds) {
    private val streams = new CTrieMap[String, (Seq[Shard], Array[ShardState])]()

    def createStreamDirect(name: String, shardCount: Int): Unit =
      streams.putIfAbsent(name, (shardRanges(shardCount),
        Array.fill(shardCount)(new ShardState)))

    def recordCount(stream: String): Int =
      streams.get(stream).map(_._2.map(s => s.synchronized(s.records.size)).sum).getOrElse(0)

    private def ok(body: VectorMap[String, Any]): (Int, Seq[(String, String)], Array[Byte]) =
      (200, Seq("Content-Type" -> "application/x-amz-json-1.1"), Json.render(body).getBytes(UTF_8))
    private def err(typ: String, msg: String): (Int, Seq[(String, String)], Array[Byte]) =
      (400, Seq("Content-Type" -> "application/x-amz-json-1.1"),
        Json.render(Json.obj("__type" -> typ, "message" -> msg)).getBytes(UTF_8))

    private def shardIndexFor(shards: Seq[Shard], key: String): Int = {
      val h = routingHash(key)
      shards.indexWhere(s => h.compareTo(s.startHash) >= 0 && h.compareTo(s.endHash) <= 0)
    }

    private def append(st: ShardState, shardIdx: Int, data: Array[Byte], key: String): String =
      st.synchronized {
        val sn = f"${shardIdx}%04d${st.seq}%017d" // per-shard monotone, shard-scoped
        st.seq += 1
        st.records += Record(data, key, sn, System.currentTimeMillis())
        sn
      }

    // iterator token: stream/shardIdx/offset (opaque to clients)
    private def iter(stream: String, shardIdx: Int, offset: Long) = s"$stream/$shardIdx/$offset"

    protected def handle(method: String, path: String, query: String,
                         headers: Map[String, String], body: Array[Byte]): (Int, Seq[(String, String)], Array[Byte]) = {
      val target = headers.getOrElse("x-amz-target", "")
      val req = Json.asObj(Json.parse(new String(body, UTF_8)))
      def stream() = streams.get(Json.str(req, "StreamName"))

      target.stripPrefix("Kinesis_20131202.") match {
        case "CreateStream" =>
          createStreamDirect(Json.str(req, "StreamName"), Json.long(req, "ShardCount", 1).toInt)
          ok(Json.obj())

        case "ListShards" => stream() match {
          case Some((shards, _)) =>
            ok(Json.obj("Shards" -> shards.toVector.map { s =>
              Json.obj("ShardId" -> s.shardId, "HashKeyRange" -> Json.obj(
                "StartingHashKey" -> s.startHash.toString,
                "EndingHashKey" -> s.endHash.toString)): Any
            }))
          case None => err("ResourceNotFoundException", Json.str(req, "StreamName"))
        }

        case "PutRecord" => stream() match {
          case Some((shards, states)) =>
            val key = Json.str(req, "PartitionKey")
            val i = shardIndexFor(shards, key)
            val sn = append(states(i), i,
              java.util.Base64.getDecoder.decode(Json.str(req, "Data")), key)
            ok(Json.obj("ShardId" -> shards(i).shardId, "SequenceNumber" -> sn))
          case None => err("ResourceNotFoundException", Json.str(req, "StreamName"))
        }

        case "PutRecords" => stream() match {
          case Some((shards, states)) =>
            val entries = Json.asArr(req("Records")).map(Json.asObj)
            if (entries.size > 500) err("ValidationException", s"${entries.size} records > 500")
            else ok(Json.obj("FailedRecordCount" -> 0L,
              "Records" -> entries.map { e =>
                val key = Json.str(e, "PartitionKey")
                val i = shardIndexFor(shards, key)
                val sn = append(states(i), i,
                  java.util.Base64.getDecoder.decode(Json.str(e, "Data")), key)
                Json.obj("ShardId" -> shards(i).shardId, "SequenceNumber" -> sn): Any
              }))
          case None => err("ResourceNotFoundException", Json.str(req, "StreamName"))
        }

        case "GetShardIterator" => stream() match {
          case Some((shards, states)) =>
            val name = Json.str(req, "StreamName")
            val idx = shards.indexWhere(_.shardId == Json.str(req, "ShardId"))
            if (idx < 0) err("ResourceNotFoundException", Json.str(req, "ShardId"))
            else {
              val st = states(idx)
              val offset = Json.str(req, "ShardIteratorType") match {
                case "TRIM_HORIZON" => 0L
                case "LATEST" => st.synchronized(st.records.size.toLong)
                case "AT_SEQUENCE_NUMBER" =>
                  val sn = Json.str(req, "StartingSequenceNumber")
                  st.synchronized(st.records.indexWhere(_.sequenceNumber == sn)).toLong
                case "AFTER_SEQUENCE_NUMBER" =>
                  val sn = Json.str(req, "StartingSequenceNumber")
                  st.synchronized(st.records.indexWhere(_.sequenceNumber == sn)).toLong + 1
                case other => return err("ValidationException", s"iterator type $other")
              }
              ok(Json.obj("ShardIterator" -> iter(name, idx, offset)))
            }
          case None => err("ResourceNotFoundException", Json.str(req, "StreamName"))
        }

        case "GetRecords" =>
          val tok = Json.str(req, "ShardIterator").split('/')
          val (name, idx, offset) = (tok(0), tok(1).toInt, tok(2).toLong)
          streams.get(name) match {
            case Some((_, states)) =>
              val st = states(idx)
              val limit = math.min(10000, math.max(1, Json.long(req, "Limit", 10000))).toInt
              val (slice, total) = st.synchronized {
                (st.records.slice(offset.toInt, offset.toInt + limit).toVector, st.records.size)
              }
              ok(Json.obj(
                "Records" -> slice.map { r =>
                  Json.obj("Data" -> java.util.Base64.getEncoder.encodeToString(r.data),
                    "PartitionKey" -> r.partitionKey,
                    "SequenceNumber" -> r.sequenceNumber,
                    "ApproximateArrivalTimestamp" -> (r.arrivalTs / 1000.0)): Any
                },
                "NextShardIterator" -> iter(name, idx, offset + slice.size),
                "MillisBehindLatest" -> (if (offset + slice.size >= total) 0L else 1L)))
            case None => err("ResourceNotFoundException", name)
          }

        case other => err("InvalidAction", other)
      }
    }
  }

  // -------------------------------------------------------------- client
  final case class GotRecords(records: Seq[Record], nextIterator: String, millisBehind: Long)

  final class Client(endpoint: String, creds: SigV4.Credentials = Aws.testCreds,
                     region: String = Aws.testRegion) extends AutoCloseable {
    private val aws = new AwsHttp(endpoint, region, "kinesis", creds)

    private def call(action: String, body: VectorMap[String, Any]): VectorMap[String, Any] = {
      val r = aws.request("POST", "/", extraHeaders = Seq(
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> s"Kinesis_20131202.$action"),
        body = Json.render(body).getBytes(UTF_8))
      require(r.status == 200, s"$action: ${r.status} ${r.bodyStr}")
      Json.asObj(Json.parse(r.bodyStr))
    }

    def createStream(name: String, shardCount: Int): Unit = {
      call("CreateStream", Json.obj("StreamName" -> name, "ShardCount" -> shardCount.toLong)); ()
    }

    def listShards(name: String): Seq[String] =
      Json.asArr(call("ListShards", Json.obj("StreamName" -> name))("Shards"))
        .map(s => Json.str(Json.asObj(s), "ShardId"))

    /** one PutRecords call; caller chunks to ≤500 (output_kinesis.go) */
    def putRecords(name: String, records: Seq[(String, Array[Byte])]): Seq[(String, String)] = {
      require(records.size <= 500, s"PutRecords limit is 500, got ${records.size}")
      val resp = call("PutRecords", Json.obj("StreamName" -> name,
        "Records" -> records.toVector.map { case (key, data) =>
          Json.obj("Data" -> java.util.Base64.getEncoder.encodeToString(data),
            "PartitionKey" -> key): Any }))
      Json.asArr(resp("Records")).map { r =>
        val m = Json.asObj(r); (Json.str(m, "ShardId"), Json.str(m, "SequenceNumber"))
      }
    }

    def shardIterator(name: String, shardId: String, iteratorType: String = "TRIM_HORIZON",
                      startingSequenceNumber: Option[String] = None): String = {
      var m = Json.obj("StreamName" -> name, "ShardId" -> shardId, "ShardIteratorType" -> iteratorType)
      startingSequenceNumber.foreach(sn => m = m.updated("StartingSequenceNumber", sn))
      Json.str(call("GetShardIterator", m), "ShardIterator")
    }

    def getRecords(iterator: String, limit: Int = 10000): GotRecords = {
      val resp = call("GetRecords", Json.obj("ShardIterator" -> iterator, "Limit" -> limit.toLong))
      val recs = Json.asArr(resp("Records")).map { r =>
        val m = Json.asObj(r)
        Record(java.util.Base64.getDecoder.decode(Json.str(m, "Data")),
          Json.str(m, "PartitionKey"), Json.str(m, "SequenceNumber"), 0L)
      }
      GotRecords(recs, Json.str(resp, "NextShardIterator"), Json.long(resp, "MillisBehindLatest"))
    }

    override def close(): Unit = aws.close()
  }

  // ----------------------------------------------------- spark operators
  /** output_kinesis.go: per-partition clients, ≤500-record PutRecords
    * batches, partition key per row. */
  def output(df: org.apache.spark.sql.DataFrame, endpoint: String, stream: String,
             keyOf: org.apache.spark.sql.Row => String,
             dataOf: org.apache.spark.sql.Row => Array[Byte]): Unit =
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.nonEmpty) {
        val c = new Client(endpoint)
        try it.grouped(500).foreach(chunk => c.putRecords(stream, chunk.map(r => (keyOf(r), dataOf(r)))))
        finally c.close()
      }
    }

  /** input_kinesis.go as a bounded catch-up read: ListShards driver-side,
    * then ONE GetRecords cursor per shard executor-side until
    * MillisBehindLatest reaches 0 — the kafka-input task shape. Returns
    * (shard_id, sequence_number, partition_key, data-utf8). */
  def input(spark: org.apache.spark.sql.SparkSession, endpoint: String, stream: String)
      : org.apache.spark.sql.Dataset[(String, String, String, String)] = {
    import spark.implicits._
    val shards = {
      val c = new Client(endpoint)
      try c.listShards(stream) finally c.close()
    }
    spark.createDataset(shards).repartition(shards.size)
      .mapPartitions { ids =>
        ids.flatMap { shardId =>
          val c = new Client(endpoint)
          try {
            val out = Vector.newBuilder[(String, String, String, String)]
            var it = c.shardIterator(stream, shardId)
            var done = false
            while (!done) {
              val got = c.getRecords(it, limit = 1000)
              got.records.foreach(r =>
                out += ((shardId, r.sequenceNumber, r.partitionKey, new String(r.data, UTF_8))))
              it = got.nextIterator
              done = got.millisBehind == 0
            }
            out.result()
          } finally c.close()
        }
      }
  }
}
