package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Aws.Json

/** NATS object store (internal/impl/nats/{input,output,processor}_os.go
  * — the reference wraps nats.go's ObjectStore API), layered the way the
  * real client layers it: bucket `B` IS the stream `OBJ_B` capturing two
  * subject spaces —
  *
  *  - `$O.B.C.<nuid>` — the object's data, split into chunks of
  *    `chunk_size` bytes, one message per chunk;
  *  - `$O.B.M.<name>` — the object-info record (name, nuid, size,
  *    chunks) as JSON, published with `Nats-Rollup: sub` so the subject
  *    always holds exactly the newest info (an overwrite re-chunks under
  *    a fresh nuid and rolls the meta record up).
  *
  * Get = direct-get the meta record, then drain a `filter_subject`
  * consumer over the chunk subject and concatenate. Delete = purge the
  * chunk subject and roll a `{"deleted":true}` info record up. All of
  * it rides [[Nats]] + [[JetStream]]; no new wire machinery.
  */
object NatsObj {

  final case class ObjectInfo(name: String, nuid: String, size: Long, chunks: Long,
                              deleted: Boolean)

  private def streamOf(bucket: String) = s"OBJ_$bucket"
  private def chunkSubj(bucket: String, nuid: String) = s"$$O.$bucket.C.$nuid"
  /** object names may contain characters illegal in subjects (spaces,
    * dots-as-tokens) — the real client keys the info record by the
    * URL-safe unpadded base64 of the name, and so do we */
  private def metaSubj(bucket: String, name: String) =
    s"$$O.$bucket.M.${java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(name.getBytes(UTF_8))}"

  final class ObjClient(url: String, bucket: String,
                        chunkSize: Int = 128 * 1024) extends AutoCloseable {
    private val js = new JetStream.JsClient(url)
    private val seq = new java.util.concurrent.atomic.AtomicLong(0)

    def createBucket(): this.type = {
      js.addStream(streamOf(bucket), Seq(s"$$O.$bucket.C.>", s"$$O.$bucket.M.>"))
      this
    }

    /** store (or overwrite) an object: chunks under a fresh nuid, then
      * the rolled-up info record; an overwrite purges the superseded
      * nuid's chunks (nats.go Put deletes the old object's data) */
    def put(name: String, data: Array[Byte]): ObjectInfo = {
      val prev = info(name).filter(!_.deleted)
      val nuid = java.util.UUID.randomUUID().toString.replace("-", "").take(22)
      val chunks = if (data.isEmpty) 0L else ((data.length + chunkSize - 1) / chunkSize).toLong
      var off = 0
      while (off < data.length) {
        val n = math.min(chunkSize, data.length - off)
        js.publish(chunkSubj(bucket, nuid), java.util.Arrays.copyOfRange(data, off, off + n))
        off += n
      }
      val infoJson = Json.obj("name" -> name, "nuid" -> nuid,
        "size" -> data.length.toLong, "chunks" -> chunks, "deleted" -> false)
      js.publishH(metaSubj(bucket, name), Json.render(infoJson).getBytes(UTF_8),
        Map("Nats-Rollup" -> "sub"))
      prev.foreach(p => js.publishH(chunkSubj(bucket, p.nuid), Array.emptyByteArray,
        Map("Nats-Rollup" -> "sub", "KV-Operation" -> "PURGE")))
      ObjectInfo(name, nuid, data.length.toLong, chunks, deleted = false)
    }

    /** the newest info record, including delete tombstones */
    def info(name: String): Option[ObjectInfo] =
      js.msgGet(streamOf(bucket), lastBySubj = metaSubj(bucket, name)).map { m =>
        val j = Json.asObj(Json.parse(new String(m.payload, UTF_8)))
        ObjectInfo(Json.str(j, "name"), Json.str(j, "nuid"), Json.long(j, "size"),
          Json.long(j, "chunks"), j.get("deleted").contains(true))
      }

    /** read an object back by draining its chunk subject in order */
    def get(name: String, maxWaitMs: Int = 2000): Option[Array[Byte]] =
      info(name).filter(!_.deleted).map { inf =>
        if (inf.chunks == 0L) Array.emptyByteArray
        else {
          val durable = s"osr-${seq.incrementAndGet()}"
          js.addDurable(streamOf(bucket), durable,
            filterSubject = chunkSubj(bucket, inf.nuid))
          val buf = new java.io.ByteArrayOutputStream(inf.size.toInt)
          var got = 0L
          while (got < inf.chunks) {
            val batch = js.fetch(streamOf(bucket), durable, batch = 64, maxWaitMs = maxWaitMs)
            require(batch.nonEmpty, s"object $name truncated at chunk $got/${inf.chunks}")
            batch.foreach { m => buf.write(m.payload); js.ack(m) }
            got += batch.size
          }
          require(buf.size() == inf.size, s"object $name size ${buf.size()} != ${inf.size}")
          buf.toByteArray
        }
      }

    /** delete: purge the chunks, roll a deleted info record up */
    def delete(name: String): Unit = info(name).filter(!_.deleted).foreach { inf =>
      js.publishH(chunkSubj(bucket, inf.nuid), Array.emptyByteArray,
        Map("Nats-Rollup" -> "sub", "KV-Operation" -> "PURGE"))
      val tomb = Json.obj("name" -> name, "nuid" -> inf.nuid,
        "size" -> 0L, "chunks" -> 0L, "deleted" -> true)
      js.publishH(metaSubj(bucket, name), Json.render(tomb).getBytes(UTF_8),
        Map("Nats-Rollup" -> "sub"))
    }

    /** names of the live objects (a drain over the meta subject space) */
    def list(maxWaitMs: Int = 500): Vector[String] = {
      val durable = s"osl-${seq.incrementAndGet()}"
      js.addDurable(streamOf(bucket), durable,
        filterSubject = s"$$O.$bucket.M.>", deliverPolicy = "last_per_subject")
      val names = Vector.newBuilder[String]
      var batch = js.fetch(streamOf(bucket), durable, batch = 64, maxWaitMs = maxWaitMs)
      while (batch.nonEmpty) {
        batch.foreach { m =>
          val j = Json.asObj(Json.parse(new String(m.payload, UTF_8)))
          if (!j.get("deleted").contains(true)) names += Json.str(j, "name")
          js.ack(m)
        }
        batch = js.fetch(streamOf(bucket), durable, batch = 64, maxWaitMs = maxWaitMs)
      }
      names.result().sorted
    }

    override def close(): Unit = js.close()
  }
}
