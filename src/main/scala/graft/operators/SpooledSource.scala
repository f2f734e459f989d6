package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spool-then-scan for queue-shaped sources.
  *
  * Queue protocols (SQS, Pub/Sub, Azure Queue, JetStream durables, CDC
  * feeds, etcd watches) hand out ONE cursor with per-message lease
  * state — the reference consumes them single-process
  * (impl/aws/input_sqs.go and friends), and so must any client. The
  * scale path documented in PLANS.md is therefore spool-then-scan: the
  * single cursor drains into bounded parquet chunks, each chunk is made
  * DURABLE before its messages are committed (deleted/acked) at the
  * source, and everything downstream is an ordinary distributed
  * partitioned scan. This operator makes that path executable:
  *
  *  - `fetch()` is one bounded receive on the cursor;
  *  - a chunk is flushed whenever `chunkRows` accumulate or the source
  *    idles; the chunk parquet lands first, then a cursor-checkpoint
  *    line is appended to `_cursor.jsonl`, and ONLY THEN is `commit`
  *    called on the chunk's messages. A crash between flush and commit
  *    redelivers — at-least-once, never lost;
  *  - a re-run over the same `spoolDir` RESUMES: existing chunks are
  *    kept, numbering continues, and the re-drained backlog (whatever
  *    the source redelivers) lands in new chunks;
  *  - the returned DataFrame is `spark.read.parquet` over the chunk
  *    directories — fully distributed, with the spool schema
  *    (body STRING, attributes MAP, receive_count BIGINT).
  *
  * At 100 TB the spool is object storage and the scan is the same
  * partitioned read; nothing in the drain loop holds more than one
  * chunk in memory.
  */
object SpooledSource {

  final case class SpoolMsg(body: String, attributes: Map[String, String] = Map.empty,
                            receive_count: Long = 1L)

  private def existingChunks(dir: java.io.File): Int =
    Option(dir.list()).map(_.count(_.startsWith("chunk-"))).getOrElse(0)

  /** Drain the cursor into `spoolDir` and return the distributed scan.
    *
    * @param fetch      one bounded receive (empty = source idle)
    * @param toMsg      project a source message to the spool schema
    * @param commit     delete/ack messages — called per flushed chunk,
    *                   strictly AFTER that chunk is durable
    * @param idleFetches consecutive empty receives that end the drain
    */
  def run[A](spark: SparkSession, spoolDir: String, chunkRows: Int = 5000,
             idleFetches: Int = 1)(fetch: () => Seq[A])(toMsg: A => SpoolMsg)(
             commit: Seq[A] => Unit): DataFrame = {
    import spark.implicits._
    val dir = new java.io.File(spoolDir)
    dir.mkdirs()
    var chunkIdx = existingChunks(dir) // resume: keep what's spooled
    val pending = scala.collection.mutable.ArrayBuffer[A]()

    def flush(): Unit = if (pending.nonEmpty) {
      val batch = pending.toVector
      pending.clear()
      val path = f"$spoolDir/chunk-$chunkIdx%05d"
      // durable first: parquet chunk, then the cursor checkpoint line —
      // only a fully-recorded chunk ever acks its messages
      spark.createDataset(batch.map(toMsg)).repartition(1)
        .write.mode("overwrite").parquet(path)
      val line = s"""{"chunk":$chunkIdx,"rows":${batch.size}}""" + "\n"
      java.nio.file.Files.write(java.nio.file.Paths.get(spoolDir, "_cursor.jsonl"),
        line.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
      commit(batch)
      chunkIdx += 1
    }

    var idle = 0
    while (idle < idleFetches) {
      val batch = fetch()
      if (batch.isEmpty) { flush(); idle += 1 }
      else {
        idle = 0
        pending ++= batch
        if (pending.size >= chunkRows) flush()
      }
    }
    flush()
    scan(spark, spoolDir)
  }

  /** the distributed read over an existing spool (no drain) */
  def scan(spark: SparkSession, spoolDir: String): DataFrame = {
    val dir = new java.io.File(spoolDir)
    require(existingChunks(dir) > 0, s"empty spool at $spoolDir")
    spark.read.parquet(s"$spoolDir/chunk-*")
  }
}
