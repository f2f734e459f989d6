package graft

import graft.conn.S3
import org.apache.spark.sql.functions._

/** aws_s3_stream contract (output_s3_stream.go + _writer.go): buffered
  * multipart streaming with count/byte flush gates, part boundaries on
  * message boundaries, last-part remainder on close, empty-writer
  * abort, and the partitioned executor-side output operator. */
class S3StreamSpec extends SparkSpec {

  private def msg(i: Int, len: Int): Array[Byte] = {
    val s = f"m$i%03d-" + ("x" * (len - 6)) + "\n"
    s.getBytes("UTF-8")
  }

  test("count gate: maxBufferCount=3 over 10 messages gives 4 parts, boundaries on messages") {
    val srv = new S3.MiniS3().start()
    try {
      val c = new S3.Client(srv.endpoint)
      try {
        val w = new S3.StreamingWriter(c, "b", "k.log", maxBufferCount = 3, minPartBytes = 0)
        val msgs = (1 to 10).map(msg(_, 20))
        msgs.foreach(w.writeBytes)
        w.close()
        assert(w.partsUploaded == 4, "3+3+3+1")
        assert(w.totalMessages == 10 && w.totalBytes == 200)
        val obj = c.get("b", "k.log").get
        assert(obj.bytes.sameElements(msgs.foldLeft(Array.emptyByteArray)(_ ++ _)))
        // every part boundary is a multiple of the 20-byte message size
        val sizes = srv.completedPartSizes(("b", "k.log"))
        assert(sizes == Seq(60, 60, 60, 20))
      } finally c.close()
    } finally srv.stop()
  }

  test("byte gate flushes at maxBufferBytes BETWEEN messages; close flushes the remainder") {
    val srv = new S3.MiniS3().start()
    try {
      val c = new S3.Client(srv.endpoint)
      try {
        val w = new S3.StreamingWriter(c, "b", "bytes.log",
          maxBufferBytes = 250, minPartBytes = 0)
        (1 to 7).foreach(i => w.writeBytes(msg(i, 100)))
        w.close()
        // flush fires once the buffer REACHES 250 after a whole message:
        // 100, 200, 300→part; repeat; 7th message remains for close
        val sizes = srv.completedPartSizes(("b", "bytes.log"))
        assert(sizes == Seq(300, 300, 100), "no message ever splits across parts")
        assert(c.get("b", "bytes.log").get.bytes.length == 700)
      } finally c.close()
    } finally srv.stop()
  }

  test("sub-minimum buffers defer to close (the 5MiB rule); empty writer aborts") {
    val srv = new S3.MiniS3().start()
    try {
      val c = new S3.Client(srv.endpoint)
      try {
        // minPartBytes larger than maxBufferBytes: the size gate never
        // fires, everything lands as ONE final part on close
        val w = new S3.StreamingWriter(c, "b", "small.log",
          maxBufferBytes = 100, minPartBytes = 1000000)
        (1 to 5).foreach(i => w.writeBytes(msg(i, 100)))
        w.close()
        assert(w.partsUploaded == 1)
        assert(srv.completedPartSizes(("b", "small.log")) == Seq(500))

        val empty = new S3.StreamingWriter(c, "b", "never.log")
        empty.close()
        assert(c.get("b", "never.log").isEmpty, "no empty object completed")
        assert(srv.pendingUploads == 0, "aborted, not leaked")
      } finally c.close()
    } finally srv.stop()
  }

  test("close() failing at CompleteMultipartUpload leaves the upload abortable by abort()") {
    val srv = new S3.MiniS3().start()
    try {
      val c = new S3.Client(srv.endpoint)
      try {
        val w = new S3.StreamingWriter(c, "b", "flaky.log",
          maxBufferCount = 1, minPartBytes = 0)
        w.writeBytes(msg(1, 20))
        assert(w.partsUploaded == 1 && srv.pendingUploads == 1)
        srv.failNextComplete = true
        intercept[IllegalArgumentException](w.close())
        assert(srv.pendingUploads == 1, "complete failed; upload still pending")
        // the error path: abort() must key on SETTLED (complete/abort
        // succeeded), not on closed — else this upload leaks forever
        w.abort()
        assert(srv.pendingUploads == 0, "abort() cleaned up the failed close")
        assert(c.get("b", "flaky.log").isEmpty, "nothing completed")
      } finally c.close()
    } finally srv.stop()
  }

  test("streamOutput: repartition routes each partition value to one upload, parts from executors") {
    val srv = new S3.MiniS3().start()
    try {
      val df = spark.read.parquet(s"$sf/nation.parquet")
        .select(col("n_nationkey").cast("long"), col("n_regionkey").cast("long"), col("n_name"))
      S3.streamOutput(df, srv.endpoint, "lake",
        partitionExpr = col("n_regionkey"),
        partitionKeyOf = r => r.getLong(1).toString,
        pathOf = r => s"nations/region=${r.getLong(1)}.csv",
        bodyOf = r => s"${r.getLong(0)},${r.getString(2)}\n".getBytes("UTF-8"),
        maxBufferCount = 2, minPartBytes = 0)
      val c = new S3.Client(srv.endpoint)
      try {
        val objs = c.list("lake", "nations/")
        assert(objs.size == 5, "one object per region")
        val all = objs.flatMap(o => new String(c.get("lake", o.key).get.bytes, "UTF-8")
          .split("\n").filter(_.nonEmpty))
        assert(all.size == 25, "every nation exactly once")
        // multi-part objects: 5-6 nations per region with count=2 → ≥3 parts
        val parts = srv.completedPartSizes(("lake", objs.head.key))
        assert(parts.size >= 3)
      } finally c.close()
    } finally srv.stop()
  }
}
