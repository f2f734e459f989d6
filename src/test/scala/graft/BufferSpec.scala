package graft

import graft.operators.Buffers
import org.apache.spark.sql.functions._

/** Derby-backed FIFO buffer (operators/Buffers.scala — the reference's
  * sqlite buffer lifecycle, buffer_sqlite.go:25): ordered drain,
  * at-least-once replay without ack, delete-on-ack. */
class BufferSpec extends SparkSpec {
  import spark.implicits._

  private def freshUrl(): String = {
    val dir = java.nio.file.Files.createTempDirectory("bufspec")
    System.setProperty("derby.stream.error.file", dir.resolve("derby.log").toString)
    s"jdbc:derby:${dir.resolve("db")};create=true"
  }

  test("append -> drain returns every message; re-drain without ack replays (at-least-once)") {
    val url = freshUrl()
    Buffers.create(url)
    Buffers.create(url) // idempotent
    val msgs = (1 to 10).map(i => s"""{"k":$i}""").toDF("content")
    Buffers.append(msgs, "content", url)
    val first = Buffers.drain(spark, url).select("content").as[String].collect().toSeq
    assert(first.size == 10)
    assert(first.map(s => s.stripPrefix("""{"k":""").stripSuffix("}").toInt).sorted == (1 to 10))
    // no ack → the buffer must replay identically
    val again = Buffers.drain(spark, url).select("content").as[String].collect().toSeq
    assert(again == first, "un-acked drain must replay the same messages")
  }

  test("ack deletes through the sequence point; the remainder drains in order") {
    val url = freshUrl()
    Buffers.create(url)
    Buffers.append((1 to 8).map(i => s"m$i").toDF("content"), "content", url)
    val seqs = Buffers.drain(spark, url).select("seq").as[Long].collect().toSeq
    assert(seqs == seqs.sorted, "drain must be sequence-ordered")
    val cut = seqs(4) // ack the first five
    assert(Buffers.ack(url, cut) == 5)
    val rest = Buffers.drain(spark, url).select("seq").as[Long].collect().toSeq
    assert(rest == seqs.drop(5), "ack must remove exactly the consumed prefix")
    // full ack empties the buffer
    Buffers.ack(url, seqs.last)
    assert(Buffers.drain(spark, url).count() == 0)
  }
}
