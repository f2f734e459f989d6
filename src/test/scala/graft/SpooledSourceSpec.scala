package graft

import graft.operators.SpooledSource
import graft.operators.SpooledSource.SpoolMsg

/** Spool-then-scan contract: bounded chunks, commit strictly after the
  * chunk is durable (crash between the two redelivers, never loses),
  * resume continues chunk numbering, and the read side is an ordinary
  * distributed parquet scan. */
class SpooledSourceSpec extends SparkSpec {

  /** a lease-style queue: fetched messages go invisible until
    * committed; uncommitted ones come back on the next drain */
  private final class FakeQueue(n: Int) {
    val all: scala.collection.mutable.LinkedHashMap[Int, String] =
      scala.collection.mutable.LinkedHashMap((0 until n).map(i => i -> s"m$i"): _*)
    private val leased = scala.collection.mutable.Set[Int]()
    var commits = 0
    def fetch(max: Int): Seq[(Int, String)] = {
      val batch = all.iterator.filterNot(kv => leased(kv._1)).take(max).toVector
      batch.foreach(kv => leased += kv._1)
      batch
    }
    def commit(ids: Seq[Int]): Unit = { commits += 1; ids.foreach { i => all.remove(i); leased -= i } }
    def releaseLeases(): Unit = leased.clear() // visibility timeout expiry
  }

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("spool-spec").toString

  test("drains into bounded chunks; scan returns every message exactly once") {
    val q = new FakeQueue(250)
    val dir = tmp()
    val df = SpooledSource.run(spark, dir, chunkRows = 100)(() => q.fetch(10))(
      kv => SpoolMsg(kv._2, Map("id" -> kv._1.toString)))(batch => q.commit(batch.map(_._1)))
    assert(df.count() == 250 && q.all.isEmpty)
    val chunks = new java.io.File(dir).list().count(_.startsWith("chunk-"))
    assert(chunks == 3, s"250 rows at 100/chunk -> 3 chunks, got $chunks")
    val ids = df.selectExpr("attributes['id']").collect().map(_.getString(0).toInt).sorted
    assert(ids.toVector == (0 until 250).toVector, "exactly once when nothing crashes")
    // the cursor checkpoint recorded every chunk
    val cursor = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_cursor.jsonl")), "UTF-8").trim.split('\n')
    assert(cursor.length == 3 && cursor.head.contains("\"chunk\":0"))
  }

  test("a crash between durable-flush and commit redelivers (at-least-once, never lost)") {
    val q = new FakeQueue(60)
    val dir = tmp()
    // commit throws on the second chunk: its messages stay leased at the
    // source even though the chunk parquet already landed
    var chunkCommits = 0
    val crashed = intercept[RuntimeException] {
      SpooledSource.run(spark, dir, chunkRows = 25)(() => q.fetch(10))(
        kv => SpoolMsg(kv._2, Map("id" -> kv._1.toString))) { batch =>
        chunkCommits += 1
        if (chunkCommits == 2) throw new RuntimeException("crash before ack")
        q.commit(batch.map(_._1))
      }
    }
    assert(crashed.getMessage == "crash before ack")
    val spooledSoFar = SpooledSource.scan(spark, dir).count()
    // fetch(10) crosses the 25-row threshold at 30: chunks are 30 rows
    assert(spooledSoFar == 60, "both chunks durable, including the uncommitted one")
    assert(q.all.size == 30, "only chunk 1's messages were acked at the source")
    // visibility timeout expires; the resumed drain picks the backlog up
    q.releaseLeases()
    val df = SpooledSource.run(spark, dir, chunkRows = 25)(() => q.fetch(10))(
      kv => SpoolMsg(kv._2, Map("id" -> kv._1.toString)))(batch => q.commit(batch.map(_._1)))
    assert(q.all.isEmpty, "resume drained the rest")
    val ids = df.selectExpr("attributes['id']").collect().map(_.getString(0).toInt).toVector
    assert(ids.toSet == (0 until 60).toSet, "nothing lost")
    assert(ids.size > 60, "chunk 2's messages appear twice — the at-least-once surface")
    assert(ids.size == 60 + 30, "exactly the crashed chunk redelivered")
    // resumed run CONTINUED the chunk numbering after the kept chunks
    val names = new java.io.File(dir).list().filter(_.startsWith("chunk-")).sorted
    assert(names.toSeq == Seq("chunk-00000", "chunk-00001", "chunk-00002"),
      "resume kept chunks 0-1 and appended the redelivered backlog as chunk 2")
  }
}
