package graft

import graft.conn.BigQueryWrite
import graft.conn.BigQueryWrite.{Field, FieldType}
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.VectorMap

/** gcp_bigquery_write_api contract (output_bigquery_storage.go:29-365):
  * GetWriteStream schema discovery, JSON→proto row adaptation, bidi
  * AppendRows with writer_schema on the first request, DefaultStream
  * offsets, schema-mismatch rejection. */
class BigQueryWriteSpec extends AnyFunSuite {

  private val fields = Seq(
    Field("event_id", FieldType.Int64, required = true),
    Field("event_type", FieldType.String),
    Field("value", FieldType.Double),
    Field("flag", FieldType.Bool))

  test("schema discovery + streamed appends land typed rows; offsets track the default stream") {
    val table = "projects/p/datasets/d/tables/events"
    val srv = new BigQueryWrite.MiniBqStorage(Map(table -> fields)).start()
    try {
      val c = new BigQueryWrite.Client("127.0.0.1", srv.port)
      try {
        val got = c.getWriteStream(table)
        assert(got == fields)
        val rows = (1 to 5).map(i =>
          s"""{"event_id":$i,"event_type":"t$i","value":${i * 1.5},"flag":${i % 2 == 0}}""")
        val offsets = c.appendJsonRows(table, got, rows.iterator, batchRows = 2)
        assert(offsets == Seq(0L, 2L, 4L), "per-batch AppendResult offsets")
        val stored = srv.rows(table)
        assert(stored.size == 5)
        assert(stored(2) == VectorMap[String, Any](
          "event_id" -> 3L, "event_type" -> "t3", "value" -> 4.5, "flag" -> false))
      } finally c.close()
    } finally srv.stop()
  }

  test("a second stream appends after the first; offsets continue") {
    val table = "projects/p/datasets/d/tables/t2"
    val srv = new BigQueryWrite.MiniBqStorage(Map(table -> fields)).start()
    try {
      val c1 = new BigQueryWrite.Client("127.0.0.1", srv.port)
      try assert(c1.appendJsonRows(table, fields,
        Iterator("""{"event_id":1,"event_type":"a","value":0.5,"flag":true}""")) == Seq(0L))
      finally c1.close()
      val c2 = new BigQueryWrite.Client("127.0.0.1", srv.port)
      try assert(c2.appendJsonRows(table, fields,
        Iterator("""{"event_id":2,"event_type":"b","value":1.5,"flag":false}""")) == Seq(1L))
      finally c2.close()
      assert(srv.rows(table).map(_("event_id")) == Seq(1L, 2L))
    } finally srv.stop()
  }

  test("writer_schema mismatching the table schema is rejected") {
    val table = "projects/p/datasets/d/tables/t3"
    val srv = new BigQueryWrite.MiniBqStorage(Map(table -> fields)).start()
    try {
      val c = new BigQueryWrite.Client("127.0.0.1", srv.port)
      try {
        val wrong = Seq(Field("not_a_column", FieldType.String))
        val e = intercept[Exception](c.appendJsonRows(table, wrong,
          Iterator("""{"not_a_column":"x"}""")))
        assert(e.getMessage.contains("writer_schema") || e.getMessage.contains("fields"))
      } finally c.close()
    } finally srv.stop()
  }

  test("unknown JSON field errors client-side like protojson.Unmarshal") {
    val rowReg = BigQueryWrite.rowRegistry(fields)
    val e = intercept[IllegalArgumentException](
      BigQueryWrite.encodeRow(rowReg, """{"event_id":1,"nope":"x"}"""))
    assert(e.getMessage.contains("unknown field"))
  }
}
