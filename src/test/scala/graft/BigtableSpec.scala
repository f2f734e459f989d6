package graft

import graft.conn.Bigtable
import org.scalatest.funsuite.AnyFunSuite

/** gcp_bigtable output contract (output_bigtable.go:26-287): PingAndWarm
  * on connect, SetCell mutations batched through MutateRows, per-entry
  * status rows for partial failures, ms-truncated timestamps. */
class BigtableSpec extends AnyFunSuite {

  test("pingAndWarm + mutateRows bulk write lands cells; timestamps truncate to ms") {
    val srv = new Bigtable.MiniBigtable().start()
    try {
      val c = new Bigtable.Client("127.0.0.1", srv.port)
      try {
        c.pingAndWarm("p1", "inst1")
        assert(srv.pings == 1)
        val table = "projects/p1/instances/inst1/tables/t1"
        val failed = c.mutateRows(table, Seq(
          Bigtable.Entry("row-b", Seq(("cf1", "payload", 1700000000123456L, "vb".getBytes))),
          Bigtable.Entry("row-a", Seq(
            ("cf1", "payload", 1700000000123456L, "va".getBytes),
            ("cf2", "aux", 1700000000999999L, "aux-a".getBytes)))))
        assert(failed.isEmpty)
        val cells = srv.cells(table)
        assert(cells.map(_.rowKey) == Seq("row-a", "row-a", "row-b"), "row-major sorted")
        val pay = cells.find(c => c.rowKey == "row-a" && c.family == "cf1").get
        assert(new String(pay.value) == "va")
        assert(pay.timestampMicros == 1700000000123000L, "truncated to millisecond granularity")
        assert(cells.find(_.family == "cf2").get.timestampMicros == 1700000000999000L)
      } finally c.close()
    } finally srv.stop()
  }

  test("latest timestamp wins per column; empty row key fails its entry only") {
    val srv = new Bigtable.MiniBigtable().start()
    try {
      val c = new Bigtable.Client("127.0.0.1", srv.port)
      try {
        val table = "projects/p/instances/i/tables/t"
        assert(c.mutateRows(table, Seq(
          Bigtable.Entry("r1", Seq(("cf", "q", 1000000L, "old".getBytes))))).isEmpty)
        // partial failure: empty row key is rejected per-entry (google.rpc
        // status code 3 INVALID_ARGUMENT), the valid entry still lands
        val failed = c.mutateRows(table, Seq(
          Bigtable.Entry("", Seq(("cf", "q", 2000000L, "bad".getBytes))),
          Bigtable.Entry("r1", Seq(("cf", "q", 2000000L, "new".getBytes)))))
        assert(failed == Seq((0L, 3L)))
        val cells = srv.cells(table)
        assert(cells.size == 1)
        assert(new String(cells.head.value) == "new", "latest ts read back")
      } finally c.close()
    } finally srv.stop()
  }

  test("many entries stream back across multiple response messages") {
    val srv = new Bigtable.MiniBigtable().start()
    try {
      val c = new Bigtable.Client("127.0.0.1", srv.port)
      try {
        val table = "projects/p/instances/i/tables/big"
        val entries = (1 to 257).map(i =>
          Bigtable.Entry(f"row-$i%05d", Seq(("cf", "n", i * 1000L, i.toString.getBytes))))
        assert(c.mutateRows(table, entries).isEmpty)
        assert(srv.cells(table).size == 257)
      } finally c.close()
    } finally srv.stop()
  }
}
