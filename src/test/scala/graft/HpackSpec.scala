package graft

import graft.conn.Hpack
import org.scalatest.funsuite.AnyFunSuite

/** HPACK pinned against RFC 7541's own Appendix C examples (the
  * plain-octet request series C.2.1 and C.3.1-C.3.3, byte-exact in BOTH
  * directions) plus table-management properties the appendix documents:
  * dynamic-table sizes after each block, eviction, resize updates. */
class HpackSpec extends AnyFunSuite {
  private def hex(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("C.2.1: literal with incremental indexing, new name") {
    val enc = new Hpack.DynamicTable()
    val out = Hpack.encode(enc, Seq("custom-key" -> "custom-header"))
    assert(out.toSeq == hex("400a 6375 7374 6f6d 2d6b 6579 0d63 7573 746f 6d2d 6865 6164 6572").toSeq)
    val dec = new Hpack.DynamicTable()
    assert(Hpack.decode(dec, out) == Seq("custom-key" -> "custom-header"))
    assert(dec.size == 55, "the RFC's documented table size after C.2.1")
  }

  test("C.3: the three-request series is byte-exact both ways with the documented table states") {
    val enc = new Hpack.DynamicTable()
    val dec = new Hpack.DynamicTable()

    // C.3.1
    val r1 = Hpack.encode(enc, Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com"))
    assert(r1.toSeq == hex("8286 8441 0f77 7777 2e65 7861 6d70 6c65 2e63 6f6d").toSeq)
    assert(Hpack.decode(dec, r1) == Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com"))
    assert(enc.size == 57 && dec.size == 57)

    // C.3.2 — :authority now hits the dynamic table (0xbe)
    val r2 = Hpack.encode(enc, Seq(":method" -> "GET", ":scheme" -> "http",
      ":path" -> "/", ":authority" -> "www.example.com", "cache-control" -> "no-cache"))
    assert(r2.toSeq == hex("8286 84be 5808 6e6f 2d63 6163 6865").toSeq)
    assert(Hpack.decode(dec, r2).last == ("cache-control" -> "no-cache"))
    assert(enc.size == 110 && dec.size == 110)

    // C.3.3 — https + /index.html from static, :authority at 63, new custom pair
    val r3 = Hpack.encode(enc, Seq(":method" -> "GET", ":scheme" -> "https",
      ":path" -> "/index.html", ":authority" -> "www.example.com",
      "custom-key" -> "custom-value"))
    assert(r3.toSeq == hex(
      "8287 85bf 400a 6375 7374 6f6d 2d6b 6579 0c63 7573 746f 6d2d 7661 6c75 65").toSeq)
    assert(Hpack.decode(dec, r3) == Seq(":method" -> "GET", ":scheme" -> "https",
      ":path" -> "/index.html", ":authority" -> "www.example.com",
      "custom-key" -> "custom-value"))
    assert(enc.size == 164 && dec.size == 164 && dec.count == 3)
  }

  test("prefix integers: the RFC's 1337-in-5-bits example and boundary values") {
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    Hpack.writeInt(out, 1337, 5, 0x00)
    assert(out.toSeq == hex("1f9a 0a").toSeq, "C.1.2: 1337 with a 5-bit prefix")
    assert(new Hpack.Reader(out.toArray).readInt(5) == 1337)
    val small = scala.collection.mutable.ArrayBuffer[Byte]()
    Hpack.writeInt(small, 10, 5, 0x00)
    assert(small.toSeq == Seq(0x0a.toByte), "C.1.1: 10 fits the prefix")
  }

  test("eviction: a small table drops oldest entries; oversized entries empty it") {
    val t = new Hpack.DynamicTable(maxSize = 120)
    t.add("a", "1"); t.add("b", "2"); t.add("c", "3")
    assert(t.count == 3 && t.size == 102)
    t.add("d", "4444444444444444") // 49 bytes → evicts oldest
    assert(t.count == 3 && t.lookup(64)._1 == "b", "oldest (a) evicted")
    t.add("huge", "x" * 200) // larger than the table: empties it (§4.4)
    assert(t.count == 0 && t.size == 0)
  }

  test("dynamic table size update opcode resizes the decoder table") {
    val enc = new Hpack.DynamicTable()
    val dec = new Hpack.DynamicTable()
    val block = Hpack.encode(enc, Seq("x-a" -> "1", "x-b" -> "2"))
    Hpack.decode(dec, block)
    assert(dec.count == 2)
    // a size-update prefix evicts down before the next header
    val update = scala.collection.mutable.ArrayBuffer[Byte]()
    Hpack.writeInt(update, 40, 5, 0x20)
    Hpack.decode(dec, update.toArray)
    assert(dec.count == 1 && dec.maxSize == 40, "resize evicted to fit")
  }

  test("never-indexed form for sensitive headers; Huffman strings rejected loudly") {
    val enc = new Hpack.DynamicTable()
    val block = Hpack.encode(enc, Seq("authorization" -> "secret"),
      neverIndex = Set("authorization"))
    assert((block(0) & 0xf0) == 0x10, "0x10 never-indexed prefix")
    assert(enc.count == 0, "sensitive header never enters the table")
    val dec = new Hpack.DynamicTable()
    assert(Hpack.decode(dec, block) == Seq("authorization" -> "secret"))
    val e = intercept[IllegalArgumentException] {
      Hpack.decode(new Hpack.DynamicTable(), hex("8241 8cf1 e3c2 e5f2 3a6b a0ab 90f4 ff"))
    }
    assert(e.getMessage.contains("Huffman"))
  }
}
