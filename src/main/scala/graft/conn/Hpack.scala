package graft.conn

import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable.ArrayBuffer

/** HPACK header compression (RFC 7541) for the HTTP/2 layer under the
  * gRPC connectors: the full static table (Appendix A), a size-managed
  * dynamic table, prefix-integer and string-literal primitives, and the
  * four representation forms (indexed, literal with incremental
  * indexing, literal without indexing, dynamic-table size update).
  * Huffman coding is an OPTIONAL encoder feature (§5.2) — this encoder
  * always emits plain octets (H=0); the decoder rejects Huffman-coded
  * strings explicitly rather than mis-reading them. Pinned against the
  * RFC's own Appendix C.3/C.5 request/response examples, including the
  * documented dynamic-table evolution and eviction states.
  */
object Hpack {

  /** RFC 7541 Appendix A — the 61-entry static table */
  val StaticTable: Vector[(String, String)] = Vector(
    ":authority" -> "", ":method" -> "GET", ":method" -> "POST", ":path" -> "/",
    ":path" -> "/index.html", ":scheme" -> "http", ":scheme" -> "https",
    ":status" -> "200", ":status" -> "204", ":status" -> "206", ":status" -> "304",
    ":status" -> "400", ":status" -> "404", ":status" -> "500",
    "accept-charset" -> "", "accept-encoding" -> "gzip, deflate", "accept-language" -> "",
    "accept-ranges" -> "", "accept" -> "", "access-control-allow-origin" -> "",
    "age" -> "", "allow" -> "", "authorization" -> "", "cache-control" -> "",
    "content-disposition" -> "", "content-encoding" -> "", "content-language" -> "",
    "content-length" -> "", "content-location" -> "", "content-range" -> "",
    "content-type" -> "", "cookie" -> "", "date" -> "", "etag" -> "", "expect" -> "",
    "expires" -> "", "from" -> "", "host" -> "", "if-match" -> "",
    "if-modified-since" -> "", "if-none-match" -> "", "if-range" -> "",
    "if-unmodified-since" -> "", "last-modified" -> "", "link" -> "", "location" -> "",
    "max-forwards" -> "", "proxy-authenticate" -> "", "proxy-authorization" -> "",
    "range" -> "", "referer" -> "", "refresh" -> "", "retry-after" -> "",
    "server" -> "", "set-cookie" -> "", "strict-transport-security" -> "",
    "transfer-encoding" -> "", "user-agent" -> "", "vary" -> "", "via" -> "",
    "www-authenticate" -> "")

  private def entrySize(name: String, value: String): Int =
    name.getBytes(UTF_8).length + value.getBytes(UTF_8).length + 32 // §4.1 overhead

  /** size-managed dynamic table (§4): newest at index 62 */
  final class DynamicTable(var maxSize: Int = 4096) {
    private val entries = ArrayBuffer[(String, String)]()
    private var curSize = 0

    def size: Int = curSize
    def count: Int = entries.size
    def entry(i: Int): (String, String) = entries(i)

    def add(name: String, value: String): Unit = {
      val sz = entrySize(name, value)
      while (curSize + sz > maxSize && entries.nonEmpty) evict()
      if (sz <= maxSize) { entries.prepend((name, value)); curSize += sz }
      // an entry larger than the table just empties it (§4.4)
    }
    private def evict(): Unit = {
      val (n, v) = entries.remove(entries.size - 1)
      curSize -= entrySize(n, v)
    }
    def resize(newMax: Int): Unit = {
      maxSize = newMax
      while (curSize > maxSize && entries.nonEmpty) evict()
    }
    /** absolute index lookup: 1..61 static, 62.. dynamic */
    def lookup(index: Int): (String, String) =
      if (index >= 1 && index <= 61) StaticTable(index - 1)
      else if (index - 62 < entries.size) entries(index - 62)
      else throw new IllegalArgumentException(s"hpack: index $index out of range")
    /** find a full (name, value) match, else a name-only match */
    def findIndex(name: String, value: String): (Option[Int], Option[Int]) = {
      var full: Option[Int] = None
      var nameOnly: Option[Int] = None
      var i = 0
      while (i < 61 && full.isEmpty) {
        val (n, v) = StaticTable(i)
        if (n == name) {
          if (v == value) full = Some(i + 1)
          else if (nameOnly.isEmpty) nameOnly = Some(i + 1)
        }
        i += 1
      }
      i = 0
      while (i < entries.size && full.isEmpty) {
        val (n, v) = entries(i)
        if (n == name) {
          if (v == value) full = Some(62 + i)
          else if (nameOnly.isEmpty) nameOnly = Some(62 + i)
        }
        i += 1
      }
      (full, nameOnly)
    }
  }

  // ----------------------------------------------------------- primitives
  /** prefix-N integer (§5.1) */
  def writeInt(out: ArrayBuffer[Byte], value: Int, prefixBits: Int, firstByteFlags: Int): Unit = {
    val max = (1 << prefixBits) - 1
    if (value < max) out += (firstByteFlags | value).toByte
    else {
      out += (firstByteFlags | max).toByte
      var v = value - max
      while (v >= 128) { out += ((v % 128) + 128).toByte; v /= 128 }
      out += v.toByte
    }
  }

  final class Reader(buf: Array[Byte]) {
    var pos = 0
    def hasNext: Boolean = pos < buf.length
    def peek: Int = buf(pos) & 0xff
    def readInt(prefixBits: Int): Int = {
      val max = (1 << prefixBits) - 1
      var v = buf(pos) & max; pos += 1
      if (v == max) {
        var m = 0
        var b = 0
        do {
          b = buf(pos) & 0xff; pos += 1
          v += (b & 0x7f) << m; m += 7
        } while ((b & 0x80) != 0)
      }
      v
    }
    def readString(): String = {
      val huffman = (peek & 0x80) != 0
      val len = readInt(7)
      require(!huffman, "hpack: Huffman-coded string (this decoder emits and accepts plain octets)")
      val s = new String(buf, pos, len, UTF_8); pos += len; s
    }
  }

  // ------------------------------------------------------------ encoding
  /** encode a header list against `table` (plain octets, no Huffman);
    * sensitive headers can be forced to never-indexed form */
  def encode(table: DynamicTable, headers: Seq[(String, String)],
             neverIndex: Set[String] = Set.empty): Array[Byte] = {
    val out = ArrayBuffer[Byte]()
    def literal(s: String): Unit = {
      val b = s.getBytes(UTF_8)
      writeInt(out, b.length, 7, 0x00)
      out ++= b
    }
    headers.foreach { case (name, value) =>
      if (neverIndex.contains(name)) { // §6.2.3 literal never indexed
        val (_, nameIdx) = table.findIndex(name, value)
        nameIdx match {
          case Some(i) => writeInt(out, i, 4, 0x10)
          case None => writeInt(out, 0, 4, 0x10); literal(name)
        }
        literal(value)
      } else table.findIndex(name, value) match {
        case (Some(full), _) => writeInt(out, full, 7, 0x80) // §6.1 indexed
        case (None, Some(nameIdx)) => // §6.2.1 literal w/ incremental indexing
          writeInt(out, nameIdx, 6, 0x40); literal(value)
          table.add(name, value)
        case (None, None) =>
          writeInt(out, 0, 6, 0x40); literal(name); literal(value)
          table.add(name, value)
      }
    }
    out.toArray
  }

  // ------------------------------------------------------------ decoding
  def decode(table: DynamicTable, block: Array[Byte]): Seq[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    val r = new Reader(block)
    while (r.hasNext) {
      val b = r.peek
      if ((b & 0x80) != 0) { // indexed
        out += table.lookup(r.readInt(7))
      } else if ((b & 0xc0) == 0x40) { // literal, incremental indexing
        val idx = r.readInt(6)
        val name = if (idx == 0) r.readString() else table.lookup(idx)._1
        val value = r.readString()
        table.add(name, value)
        out += (name -> value)
      } else if ((b & 0xe0) == 0x20) { // dynamic table size update
        table.resize(r.readInt(5))
      } else { // literal without indexing (0x00) or never indexed (0x10)
        val idx = r.readInt(4)
        val name = if (idx == 0) r.readString() else table.lookup(idx)._1
        out += (name -> r.readString())
      }
    }
    out.result()
  }
}
