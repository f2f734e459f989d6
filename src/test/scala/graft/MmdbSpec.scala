package graft

import graft.functions.Mmdb
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.VectorMap

/** MaxMind DB binary format reader/writer (functions/Mmdb.scala) —
  * spec-conformance against the PUBLIC format description 2.0. */
class MmdbSpec extends AnyFunSuite {

  private def buildReader(recordSize: Int): Mmdb.Reader = {
    val w = new Mmdb.Writer(ipVersion = 4, recordSize = recordSize)
    w.insert("10.0.0.0/9", Map("name" -> "alpha", "n" -> 1L))
    w.insert("10.42.0.0/16", Map("name" -> "gamma", "n" -> 3L))
    w.insert("10.128.0.0/9", Map("name" -> "beta", "n" -> 2L))
    w.insert("192.168.0.0/16", Map("name" -> "alpha", "n" -> 1L)) // dedupe → pointer
    new Mmdb.Reader(w.build())
  }

  private def nameOf(v: Any): String =
    v.asInstanceOf[VectorMap[String, Any]]("name").asInstanceOf[String]

  for (rs <- Seq(24, 28, 32))
    test(s"record_size=$rs: longest-prefix lookup, nesting, miss, pointer dedupe") {
      val r = buildReader(rs)
      assert(r.recordSize == rs)
      assert(nameOf(r.lookup("10.1.2.3")) == "alpha")
      assert(nameOf(r.lookup("10.42.7.9")) == "gamma") // nested /16 wins over /9
      assert(nameOf(r.lookup("10.43.0.1")) == "alpha") // sibling falls back to /9
      assert(nameOf(r.lookup("10.200.0.1")) == "beta")
      assert(r.lookup("11.0.0.1") == null) // miss
      // the deduped record decodes through the pointer path
      assert(nameOf(r.lookup("192.168.55.1")) == "alpha")
    }

  test("ip_version=6 tree resolves IPv4 addresses under the 96-bit zero prefix") {
    val w = new Mmdb.Writer(ipVersion = 6, recordSize = 28)
    w.insert("::a00:0/105", Map("name" -> "v4range")) // 10.0.0.0/9 mapped into v6
    w.insert("2001:db8::/32", Map("name" -> "docs"))
    val r = new Mmdb.Reader(w.build())
    assert(nameOf(r.lookup("10.3.4.5")) == "v4range")
    assert(nameOf(r.lookup("2001:db8::42")) == "docs")
    assert(r.lookup("11.0.0.1") == null)
    intercept[IllegalArgumentException] {
      buildReader(24).lookup("2001:db8::1") // v6 addr in a v4 db
    }
  }

  test("value types round-trip: strings, uints, int32, double, float, bool, arrays, maps") {
    val w = new Mmdb.Writer(ipVersion = 4, recordSize = 32)
    w.insert("10.0.0.0/8", Map(
      "s" -> "héllo wörld",
      "small" -> 7L, "u16" -> 65000L, "u32" -> 4000000000L, "u64" -> 9007199254740993L,
      "neg" -> -12345L,
      "d" -> 1.25, "flag" -> true, "off" -> false,
      "arr" -> Seq("a", "b", 3L),
      "nested" -> Map("x" -> Map("y" -> "deep"))))
    val r = new Mmdb.Reader(w.build())
    val m = r.lookup("10.9.9.9").asInstanceOf[VectorMap[String, Any]]
    assert(m("s") == "héllo wörld")
    assert(m("small") == 7L && m("u16") == 65000L && m("u32") == 4000000000L)
    assert(m("u64") == 9007199254740993L)
    assert(m("neg") == -12345L)
    assert(m("d") == 1.25 && m("flag") == true && m("off") == false)
    assert(m("arr") == Vector("a", "b", 3L))
    assert(m("nested").asInstanceOf[VectorMap[String, Any]]("x")
      .asInstanceOf[VectorMap[String, Any]]("y") == "deep")
  }

  test("metadata section decodes and drives the reader") {
    val r = buildReader(32)
    assert(r.metadata("ip_version") == 4L)
    assert(r.metadata("binary_format_major_version") == 2L)
    assert(r.metadata("database_type") == "GeoLite2-City-Test")
    assert(r.ipVersion == 4 && r.nodeCount > 0)
  }

  test("ranges() enumerates the trie as sorted disjoint leaves matching lookup()") {
    val r = Mmdb.reader(Mmdb.cityFixturePath)
    val rs = r.ranges()
    // sorted, disjoint
    assert(rs == rs.sortBy(_._1))
    rs.sliding(2).foreach {
      case Vector((_, hiA, _), (loB, _, _)) => assert(hiA < loB, s"overlap at $hiA/$loB")
      case _ => ()
    }
    // the nested /16 split the /9: strictly more ranges than inserts
    assert(rs.length > 3, s"nested network did not split: ${rs.length} ranges")
    def ipLong(s: String): Long =
      s.split('.').foldLeft(0L)((a, o) => a * 256 + o.toLong)
    // every boundary and interior point agrees with the longest-prefix walk
    for (probe <- Seq("10.0.0.0", "10.41.255.255", "10.42.0.0", "10.42.255.255",
        "10.43.0.0", "10.127.255.255", "10.128.0.0", "10.255.255.255")) {
      val viaTree = r.lookup(probe)
      val viaRanges = rs.find { case (lo, hi, _) => ipLong(probe) >= lo && ipLong(probe) <= hi }
      assert(viaRanges.map(_._3) == Option(viaTree), s"range/tree disagree at $probe")
    }
    // an address outside every network is in neither
    assert(r.lookup("203.0.113.9") == null)
    assert(!rs.exists { case (lo, hi, _) => ipLong("203.0.113.9") >= lo && ipLong("203.0.113.9") <= hi })
  }

  test("geoip_* methods dispatch through the interpreter with catchable misses") {
    import graft.blob.{Bloblang, Interp}
    val db = Mmdb.cityFixturePath
    val out = Interp.run(Bloblang.parse(s"""
      root.city = this.ip.geoip_city("$db").city.names.en
      root.asn = this.ip.geoip_asn("$db").autonomous_system_number
      root.cc = this.ip.geoip_country("$db").country.iso_code
    """), """{"ip":"10.42.1.2"}""")
    assert(out.contains("""{"asn":64502,"cc":"GG","city":"Gamma"}"""))
    // a miss errors (reference contract) and is catchable
    val miss = Interp.run(Bloblang.parse(s"""
      root.city = this.ip.geoip_city("$db").city.names.en.catch("unknown")
    """), """{"ip":"203.0.113.9"}""")
    assert(miss.contains("""{"city":"unknown"}"""))
  }
}
