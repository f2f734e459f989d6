package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Range-keyed enrichment — the `geoip_*` operator shape (reference:
  * internal/impl/maxmind/bloblang_geoip.go:55-83). The MaxMind database
  * itself is licensed data we don't ship; what the engine provides is the
  * lookup machinery: an IP/range table broadcast to executors and probed
  * per row. Two strategies:
  *
  *  - [[enrichJoin]]: declarative non-equi join against a broadcast range
  *    table — Catalyst plans a BroadcastNestedLoopJoin; right for small
  *    range sets (the optimizer sees the predicate).
  *  - [[lookupExpr]]: binary search over a broadcast sorted array — O(log
  *    n) per row; right for real GeoIP scale (~millions of ranges where a
  *    nested-loop probe would be O(n)).
  */
object Geo {

  /** Dotted-quad IPv4 → numeric (pure Column math, codegen'd). */
  def ipToLong(ip: Column): Column = {
    val p = split(ip, "\\.")
    element_at(p, 1).cast(LongType) * 16777216L +
      element_at(p, 2).cast(LongType) * 65536L +
      element_at(p, 3).cast(LongType) * 256L +
      element_at(p, 4).cast(LongType)
  }

  /** Broadcast range join: ranges(loCol, hiCol, value columns…). */
  def enrichJoin(df: DataFrame, ipLong: Column, ranges: DataFrame,
                 loCol: String, hiCol: String): DataFrame =
    df.join(broadcast(ranges), ipLong >= col(loCol) && ipLong <= col(hiCol), "left")

  /** Binary-search lookup over broadcast sorted non-overlapping ranges:
    * (lo, hi, value). Returns a Column-factory for expression position. */
  def lookupExpr(spark: SparkSession, ranges: Seq[(Long, Long, String)]): Column => Column = {
    val sorted = ranges.sortBy(_._1).toArray
    require(sorted.iterator.sliding(2).withPartial(false)
      .forall(w => w.head._2 < w.last._1), "ranges must be sorted and non-overlapping")
    val bc = spark.sparkContext.broadcast(sorted)
    val f = udf { (ip: java.lang.Long) =>
      if (ip == null) null
      else {
        val a = bc.value
        var lo = 0
        var hi = a.length - 1
        var res: String = null
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (ip < a(mid)._1) hi = mid - 1
          else if (ip > a(mid)._2) lo = mid + 1
          else { res = a(mid)._3; lo = hi + 1 }
        }
        res
      }
    }
    (ip: Column) => f(ip)
  }
}
