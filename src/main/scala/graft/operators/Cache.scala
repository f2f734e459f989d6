package graft.operators

import graft.core.{Msg, Processor}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cache/state family (SURVEY §2.2 `cache_get/set/add/delete`, §2.4
  * `cache`/`cached` processors; reference: internal/impl/pure/
  * bloblang_cache.go:37-144, processor_cache.go:31, processor_cached.go:21).
  *
  * The reference's cache is a single-process key/value resource consulted
  * per message. The Spark-native translation depends on which side of the
  * cache you're on:
  *
  *  - **Lookups against a bounded cache** (`cache_get`, enrichment): the
  *    cache is a key/value DataFrame; `get` is a broadcast hash join (the
  *    canonical Spark lookup — executor-local, no per-row RPC). For use
  *    inside expression position, [[KvCache.getExpr]] wraps the same data
  *    as a broadcast Scala map.
  *  - **Building/updating a cache from the stream** (`cache_set`/`add`):
  *    a deterministic last/first-writer-wins aggregation — at 100 TB this
  *    is one hash shuffle on the key, same shape as `dedupe`.
  *  - **Streaming caches with TTL** map to `mapGroupsWithState` (see
  *    StreamingSpec's stateful-counter pattern).
  *
  * `cached` (memoize child results by key) = compute child once per
  * DISTINCT key and join back — the Spark form of memoization: work is
  * proportional to distinct keys, not rows.
  */
object Caches {

  /** A bounded key/value cache resource backed by a DataFrame. */
  final case class KvCache(kv: DataFrame, keyCol: String, valueCol: String) {

    /** `cache_get` in enrichment position: broadcast join, executor-local.
      * Rows with no cache entry get null (bento: `cache_get` errors — pair
      * with [[Processors.errorWhere]] on isNull for that semantics). */
    def enrich(df: DataFrame, onKey: Column, as: String): DataFrame = {
      val rhs = broadcast(kv.select(col(keyCol).as("_ck"), col(valueCol).as(as)))
      df.join(rhs, onKey === col("_ck"), "left").drop("_ck")
    }

    /** `cache_get` in expression position: broadcast map lookup. Only for
      * bounded caches (the map lives on every executor) — enforced: more
      * than `maxRows` entries fails loudly instead of OOMing the driver.
      * For unbounded key spaces use [[enrich]] (a broadcast/shuffle join
      * Catalyst can plan) instead. */
    def getExpr(spark: SparkSession, maxRows: Int = 1000000): Column => Column = {
      val rows = kv.select(col(keyCol).cast(StringType), col(valueCol).cast(StringType))
        .limit(maxRows + 1).collect()
      require(rows.length <= maxRows,
        s"cache has more than $maxRows entries; getExpr is for bounded caches — " +
          "use enrich (broadcast join) for fact-sized key spaces")
      val m = rows.map(r => r.getString(0) -> r.getString(1)).toMap
      val bc = spark.sparkContext.broadcast(m)
      val look = udf((k: String) => if (k == null) null else bc.value.getOrElse(k, null))
      (key: Column) => look(key.cast(StringType))
    }
  }

  /** `cache_set` from a stream: last-writer-wins per key with a
    * deterministic order (one hash shuffle; the reference's single-threaded
    * "last set wins" needs an explicit order in a parallel engine). */
  def buildLastWins(df: DataFrame, key: Column, value: Column, order: Column): KvCache = {
    // max_by, not a row_number window: a hot cache key (the natural skew
    // shape for a kv cache) partial-aggregates map-side instead of piling
    // into one window task (window-skew audit, PLANS.md). The ordering
    // rides a never-null (isNotNull, value) struct: bare max_by IGNORES
    // rows whose order is NULL — null-ordered writes rank lowest (the
    // desc-nulls-last window contract) instead of silently vanishing.
    val kv = df.select(key.as("k"), value.as("v"), order.as("o"))
      .groupBy("k").agg(max_by(col("v"), struct(col("o").isNotNull, col("o"))).as("v"))
    KvCache(kv, "k", "v")
  }

  /** `cache_add`: first-writer-wins (add fails if present → keep first).
    * NULL order ranks first (nulls-first) via the same never-null
    * ordering struct as [[buildLastWins]]. */
  def buildFirstWins(df: DataFrame, key: Column, value: Column, order: Column): KvCache = {
    val kv = df.select(key.as("k"), value.as("v"), order.as("o"))
      .groupBy("k").agg(min_by(col("v"), struct(col("o").isNotNull, col("o"))).as("v"))
    KvCache(kv, "k", "v")
  }

  /** `cached` processor (processor_cached.go:21): memoize a child transform
    * by key — the child runs once per DISTINCT key, results join back to
    * all rows. `childOfKeys` receives a DataFrame with a single column
    * `key` (distinct) and must return (`key`, result columns).
    */
  def cached(keyExpr: Column, childOfKeys: DataFrame => DataFrame,
             resultCols: Seq[String]): Processor =
    Processor("cached") { df =>
      val keyed = df.withColumn("_cache_key", keyExpr)
      val distinctKeys = keyed.select(col("_cache_key").as("key")).distinct()
      val results = childOfKeys(distinctKeys)
        .select(col("key").as("_cache_key") +: resultCols.map(col): _*)
      keyed.join(results, Seq("_cache_key"), "left").drop("_cache_key")
    }

  /** `retry` processor (processor_retry.go:28): re-run the child on rows
    * still errored, up to `maxAttempts`. The child sees an `_attempt`
    * column (1-based) and may consult it; rows that clear their error stop
    * being reprocessed. Bounded driver-side loop over ONE lazy plan — the
    * reference's per-message backoff loop becomes per-row conditional
    * re-application.
    */
  def retry(child: Processor, maxAttempts: Int = 3): Processor =
    Processor("retry") { df0 =>
      var df = child(df0.withColumn("_attempt", lit(1)))
      for (attempt <- 2 to maxAttempts) {
        val redo = child(
          df.filter(Msg.errored)
            .withColumn(Msg.ErrorCol, lit(null).cast(StringType))
            .withColumn("_attempt", lit(attempt)))
        df = df.filter(Msg.ok).unionByName(redo, allowMissingColumns = true)
      }
      df.drop("_attempt")
    }
}
