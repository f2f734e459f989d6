package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.collection.mutable

/** The reference's pluggable cache RESOURCE backends (SURVEY §2.8 —
  * docs/components/caches/; impls internal/impl/pure/cache_{memory,lru,
  * ttlru,multilevel,noop}.go, impl/io/cache_file.go). All share one verb
  * set — Get / Set / Add (fail-if-present) / Delete / Exists — consumed
  * by the `cache` processor, `cached`, `dedupe` and the Bloblang
  * cache_* functions.
  *
  * On Spark these are EXECUTOR-LOCAL resources (one per partition or one
  * per JVM): the cross-executor shared state story is the broadcast-join
  * / state-store path in [[Caches]]; these backends exist for the
  * reference's per-process semantics — memoization, node-local dedupe
  * windows, spill-to-disk lookups — and for parity with configs that
  * name them. [[graft.conn.Redis.Cache]] implements the same trait for
  * the external-service story.
  */
object CacheBackends {

  /** ErrKeyAlreadyExists → `add` returns false; ErrKeyNotFound → `get`
    * returns None (the Go error enum mapped to Option/Boolean). */
  trait KvBackend extends AutoCloseable {
    def get(key: String): Option[Array[Byte]]
    def set(key: String, value: Array[Byte], ttlMs: Long = 0): Unit
    def add(key: String, value: Array[Byte], ttlMs: Long = 0): Boolean
    def delete(key: String): Unit
    def exists(key: String): Boolean = get(key).isDefined
    override def close(): Unit = ()
  }

  /** `memory` cache (cache_memory.go): unbounded map + optional default
    * TTL, lazily expired — the reference shards 16 ways for lock spread;
    * one synchronized map serves a partition-local resource fine. */
  final class MemoryCache(defaultTtlMs: Long = 0) extends KvBackend {
    private val m = mutable.HashMap[String, (Array[Byte], Long)]() // value, expireAt (0 = never)
    private def now() = System.currentTimeMillis()
    private def liveValue(key: String): Option[Array[Byte]] = m.get(key) match {
      case Some((_, at)) if at > 0 && now() >= at => m.remove(key); None
      case Some((v, _)) => Some(v)
      case None => None
    }
    private def expireAt(ttlMs: Long): Long = {
      val t = if (ttlMs > 0) ttlMs else defaultTtlMs
      if (t > 0) now() + t else 0L
    }
    def get(key: String): Option[Array[Byte]] = synchronized(liveValue(key))
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit =
      synchronized { m(key) = (value, expireAt(ttlMs)) }
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean = synchronized {
      if (liveValue(key).isDefined) false
      else { m(key) = (value, expireAt(ttlMs)); true }
    }
    def delete(key: String): Unit = synchronized { m.remove(key); () }
  }

  /** `lru` cache (cache_lru.go, `algorithm: standard`): fixed capacity,
    * least-recently-USED eviction — a Get refreshes recency, exactly the
    * hashicorp/golang-lru contract the reference wraps. The 2Q and ARC
    * variants are declared out (ARC is IBM-patented; the reference
    * itself just re-exports library implementations) — capacity-bounded
    * recency eviction is the semantic configs rely on. TTLs are
    * unsupported here as in the reference (its lru ignores TTL). */
  final class LruCache(capacity: Int) extends KvBackend {
    require(capacity > 0, "lru capacity must be positive")
    private val m = new java.util.LinkedHashMap[String, Array[Byte]](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Byte]]): Boolean =
        size() > capacity
    }
    def get(key: String): Option[Array[Byte]] = synchronized(Option(m.get(key)))
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit =
      synchronized { m.put(key, value); () }
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean = synchronized {
      if (m.containsKey(key)) false else { m.put(key, value); true }
    }
    def delete(key: String): Unit = synchronized { m.remove(key); () }
  }

  /** `ttlru` cache (cache_ttlru.go): fixed capacity + a per-cache TTL on
    * every entry (default 5m), recency eviction, lazy expiry. */
  final class TtlruCache(capacity: Int, defaultTtlMs: Long = 5 * 60 * 1000) extends KvBackend {
    require(capacity > 0, "ttlru capacity must be positive")
    private val m = new java.util.LinkedHashMap[String, (Array[Byte], Long)](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, (Array[Byte], Long)]): Boolean =
        size() > capacity
    }
    private def now() = System.currentTimeMillis()
    private def liveValue(key: String): Option[Array[Byte]] = Option(m.get(key)) match {
      case Some((_, at)) if now() >= at => m.remove(key); None
      case Some((v, _)) => Some(v)
      case None => None
    }
    private def ttl(ttlMs: Long): Long = now() + (if (ttlMs > 0) ttlMs else defaultTtlMs)
    def get(key: String): Option[Array[Byte]] = synchronized(liveValue(key))
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit =
      synchronized { m.put(key, (value, ttl(ttlMs))); () }
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean = synchronized {
      if (liveValue(key).isDefined) false else { m.put(key, (value, ttl(ttlMs))); true }
    }
    def delete(key: String): Unit = synchronized { m.remove(key); () }
  }

  /** `file` cache (impl/io/cache_file.go): one file per key under a
    * directory; `add` is an O_EXCL create (:77), so concurrent adders
    * race safely at the filesystem. TTLs unsupported, as in the
    * reference. Node-local by nature: on a cluster every executor sees
    * its OWN directory unless the path is a shared mount — the same
    * contract as the reference's (one process, one dir). */
  final class FileCache(dir: String) extends KvBackend {
    private val base: Path = Paths.get(dir)
    Files.createDirectories(base)
    private def p(key: String): Path = {
      val rp = base.resolve(key).normalize()
      require(rp.startsWith(base), s"cache key escapes the directory: $key")
      rp
    }
    def get(key: String): Option[Array[Byte]] = {
      val f = p(key)
      if (Files.exists(f)) Some(Files.readAllBytes(f)) else None
    }
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit = {
      Files.write(p(key), value); ()
    }
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean =
      try {
        Files.write(p(key), value, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    def delete(key: String): Unit = { Files.deleteIfExists(p(key)); () }
    override def exists(key: String): Boolean = Files.exists(p(key))
  }

  /** `multilevel` cache (cache_multilevel.go): get walks levels in order
    * and PROMOTES a hit into every level above it (:setUpToLevelPassive);
    * writes and deletes go to all levels. The canonical use is a small
    * lru in front of a big/remote backend. */
  final class MultilevelCache(levels: Seq[KvBackend]) extends KvBackend {
    require(levels.size >= 2, "multilevel requires at least two caches")
    def get(key: String): Option[Array[Byte]] = {
      var i = 0
      while (i < levels.size) {
        levels(i).get(key) match {
          case Some(v) =>
            var j = 0
            while (j < i) { levels(j).set(key, v); j += 1 } // promote
            return Some(v)
          case None => i += 1
        }
      }
      None
    }
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit =
      levels.foreach(_.set(key, value, ttlMs))
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean = {
      // reference: attempt add at every level; the key is "added" if any
      // level accepted it (the outermost durable level decides truth)
      val results = levels.map(_.add(key, value, ttlMs))
      results.last
    }
    def delete(key: String): Unit = levels.foreach(_.delete(key))
    override def close(): Unit = levels.foreach(_.close())
  }

  /** `noop` cache (cache_noop.go): accepts everything, remembers nothing. */
  final class NoopCache extends KvBackend {
    def get(key: String): Option[Array[Byte]] = None
    def set(key: String, value: Array[Byte], ttlMs: Long): Unit = ()
    def add(key: String, value: Array[Byte], ttlMs: Long): Boolean = true
    def delete(key: String): Unit = ()
  }

  /** Convenience for string values. */
  def getString(c: KvBackend, key: String): Option[String] =
    c.get(key).map(new String(_, UTF_8))
  def setString(c: KvBackend, key: String, value: String): Unit =
    c.set(key, value.getBytes(UTF_8))
}
