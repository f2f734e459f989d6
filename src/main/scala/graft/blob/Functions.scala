package graft.blob

import Bloblang._
import Interp._
import scala.collection.immutable.VectorMap

/** Bloblang function library for the text frontend (reference registry:
  * internal/bloblang/query/function_set.go, functions.go). */
object Functions {

  private def err(msg: String): Nothing = throw new BlobError(msg)

  // per-JVM counters for count("name") — partition-local semantics, as
  // documented for the distributed engine (SURVEY §7.3)
  private val counters = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def call(name: String, args: Vector[Any], ctx: Ctx): Any = name match {
    case "content" => VBytes(ctx.content.getBytes("UTF-8"))
    case "this" => ctx.self()
    case "env" => ctx.env.getOrElse(toStr(args(0)), null)
    case "json" =>
      if (args.isEmpty) ctx.self()
      else toStr(args(0)).split('.').foldLeft(ctx.self()) {
        case (m: VectorMap[String @unchecked, Any @unchecked], seg) => m.getOrElse(seg, null)
        case (null, _) => null
        case (other, seg) => err(s"field `$seg` on ${typeName(other)}")
      }
    case "meta" | "metadata" =>
      if (args.isEmpty) VectorMap.from(ctx.meta)
      else ctx.meta.getOrElse(toStr(args(0)), null)
    case "root_meta" =>
      if (args.isEmpty) VectorMap.from(ctx.meta) else ctx.meta.getOrElse(toStr(args(0)), null)
    case "deleted" => VDelete
    case "nothing" => VNothing
    case "range" =>
      val (start, stop) = (toLong(args(0)), toLong(args(1)))
      val step = if (args.size > 2) toLong(args(2)) else 1L
      if (step == 0) err("range step must not be 0")
      Vector.from(start.until(stop, step))
    case "throw" => err(toStr(args(0)))
    case "uuid_v4" => java.util.UUID.randomUUID().toString
    case "nanoid" => graft.functions.Udfs.nanoid()
    case "now" => java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
      .format(java.time.OffsetDateTime.now(java.time.ZoneOffset.UTC))
    case "timestamp_unix" => System.currentTimeMillis() / 1000L
    case "timestamp_unix_milli" => System.currentTimeMillis()
    case "timestamp_unix_micro" => System.currentTimeMillis() * 1000L
    case "random_int" =>
      val max = if (args.nonEmpty) toLong(args(0)) else Long.MaxValue
      java.util.concurrent.ThreadLocalRandom.current().nextLong(max)
    case "batch_index" => ctx.batchIndex
    case "batch_size" => math.max(1L, ctx.batch.length.toLong)
    case "count" | "counter" =>
      val key = if (args.nonEmpty) toStr(args(0)) else ""
      counters.computeIfAbsent(key, _ => new java.util.concurrent.atomic.AtomicLong())
        .incrementAndGet()
    case "error" => ctx.errorMsg // null when not errored (processor-level
    // failures thread it via runBatchWithErrors; Spark rows use Msg.ErrorCol)
    case "errored" => ctx.errorMsg != null
    case "pi" => math.Pi
    case "hostname" => // io/bloblang.go:13 — resolved where the row executes
      try java.net.InetAddress.getLocalHost.getHostName catch { case _: Exception => "localhost" }
    case "file" => // io/bloblang.go:189 — plan-time read (reference reads at mapping init)
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(toStr(args(0)))), "UTF-8")
    case "fake" => // impl/lang/bloblang.go:79 — deterministic-per-call subset
      val rnd = java.util.concurrent.ThreadLocalRandom.current()
      toStr(args(0)) match {
        case "name" =>
          val first = Vector("Ada", "Grace", "Alan", "Edsger", "Barbara", "Donald")
          val last = Vector("Lovelace", "Hopper", "Turing", "Dijkstra", "Liskov", "Knuth")
          s"${first(rnd.nextInt(first.size))} ${last(rnd.nextInt(last.size))}"
        case "email" =>
          val user = Vector("ada", "grace", "alan", "barbara")(rnd.nextInt(4))
          s"$user${rnd.nextInt(1000)}@example.com"
        case "uuid" => java.util.UUID.randomUUID().toString
        case other => err(s"fake: unsupported type $other")
      }
    case "timestamp_unix_nano" => System.currentTimeMillis() * 1000000L
    case "error_source_label" | "error_source_path" | "error_source_type" =>
      null // error facets live at the row level (Msg.ErrorCol family)
    // tracing is not wired (no OTel substrate): reference-disabled values —
    // zeroed trace id, null span, null flow id (functions.md EXPERIMENTAL)
    case "tracing_id" => "0" * 32
    case "tracing_span" | "flow_id" => null
    case "ksuid" => graft.functions.Crypto.ksuid()
    case "ulid" => graft.functions.Crypto.ulid()
    case "snowflake_id" =>
      graft.functions.Crypto.snowflakeId(if (args.isEmpty) 1L else toLong(args(0)))
    case "cosine_similarity" => // bloblang_numbers_v2.go:36
      val (a, b) = (vecOf(args(0)), vecOf(args(1)))
      if (a.length != b.length) err(s"cosine_similarity: lengths ${a.length} != ${b.length}")
      var (dot, na, nb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    // file_rel*: relative paths resolve from the mapping's directory; the
    // standalone runner has no mapping file, so resolution is cwd-based
    case "file_rel" =>
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(toStr(args(0)))), "UTF-8")
    case "file_rel_json" =>
      Interp.parseJsonTyped(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(toStr(args(0)))), "UTF-8"))
    // cache resources (bloblang_cache.go:37-144): get errors on a missing
    // key (catchable), add errors when the key exists, delete is no-op-safe
    case "cache_get" =>
      cacheOf(ctx, args).get(toStr(args(1)))
        .map(v => VBytes(v.getBytes("UTF-8")))
        .getOrElse(err(s"key does not exist"))
    case "cache_set" =>
      cacheOf(ctx, args)(toStr(args(1))) = toStr(args(2)); null
    case "cache_add" =>
      val c = cacheOf(ctx, args)
      val k = toStr(args(1))
      if (c.contains(k)) err("key already exists")
      c(k) = toStr(args(2)); null
    case "cache_delete" =>
      cacheOf(ctx, args).remove(toStr(args(1))); null
    case other => err(s"unknown function $other")
  }

  private def cacheOf(ctx: Ctx, args: Vector[Any]): scala.collection.mutable.Map[String, String] =
    ctx.caches.getOrElseUpdate(toStr(args(0)), scala.collection.mutable.Map.empty)

  private def vecOf(v: Any): Array[Double] = v match {
    case a: Vector[Any @unchecked] => a.map(toNum).toArray
    case other => err(s"expected array of numbers, got ${typeName(other)}")
  }
}
