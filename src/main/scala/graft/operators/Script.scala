package graft.operators

import java.util.concurrent.ConcurrentHashMap

import scala.collection.immutable.VectorMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions.{col, udf}

import graft.blob.Bloblang.VBytes
import graft.blob.Interp

/** User-code processor — the JVM-native answer to the reference's
  * `javascript` processor family (impl/javascript/processor.go:44,
  * functions.go:88-254; the wasm/python processors share the same
  * run-user-code-per-message contract, impl/wasm/processor_wazero.go:21).
  *
  * The reference embeds goja (an ES5.1 interpreter in Go) and exposes a
  * `bento` object with `v0_msg_as_string/set_string/as_structured/
  * set_structured/get_meta/set_meta/exists_meta/fetch`. On a JVM the
  * idiomatic equivalent of "ship a code block, run it per message" is
  * JAVA source compiled at runtime with janino (already on every Spark
  * classpath — it is Spark's own codegen backend), which beats an
  * embedded interpreter: the user block runs as real bytecode, JIT'd like
  * any UDF. [[ScriptMsg]] mirrors the `bento.v0_msg_*` surface 1:1.
  *
  * Same trust model as the reference: the code in a config is operator
  * code, not untrusted tenant code.
  *
  * Scale shape: the code block COMPILES ONCE PER EXECUTOR JVM (keyed by
  * source text, like the reference's pooled VMs outliving invocations —
  * processor.go's vmRunner pool) and runs per row inside a codegen'd UDF
  * projection; no shuffle, no driver round-trips, no per-row compilation.
  */
object Script {

  /** Per-message view handed to compiled user code. Mirrors the
    * reference's JS function surface (functions.go:147-254):
    *
    * | reference (`bento.`)   | here                  |
    * |------------------------|-----------------------|
    * | v0_msg_as_string       | `asString()`          |
    * | v0_msg_set_string      | `setString(s)`        |
    * | v0_msg_as_structured   | `asStructured()`      |
    * | v0_msg_set_structured  | `setStructured(v)`    |
    * | v0_msg_get_meta        | `getMeta(k)`          |
    * | v0_msg_set_meta        | `setMeta(k, v)`       |
    * | v0_msg_exists_meta     | `existsMeta(k)`       |
    * | v0_fetch               | `fetch(url, method, body)` |
    *
    * Structured values cross as `java.util.Map`/`java.util.List`/`String`/
    * `Long`/`Double`/`Boolean` (goja's Go↔JS mapping, casts.go) so user
    * Java needs no Scala types.
    */
  final class ScriptMsg(content0: String, meta0: Map[String, String]) {
    private var content: String = if (content0 == null) "" else content0
    private var meta: Map[String, String] = meta0
    private var structured: Any = null // lazily parsed; flushed on read-back

    def asString(): String = {
      if (structured != null) { content = Interp.marshalJson(structured); structured = null }
      content
    }
    def setString(s: String): Unit = { structured = null; content = if (s == null) "" else s }

    /** Throws on non-JSON content — the reference's documented behavior
      * (functions.go:195: "will throw an error"). */
    def asStructured(): Object = {
      if (structured == null) structured = Interp.parseJsonTyped(content)
      toJava(structured)
    }
    def setStructured(v: Object): Unit = structured = fromJava(v)

    def existsMeta(k: String): Boolean = meta.contains(k)
    def getMeta(k: String): String =
      meta.getOrElse(k, throw new NoSuchElementException(s"metadata key $k does not exist"))
    def setMeta(k: String, v: String): Unit = meta = meta + (k -> v)

    /** Synchronous HTTP — `bento.v0_fetch` (functions.go:88-146). Returns
      * `{"status": long, "body": string}` as a java Map, like the
      * reference's result object. */
    def fetch(url: String, method: String, body: String): java.util.Map[String, Object] = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(30))
      val req = (method match {
        case null | "" | "GET" => b.GET()
        case m => b.method(m, java.net.http.HttpRequest.BodyPublishers.ofString(
          if (body == null) "" else body))
      }).build()
      val resp = fetchClient.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      val out = new java.util.LinkedHashMap[String, Object]()
      out.put("status", java.lang.Long.valueOf(resp.statusCode().toLong))
      out.put("body", resp.body())
      out
    }

    private[Script] def result: (String, Map[String, String]) = (asString(), meta)
  }

  // daemon threads + request timeouts: a gate query must never pin the JVM
  // open after main() returns (non-daemon HttpClient selector threads do)
  private lazy val fetchClient = java.net.http.HttpClient.newBuilder()
    .executor(java.util.concurrent.Executors.newCachedThreadPool { (r: Runnable) =>
      val th = new Thread(r, "script-fetch"); th.setDaemon(true); th
    })
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  // ===== value model <-> java.util (goja's casts.go analog) =================

  private def toJava(v: Any): Object = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Object]()
      m.asInstanceOf[Map[String, Any]].foreach { case (k, x) => out.put(k, toJava(x)) }
      out
    case xs: Vector[_] =>
      val out = new java.util.ArrayList[Object](xs.size)
      xs.foreach(x => out.add(toJava(x)))
      out
    case l: Long => java.lang.Long.valueOf(l)
    case d: Double => java.lang.Double.valueOf(d)
    case b: Boolean => java.lang.Boolean.valueOf(b)
    case b: VBytes => b.bytes
    case s: String => s
    case null => null
    case o => o.toString
  }

  private def fromJava(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      var out = VectorMap.empty[String, Any]
      m.asScala.foreach { case (k, x) => out = out.updated(String.valueOf(k), fromJava(x)) }
      out
    case xs: java.lang.Iterable[_] => xs.asScala.iterator.map(fromJava).toVector
    case arr: Array[Byte] => VBytes(arr)
    case arr: Array[_] => arr.iterator.map(fromJava).toVector
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
    case s: java.lang.Short => s.longValue()
    case b: java.lang.Byte => b.longValue()
    case f: java.lang.Float => f.doubleValue()
    case d: java.lang.Double => d.doubleValue()
    case b: java.lang.Boolean => b.booleanValue()
    case s: String => s
    case null => null
    case o => o.toString
  }

  // ===== compile-once-per-JVM cache =========================================

  // One compiled block per source text per executor JVM — the evaluator
  // generates a static method, safe for concurrent task threads.
  private val cache = new ConcurrentHashMap[String, org.codehaus.janino.ScriptEvaluator]()

  private[graft] def compiled(code: String): org.codehaus.janino.ScriptEvaluator =
    cache.computeIfAbsent(code, { src =>
      val se = new org.codehaus.janino.ScriptEvaluator()
      // Link the generated class against THIS ScriptMsg: Spark task threads
      // carry their own context classloader, and janino defaults to it —
      // same-name-different-loader ScriptMsg => "argument type mismatch".
      se.setParentClassLoader(classOf[ScriptMsg].getClassLoader)
      se.setParameters(Array("msg"), Array[Class[_]](classOf[ScriptMsg]))
      se.setThrownExceptions(Array[Class[_]](classOf[Exception]))
      se.cook(src)
      se
    })

  /** The `java` processor: run a Java code block per message. Exceptions
    * land in the error facet (the reference marks the part errored and
    * lets try/catch/DLQ routing take over — processor.go's MarkError
    * path), so one poison message never kills the job. */
  def processor(code: String,
                contentCol: String = graft.core.Msg.ContentCol,
                metaCol: String = graft.core.Msg.MetaCol): graft.core.Processor = {
    compiled(code) // driver-side fail-fast: syntax errors surface at build time
    val f = udf { (content: String, meta: Map[String, String]) =>
      val msg = new ScriptMsg(content, if (meta == null) Map.empty[String, String] else meta)
      try {
        // NB: evaluate is Java varargs — from Scala, pass the message as a
        // direct vararg (an Array[AnyRef] argument would be wrapped as a
        // single array-typed element => "argument type mismatch")
        compiled(code).evaluate(msg)
        val (c, m) = msg.result
        (c, m, null: String)
      } catch {
        case e: Exception =>
          // reflection wraps user throws in InvocationTargetException
          val cause = e match {
            case it: java.lang.reflect.InvocationTargetException
              if it.getCause != null => it.getCause
            case o => o
          }
          (content, meta, s"script: ${cause.getMessage}")
      }
    }
    graft.core.Processor("java") { df =>
      df.withColumn("_js", f(col(contentCol), col(metaCol)))
        .withColumn(contentCol, col("_js._1"))
        .withColumn(metaCol, col("_js._2"))
        .withColumn(graft.core.Msg.ErrorCol,
          org.apache.spark.sql.functions.coalesce(col(graft.core.Msg.ErrorCol), col("_js._3")))
        .drop("_js")
    }
  }
}
