package graft.blob

import graft.core.{Msg, Processor}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Interpolated field strings — `prefix ${! expr } suffix` (reference:
  * internal/bloblang/parser/field_parser.go:17-83, field/expression.go).
  * This is the syntax nearly every reference string config field accepts
  * (`output.kafka.topic: "${! meta(\"topic\") }"`, the `template`
  * processor, log messages, metric labels…).
  *
  * Spark-first shape: the template compiles ONCE driver-side into
  * static/dynamic segments. A static-only template becomes `lit(...)` —
  * no UDF, stays in codegen. A dynamic template compiles each `${!expr}`
  * to a Bloblang AST and renders per row in a single UDF over the JSON
  * content (same executor-side model as BloblangUdf).
  *
  * Escape: `${{!expr}}` renders the literal text `${!expr}`
  * (field_parser.go:42-53).
  */
object Interpolate {

  sealed trait Seg extends Serializable
  final case class Static(s: String) extends Seg
  final case class Dyn(src: String, e: Bloblang.Expr) extends Seg

  /** Compile a template into segments; parse errors surface here
    * (driver-side, like the reference's config lint stage). */
  def compile(template: String): Vector[Seg] = {
    val out = Vector.newBuilder[Seg]
    val sb = new StringBuilder
    def flush(): Unit = if (sb.nonEmpty) { out += Static(sb.toString); sb.clear() }
    var i = 0
    while (i < template.length) {
      if (template.startsWith("${{!", i)) {
        val end = template.indexOf("}}", i + 4)
        require(end >= 0, s"interpolation: unterminated escape at $i")
        sb.append("${!").append(template.substring(i + 4, end)).append("}")
        i = end + 2
      } else if (template.startsWith("${!", i)) {
        val end = matchBrace(template, i + 3)
        val src = template.substring(i + 3, end).trim
        flush()
        out += Dyn(src, Bloblang.parseExpr(src))
        i = end + 1
      } else { sb.append(template.charAt(i)); i += 1 }
    }
    flush()
    out.result()
  }

  /** Index of the `}` closing an interpolation opened just before `from`,
    * depth-aware so object literals and strings inside the expression
    * don't end it early. */
  private def matchBrace(s: String, from: Int): Int = {
    var depth = 0
    var i = from
    while (i < s.length) {
      s.charAt(i) match {
        case '"' =>
          i += 1
          while (i < s.length && s.charAt(i) != '"') {
            if (s.charAt(i) == '\\') i += 1
            i += 1
          }
        case '{' => depth += 1
        case '}' =>
          if (depth == 0) return i
          depth -= 1
        case _ => ()
      }
      i += 1
    }
    throw new IllegalArgumentException(s"interpolation: unterminated $${! at ${from - 3}")
  }

  /** Render against one message's JSON content (+ optional metadata). A
    * failing expression throws BlobError — callers route it to the error
    * facet, mirroring reference interpolation errors. */
  def render(segs: Vector[Seg], content: String,
             meta: Map[String, String] = Map.empty,
             env: Map[String, String] = Map.empty): String = {
    lazy val parsed: Either[Throwable, Any] =
      try Right(Interp.parseJsonTyped(content))
      catch { case e: Exception => Left(new Bloblang.BlobError(s"invalid JSON: ${e.getMessage}")) }
    val ctx = Interp.Ctx(() => parsed.fold(throw _, identity), content,
      scala.collection.mutable.Map.empty, meta, env, Map.empty, Bloblang.VNothing)
    segs.map {
      case Static(s) => s
      case Dyn(_, e) => Interp.eval(e, ctx) match {
        case Bloblang.VNothing | null => "null"
        case v => Interp.toStr(v)
      }
    }.mkString
  }

  /** Batch-aware render: the expression sees the i-th message as `this`/
    * `content()`/`meta()` and the whole batch via `.from(j)`/`.from_all()`
    * (needed for keys like `${! meta("tag").from(0) + content() }`). */
  def renderInBatch(segs: Vector[Seg], contents: Vector[String],
                    metas: Vector[Map[String, String]], idx: Int,
                    env: Map[String, String] = Map.empty): String = {
    val parsedAll: Vector[() => Any] = contents.map { c =>
      lazy val v: Either[Throwable, Any] =
        try Right(Interp.parseJsonTyped(c))
        catch { case e: Exception => Left(new Bloblang.BlobError(s"invalid JSON: ${e.getMessage}")) }
      () => v.fold(throw _, identity)
    }
    val ctx = Interp.Ctx(parsedAll(idx), contents(idx),
      scala.collection.mutable.Map.empty, metas(idx), env, Map.empty, Bloblang.VNothing,
      parsedAll, idx.toLong, scala.collection.mutable.Map.empty, j => metas(j))
    segs.map {
      case Static(s) => s
      case Dyn(_, e) => Interp.eval(e, ctx) match {
        case Bloblang.VNothing | null => "null"
        case v => Interp.toStr(v)
      }
    }.mkString
  }

  /** Template → Column over a JSON-content column. Static-only templates
    * stay pure-Column (codegen, no UDF). */
  def column(template: String, content: Column,
             env: Map[String, String] = Map.empty): Column = {
    val segs = compile(template)
    if (segs.forall(_.isInstanceOf[Static]))
      lit(segs.collect { case Static(s) => s }.mkString)
    else {
      val u = udf { (c: String) =>
        if (c == null) null else render(segs, c, Map.empty, env)
      }
      u(content)
    }
  }

  /** Like [[column]] but with the envelope's metadata map in scope, so
    * `${! meta("key") }` resolves — the dominant template shape in
    * reference configs (topic/path routing by metadata). */
  def columnWithMeta(template: String, content: Column, metaCol: Column,
                     env: Map[String, String] = Map.empty): Column = {
    val segs = compile(template)
    if (segs.forall(_.isInstanceOf[Static]))
      lit(segs.collect { case Static(s) => s }.mkString)
    else {
      val u = udf { (c: String, m: Map[String, String]) =>
        if (c == null) null
        else render(segs, c, if (m == null) Map.empty[String, String] else m, env)
      }
      u(content, metaCol)
    }
  }

  /** `template`-shaped processor: render the interpolated template as the
    * new content (reference template rendering semantics; a render error
    * lands in the error facet instead of failing the job). */
  def templateProcessor(template: String, env: Map[String, String] = Map.empty): Processor = {
    val segs = compile(template)
    val f = udf { (c: String) =>
      if (c == null) Array[String](null, null)
      else try Array(render(segs, c, Map.empty, env), null)
      catch { case e: Bloblang.BlobError => Array(c, e.msg) }
    }
    Processor("template") { df =>
      df.withColumn("_tpl", f(col(Msg.ContentCol)))
        .withColumn(Msg.ContentCol, col("_tpl").getItem(0))
        .withColumn(Msg.ErrorCol, coalesce(col(Msg.ErrorCol), col("_tpl").getItem(1)))
        .drop("_tpl")
    }
  }
}
