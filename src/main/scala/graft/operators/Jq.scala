package graft.operators

import graft.blob.{Bloblang, Interp}
import graft.core.{Msg, Processor}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** `jq` / `jmespath` processor subset (reference: internal/impl/pure/
  * processor_jq.go:29, processor_jmespath.go:26). The supported program
  * form is the overwhelmingly-common subset: a path query with optional
  * terminal filters, piped —
  *
  *   .a.b[0]               path access (objects and array indexes)
  *   .a | length           array/object/string length
  *   .a | keys             sorted object keys
  *   .a | tostring         JSON-serialize
  *   .a | tonumber         string → number
  *   .[2]                  index into the root array
  *
  * Programs COMPILE (driver-side, fail-fast) to the Bloblang AST and run
  * on the same interpreter as the text frontend — jq here is a syntax
  * skin, not a second engine; anything past this subset is Bloblang's
  * job (the reference docs give the same guidance for complex cases).
  */
object Jq {
  import Bloblang._

  /** Parse a jq program into a Bloblang expression. */
  def compile(prog: String): Expr = {
    val stages = prog.trim.split('|').map(_.trim).toVector
    require(stages.nonEmpty && stages.head.startsWith("."),
      s"jq: program must start with a path, got '$prog'")
    val path = parsePath(stages.head)
    stages.tail.foldLeft(path) {
      case (e, "length") => MethodCall(e, "length", Vector.empty)
      case (e, "keys") => MethodCall(MethodCall(e, "keys", Vector.empty), "sort", Vector.empty)
      case (e, "tostring") => MethodCall(e, "string", Vector.empty)
      case (e, "tonumber") => MethodCall(e, "number", Vector.empty)
      case (_, other) => throw new IllegalArgumentException(s"jq: unsupported filter '$other'")
    }
  }

  /** `.a.b[0].c` → Field/Index chain over `this`. `.` alone is `this`. */
  private def parsePath(p: String): Expr = {
    var e: Expr = This
    var i = 1 // skip leading '.'
    while (i < p.length) {
      p.charAt(i) match {
        case '[' =>
          val end = p.indexOf(']', i)
          require(end > i, s"jq: unterminated index in '$p'")
          val idx = p.substring(i + 1, end).trim
          e = Index(e, Lit(idx.toLong))
          i = end + 1
        case '.' => i += 1
        case _ =>
          val end = p.indexWhere(c => c == '.' || c == '[', i) match {
            case -1 => p.length
            case n => n
          }
          e = Field(e, p.substring(i, end))
          i = end
      }
    }
    e
  }

  /** jq program → UDF over a JSON content string (null-safe; a query
    * failure returns null, matching jq's empty-output behavior). */
  def jqUdf(prog: String): UserDefinedFunction = {
    val expr = compile(prog) // fail fast on the driver
    udf { (content: String) =>
      if (content == null) null
      else {
        val ctx = Interp.Ctx(() => Interp.parseJsonTyped(content), content,
          scala.collection.mutable.Map.empty, Map.empty, Map.empty, Map.empty, VNothing)
        try Interp.eval(expr, ctx) match {
          case null | VNothing => null
          case v => Interp.marshal(v)
        } catch { case _: BlobError => null }
      }
    }
  }

  /** jq program → Column over a JSON content column. */
  def jq(prog: String, content: Column): Column = jqUdf(prog)(content)

  /** `jq` processor: content replaced by the query result. */
  def processor(prog: String): Processor =
    Processor("jq")(df => df.withColumn(Msg.ContentCol, jq(prog, col(Msg.ContentCol))))
}
