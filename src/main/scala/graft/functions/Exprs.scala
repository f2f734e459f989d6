package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.{Columns => ColumnShim}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for Bloblang methods with no built-in SQL
  * twin (SURVEY §3.2 escape-hatch order: compose built-ins > custom
  * `Expression` with codegen > UDF). Unlike a Scala UDF these stay inside
  * whole-stage codegen — no Row boxing, no codegen fence — so a compiled
  * mapping using them keeps its single codegen span and its pushdown.
  */
object Exprs {
  /** `unescape_html` over a string column (reference method doc
    * docs/modules/guides/pages/bloblang/methods.adoc `unescape_html`;
    * interpreter twin blob/Methods.scala unescapeHtml — named entities
    * plus decimal/hex numeric refs, unknown entities kept verbatim). */
  def unescapeHtml(c: Column): Column =
    ColumnShim.column(UnescapeHtmlExpr(ColumnShim.expression(c)))

  /** Called from whole-stage-codegen'd Java (a top-level Scala object gets
    * a public static forwarder, which Janino can link). */
  def unescapeString(s: String): String = graft.blob.Methods.unescapeHtml(s)
}

case class UnescapeHtmlExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "unescape_html"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Exprs.unescapeString(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.functions.Exprs.unescapeString($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UnescapeHtmlExpr =
    copy(child = newChild)
}
