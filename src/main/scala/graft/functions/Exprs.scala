package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.{Columns => ColumnShim}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, StringType}
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

  /** Fused cosine similarity over two array columns: ONE pass computing
    * dot and both norms, no intermediate arrays. The HOF form
    * (zip_with + aggregate ×3, Blob.cosineSimilarity's original body)
    * allocates three zipped arrays per row — at ANN-scan scale that is
    * the allocation hot path. Semantics are the HOF form's EXACTLY,
    * including its null algebra: unequal lengths or a null element make
    * the result null (zip_with pads to the longer array with nulls and
    * the aggregate's `acc + null` nulls the fold), and the accumulation
    * order is the same left-to-right element order, so results are
    * bit-identical to the previous plan (gate hashes unchanged). */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnShim.column(CosineSimilarityExpr(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Codegen/eval kernel. Returns null (boxed) per the null algebra. */
  def cosineKernel(x: ArrayData, y: ArrayData,
                   xFloat: Boolean, yFloat: Boolean): java.lang.Double = {
    val n = x.numElements()
    if (y.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"
  override def nullable: Boolean = true

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_similarity expects array<float|double>, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Exprs.cosineKernel(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lf = isFloat(left)
    val rf = isFloat(right)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""
         |java.lang.Double $boxed = graft.functions.Exprs.cosineKernel($a, $b, $lf, $rf);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimilarityExpr = copy(left = newLeft, right = newRight)
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
