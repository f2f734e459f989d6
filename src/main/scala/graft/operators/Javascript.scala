package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.Msg
import graft.operators.Js._

/** `javascript` processor (internal/impl/javascript/processor.go — the
  * reference embeds goja and exposes `bento.v0_msg_*` host functions,
  * functions.go:147-254). The script runs per message against the
  * in-repo ES5.1-subset interpreter ([[Js]]); the `bento` object
  * mirrors the documented surface 1:1:
  *
  * | reference              | here (same names)        |
  * |------------------------|--------------------------|
  * | v0_msg_as_string       | content as a string      |
  * | v0_msg_set_string      | replace content          |
  * | v0_msg_as_structured   | parsed JSON tree (throws on non-JSON, the documented behavior) |
  * | v0_msg_set_structured  | re-serialize on read-back|
  * | v0_msg_get_meta        | throws on a missing key (functions.go:219) |
  * | v0_msg_set_meta        | set a metadata key       |
  * | v0_msg_exists_meta     | boolean                  |
  *
  * The PROGRAM parses once per partition (the reference pools goja VMs
  * the same way); per row the parsed AST re-evaluates over fresh
  * globals plus the message-bound `bento`. A thrown JS error lands in
  * the error facet with content unchanged.
  */
object Javascript {

  private final class MsgState(var content: String, var meta: Map[String, String]) {
    var structured: Js.V = null // lazily parsed; flushed on read-back
    def asString: String = {
      if (structured != null) { content = graft.blob.Interp.marshalJson(Js.toStructured(structured)); structured = null }
      content
    }
  }

  private def bentoObj(st: MsgState): Js.V = {
    import scala.collection.mutable
    VObj(mutable.LinkedHashMap(
      "v0_msg_as_string" -> VNative("v0_msg_as_string", _ => VStr(st.asString)),
      "v0_msg_set_string" -> VNative("v0_msg_set_string", args => {
        st.structured = null; st.content = toStringValue(args.head); VUndef
      }),
      "v0_msg_as_structured" -> VNative("v0_msg_as_structured", _ => {
        if (st.structured == null)
          st.structured =
            try Js.fromStructured(graft.blob.Interp.parseJsonTyped(st.content))
            catch { case e: Exception =>
              throw JsError(VStr(s"failed to parse message as structured: ${e.getMessage}")) }
        st.structured
      }),
      "v0_msg_set_structured" -> VNative("v0_msg_set_structured", args => {
        st.structured = args.head; VUndef
      }),
      "v0_msg_get_meta" -> VNative("v0_msg_get_meta", args => {
        val k = toStringValue(args.head)
        st.meta.get(k).map(VStr(_)).getOrElse(
          throw JsError(VStr(s"metadata key $k does not exist")))
      }),
      "v0_msg_set_meta" -> VNative("v0_msg_set_meta", args => {
        st.meta = st.meta + (toStringValue(args.head) -> toStringValue(args(1))); VUndef
      }),
      "v0_msg_exists_meta" -> VNative("v0_msg_exists_meta", args =>
        VBool(st.meta.contains(toStringValue(args.head))))))
  }

  /** run `code` against one (content, meta); Right((content', meta')) or
    * Left(error). Exposed for specs; the DataFrame operator rides it. */
  def runOnce(program: Vector[Js.Stmt], content: String,
              meta: Map[String, String]): Either[String, (String, Map[String, String])] = {
    val st = new MsgState(content, meta)
    try {
      new Js.Interp(Map("bento" -> bentoObj(st))).run(program)
      Right((st.asString, st.meta))
    } catch {
      case JsError(v) => Left(toStringValue(v))
      case e: IllegalArgumentException => Left(s"js: ${e.getMessage}")
    }
  }

  /** envelope in, envelope out — the proc_java/proc_python shape */
  def processor(code: String)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(Msg.ContentCol), col(Msg.MetaCol), col(Msg.ErrorCol))
      .as[(String, Map[String, String], String)]
      .mapPartitions { it =>
        val program = Js.parse(code) // once per partition, like the VM pool
        it.map { case (content, meta, err) =>
          if (err != null || content == null) (content, meta, err)
          else runOnce(program, content, if (meta == null) Map.empty else meta) match {
            case Right((c2, m2)) => (c2, m2, null: String)
            case Left(e) => (content, meta, e)
          }
        }
      }.toDF(Msg.ContentCol, Msg.MetaCol, Msg.ErrorCol)
  }
}
