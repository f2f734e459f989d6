package graft

import graft.core.Msg
import graft.operators.Python
import org.apache.spark.sql.functions._

/** The python processor contract: this→root mapping, None deletion,
  * poison messages into the error facet (stream survives), imports,
  * and the one-interpreter-per-partition lifecycle. */
class PythonSpec extends SparkSpec {

  test("worker: this/root mapping, deletion, and exception capture") {
    val w = new Python.Worker(
      """root = {"n": this["n"] * 2}
        |if this["n"] == 3: root = None
        |if this["n"] == 4: raise ValueError("boom %d" % this["n"])
        |""".stripMargin, Nil)
    try {
      assert(w.process("""{"n": 2}""") == Right(Some("""{"n":4}""")))
      assert(w.process("""{"n": 3}""") == Right(None), "root=None deletes")
      assert(w.process("""{"n": 4}""") == Left("ValueError: boom 4"))
      assert(w.process("""{"n": 5}""") == Right(Some("""{"n":10}""")),
        "the interpreter survives the exception")
      assert(w.process("""not json""").swap.exists(_.startsWith("JSONDecodeError")),
        "unparseable content is a per-message error, not a crash")
    } finally w.close()
  }

  test("non-JSON-serializable root is a per-message error, not a worker death") {
    val w = new Python.Worker(
      """if this["k"] == "set": root = {"s": set([1, 2])}
        |elif this["k"] == "nan": root = {"x": float("nan")}
        |else: root = {"ok": this["k"]}
        |""".stripMargin, Nil)
    try {
      assert(w.process("""{"k": "set"}""").swap.exists(_.startsWith("TypeError")),
        "a set in root serializes to a TypeError frame")
      assert(w.process("""{"k": "nan"}""").swap.exists(_.startsWith("ValueError")),
        "NaN with allow_nan=False is a ValueError frame")
      assert(w.process("""{"k": "fine"}""") == Right(Some("""{"ok":"fine"}""")),
        "the interpreter survives both")
    } finally w.close()
  }

  test("imports bind modules into the script's globals") {
    val w = new Python.Worker("""root = {"c": math.ceil(this["v"])}""", Seq("math"))
    try assert(w.process("""{"v": 3.2}""") == Right(Some("""{"c":4}""")))
    finally w.close()
  }

  test("processor: envelope mapping with deletions dropped and poison rows error-faceted") {
    import spark.implicits._
    val env = Msg.envelope(Seq((1L, 10.0), (2L, 205.5), (3L, -1.0), (4L, 7.0))
      .toDF("id", "v"))
    val out = Python.processor(
      """if this["v"] < 0: raise ValueError("negative")
        |if this["id"] == 4:
        |    root = None
        |else:
        |    root = {"id": this["id"], "s": this["v"] * 2, "hi": this["v"] > 100}
        |""".stripMargin)(env)
    val rows = out.select(col(Msg.ContentCol), col(Msg.ErrorCol)).collect()
    assert(rows.length == 3, "id=4 deleted; errored id=3 retained")
    val errored = rows.filter(_.getString(1) != null)
    assert(errored.length == 1 && errored.head.getString(1) == "ValueError: negative")
    assert(errored.head.getString(0).contains("\"id\":3"), "content unchanged on error")
    val ok = out.filter(Msg.ok)
      .select(get_json_object(col(Msg.ContentCol), "$.id").cast("long"),
        get_json_object(col(Msg.ContentCol), "$.s").cast("double"),
        get_json_object(col(Msg.ContentCol), "$.hi").cast("boolean"))
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(ok.toSeq == Seq((1L, 20.0, false), (2L, 411.0, true)))
  }
}
