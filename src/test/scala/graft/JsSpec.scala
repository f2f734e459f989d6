package graft

import graft.operators.{Javascript, Js}
import graft.operators.Js._
import org.scalatest.funsuite.AnyFunSuite

/** The ES5.1-subset interpreter + the javascript processor's bento
  * surface. The two processor examples published in the reference's
  * own docs (impl/javascript/processor.go:78-101) run VERBATIM. */
class JsSpec extends AnyFunSuite {

  private def evalJs(src: String, globals: Map[String, V] = Map.empty): V =
    new Js.Interp(globals).run(Js.parse(src))

  test("numbers render like JS: whole numbers without a decimal point") {
    assert(toStringValue(evalJs("1 + 2")) == "3")
    assert(toStringValue(evalJs("0.1 + 0.2")) == "0.30000000000000004")
    assert(toStringValue(evalJs("10 / 4")) == "2.5")
    assert(toStringValue(evalJs("'n=' + 42")) == "n=42")
    assert(toStringValue(evalJs("7 % 3")) == "1")
  }

  test("language basics: let/const, if/else, loops, functions, closures, ternary") {
    assert(evalJs("let x = 3; x += 4; x") == VNum(7))
    assert(evalJs("let s = 0; for (let i = 1; i <= 10; i++) { s += i; } s") == VNum(55))
    assert(evalJs("let s = 0; for (let v of [1,2,3]) s += v; s") == VNum(6))
    assert(evalJs("function f(a, b) { return a * b; } f(6, 7)") == VNum(42))
    assert(evalJs("const add = (a) => (b) => a + b; add(2)(3)") == VNum(5),
      "arrow closures")
    assert(evalJs("let n = 5; n > 3 ? 'big' : 'small'") == VStr("big"))
    assert(evalJs("let i = 0; while (true) { i++; if (i === 4) break; } i") == VNum(4))
    assert(evalJs("typeof 'x' + '/' + typeof 1 + '/' + typeof undefined") ==
      VStr("string/number/undefined"))
  }

  test("objects and arrays: literals, member assignment, delete, methods") {
    assert(evalJs("let o = {a: 1, 'b c': 2}; o.a + o['b c']") == VNum(3))
    assert(evalJs("let o = {a: 1, b: 2}; delete o.b; Object.keys(o).join(',')") == VStr("a"))
    assert(evalJs("[1,2,3,4].filter((x) => x % 2 === 0).map((x) => x * 10).join('-')") ==
      VStr("20-40"))
    assert(evalJs("[1,2,3].reduce((a, b) => a + b, 10)") == VNum(16))
    assert(evalJs("let a = []; a.push(1); a.push(2, 3); a.length") == VNum(3))
    assert(evalJs("'Hello World'.toLowerCase().split(' ')[1]") == VStr("world"))
    assert(evalJs("'abcdef'.slice(1, -1)") == VStr("bcde"))
    assert(evalJs("JSON.stringify(JSON.parse('{\"a\":[1,2]}').a)") == VStr("[1,2]"))
  }

  test("throw / try-catch; errors carry their value") {
    assert(evalJs("let r; try { throw 'boom'; } catch (e) { r = 'got:' + e; } r") ==
      VStr("got:boom"))
    val e = intercept[JsError](evalJs("null.x"))
    assert(toStringValue(e.value).contains("Cannot read properties of null"))
  }

  test("finally runs on the normal path, after catch, and rethrows when uncaught (ES5.1 §12.14)") {
    // normal path: finally must run
    assert(evalJs("let r = ''; try { r += 'a'; } finally { r += 'f'; } r") == VStr("af"))
    // throwing path with catch: catch then finally
    assert(evalJs("let r = ''; try { throw 'x'; } catch (e) { r += 'c'; } finally { r += 'f'; } r") ==
      VStr("cf"))
    // try/finally with NO catch: finally runs AND the error propagates
    val e = intercept[JsError](evalJs("let r = ''; try { throw 'boom'; } finally { r = 'ran'; }"))
    assert(e.value == VStr("boom"))
    // finally observes side effects and runs even when catch rethrows
    assert(evalJs(
      """let log = '';
        |function f() { try { throw 'e1'; } catch (e) { log += 'c'; throw 'e2'; } finally { log += 'f'; } }
        |try { f(); } catch (e) { log += ':' + e; }
        |log""".stripMargin) == VStr("cf:e2"))
    // finally runs on the return path out of a function
    assert(evalJs(
      """let log = '';
        |function g() { try { return 'r'; } finally { log += 'f'; } }
        |g() + log""".stripMargin) == VStr("rf"))
  }

  test("try with neither catch nor finally is a SyntaxError (ES5.1 §12.14 grammar)") {
    val e = intercept[IllegalArgumentException](Js.parse("try { 1 + 1; }"))
    assert(e.getMessage.contains("SyntaxError"))
    // with either clause present the statement parses fine
    evalJs("try { 1; } catch (e) {}")
    evalJs("try { 1; } finally {}")
  }

  test("the reference's documented Example 1 runs verbatim (string mutation)") {
    val code = """bento.v0_msg_set_string(bento.v0_msg_as_string() + "hello world");"""
    val Right((content, _)) = Javascript.runOnce(Js.parse(code), "prefix-", Map.empty): @unchecked
    assert(content == "prefix-hello world")
  }

  test("the reference's documented Example 2 runs verbatim (structured mutation IIFE)") {
    val code =
      """(() => {
        |  let thing = bento.v0_msg_as_structured();
        |  thing.num_keys = Object.keys(thing).length;
        |  delete thing["b"];
        |  bento.v0_msg_set_structured(thing);
        |})();
        |""".stripMargin
    val Right((content, _)) = Javascript.runOnce(Js.parse(code),
      """{"a":1,"b":2,"c":3}""", Map.empty): @unchecked
    assert(content == """{"a":1,"c":3,"num_keys":3}""")
  }

  test("bento meta surface: get throws on missing (documented), set/exists work") {
    val code =
      """if (bento.v0_msg_exists_meta('k')) {
        |  bento.v0_msg_set_meta('seen', bento.v0_msg_get_meta('k'));
        |}
        |bento.v0_msg_set_meta('mark', 'yes');
        |""".stripMargin
    val Right((_, meta)) = Javascript.runOnce(Js.parse(code), "c", Map("k" -> "v")): @unchecked
    assert(meta == Map("k" -> "v", "seen" -> "v", "mark" -> "yes"))
    val missing = Javascript.runOnce(Js.parse("bento.v0_msg_get_meta('nope');"), "c", Map.empty)
    assert(missing == Left("metadata key nope does not exist"))
  }

  test("as_structured on non-JSON throws (the documented behavior) into the error facet") {
    val r = Javascript.runOnce(Js.parse("bento.v0_msg_as_structured();"), "not json", Map.empty)
    assert(r.swap.exists(_.startsWith("failed to parse message as structured")))
  }

  test("processor over an envelope: mapping, meta, and error-facet routing") {
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    import spark.implicits._
    val env = graft.core.Msg.envelope(Seq((1L, 10.0), (2L, 200.0), (3L, -5.0)).toDF("id", "v"))
    val out = Javascript.processor(
      """(() => {
        |  let m = bento.v0_msg_as_structured();
        |  if (m.v < 0) throw "negative value";
        |  m.grade = m.v > 100 ? "hi" : "lo";
        |  m.scaled = m.v * 2 + m.id;
        |  bento.v0_msg_set_structured(m);
        |  bento.v0_msg_set_meta("src", "js");
        |})();
        |""".stripMargin)(env)
    val rows = out.orderBy(get_json_object(col(graft.core.Msg.ContentCol), "$.id"))
      .select(col(graft.core.Msg.ContentCol), col(graft.core.Msg.ErrorCol),
        col(graft.core.Msg.MetaCol)("src")).collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0).contains("\"grade\":\"lo\"") &&
      rows(0).getString(0).contains("\"scaled\":21"))
    assert(rows(1).getString(0).contains("\"grade\":\"hi\"") &&
      rows(1).getString(0).contains("\"scaled\":402"))
    assert(rows(2).getString(1) == "negative value", "thrown value in the error facet")
    assert(rows(2).getString(0).contains("\"v\":-5"), "content unchanged on error")
    assert(rows(0).getString(2) == "js" && rows(2).getString(2) == null)
  }
}
