package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.conn.{Lua, Resp}
import graft.conn.Lua._

/** The from-scratch Lua 5.1 subset (conn/Lua.scala) and its redis EVAL
  * embedding (Resp.MiniRedis). Semantics asserted against the PUBLIC
  * Lua 5.1 manual and the redis programmability docs' conversion
  * tables. */
class LuaSpec extends AnyFunSuite {

  private def eval(src: String, extra: Map[String, V] = Map.empty): V =
    Lua.run(Lua.compile(src), extra).headOption.getOrElse(LNil)

  // ------------------------------------------------------------- language

  test("arithmetic, precedence, floored modulo, power right-assoc") {
    assert(eval("return 1 + 2 * 3") === LNum(7))
    assert(eval("return (1 + 2) * 3") === LNum(9))
    assert(eval("return 2 ^ 3 ^ 2") === LNum(512)) // right associative
    assert(eval("return -7 % 3") === LNum(2)) // Lua mod is floored
    assert(eval("return 7 % -3") === LNum(-2))
    assert(eval("return 10 / 4") === LNum(2.5))
    assert(eval("return '10' + 5") === LNum(15)) // string coercion
  }

  test("number formatting: integers print without decimal point") {
    assert(eval("return tostring(10)") === LStr("10"))
    assert(eval("return tostring(10.5)") === LStr("10.5"))
    assert(eval("return 1 .. 2") === LStr("12"))
    assert(eval("return 'v' .. 3.0") === LStr("v3"))
  }

  test("comparison and equality are type-strict") {
    assert(eval("return 1 == '1'") === LBool(false))
    assert(eval("return 1 ~= '1'") === LBool(true))
    assert(eval("return 'abc' < 'abd'") === LBool(true))
    intercept[LuaError](eval("return 1 < 'x'"))
  }

  test("and/or short-circuit and return operand values") {
    assert(eval("return nil or 'dflt'") === LStr("dflt"))
    assert(eval("return false and error('never')") === LBool(false))
    assert(eval("return 1 and 2") === LNum(2))
    assert(eval("return nil and 2") === LNil)
  }

  test("locals, scoping, global assignment") {
    assert(eval("local x = 1 do local x = 2 end return x") === LNum(1))
    assert(eval("x = 5 local function f() return x end x = 6 return f()") === LNum(6))
    assert(eval("local a, b = 1 return b") === LNil)
    assert(eval("local a, b = 1, 2, 3 return a + b") === LNum(3))
  }

  test("if/elseif/else, while with break, repeat-until") {
    assert(eval("local x = 3 if x > 5 then return 'big' elseif x > 1 then return 'mid' else return 'small' end") === LStr("mid"))
    assert(eval("local n = 0 while true do n = n + 1 if n >= 4 then break end end return n") === LNum(4))
    assert(eval("local n = 0 repeat n = n + 1 local done = n >= 3 until done return n") === LNum(3))
  }

  test("numeric for incl. negative step; generic for over pairs/ipairs") {
    assert(eval("local s = 0 for i = 1, 5 do s = s + i end return s") === LNum(15))
    assert(eval("local s = '' for i = 3, 1, -1 do s = s .. i end return s") === LStr("321"))
    assert(eval("local t = {10, 20, 30} local s = 0 for i, v in ipairs(t) do s = s + i * v end return s") === LNum(140))
    assert(eval("local t = {a = 1, b = 2} local s = 0 for k, v in pairs(t) do s = s + v end return s") === LNum(3))
    // ipairs stops at the first nil hole
    assert(eval("local t = {1, 2} t[4] = 4 local n = 0 for _, v in ipairs(t) do n = n + 1 end return n") === LNum(2))
  }

  test("tables: constructor forms, nesting, length border, nil deletes") {
    assert(eval("local t = {1, 2, x = 9, [10] = 'ten'} return t[2] + t.x") === LNum(11))
    assert(eval("local t = {list = {4, 5}} return t.list[2]") === LNum(5))
    assert(eval("return #({'a', 'b', 'c'})") === LNum(3))
    assert(eval("local t = {1, 2, 3} t[3] = nil return #t") === LNum(2))
    assert(eval("local t = {} t[1.0] = 'x' return t[1]") === LStr("x")) // key normalization
    assert(eval("return #'héllo'") === LNum(6)) // byte length, not chars
  }

  test("functions: recursion, closures, multiple returns, method sugar") {
    assert(eval("local function fib(n) if n < 2 then return n end return fib(n-1) + fib(n-2) end return fib(10)") === LNum(55))
    assert(eval("local function mk() local n = 0 return function() n = n + 1 return n end end local c = mk() c() c() return c()") === LNum(3))
    assert(eval("local function two() return 1, 2 end local a, b = two() return a + b") === LNum(3))
    // only the LAST expr in a list expands
    assert(eval("local function two() return 1, 2 end local t = {two(), two()} return #t") === LNum(3))
    assert(eval("local obj = {base = 10} function obj.get(self, k) return self.base + k end return obj:get(5)") === LNum(15))
  }

  test("stdlib: tonumber/tostring/type/string/table/math") {
    assert(eval("return tonumber('0x1f')") === LNum(31))
    assert(eval("return tonumber('ff', 16)") === LNum(255))
    assert(eval("return tonumber('nope')") === LNil)
    assert(eval("return type({})") === LStr("table"))
    assert(eval("return string.sub('hello world', 1, 5)") === LStr("hello"))
    assert(eval("return string.sub('hello', -3)") === LStr("llo"))
    assert(eval("return string.format('%s=%d (%.2f)', 'k', 42, 1.5)") === LStr("k=42 (1.50)"))
    assert(eval("return string.rep('ab', 3)") === LStr("ababab"))
    assert(eval("local t = {3, 1} table.insert(t, 2) return table.concat(t, ',')") === LStr("3,1,2"))
    assert(eval("local t = {1, 2, 3} table.insert(t, 1, 9) return table.concat(t, '')") === LStr("9123"))
    assert(eval("local t = {1, 2, 3} local x = table.remove(t) return x .. #t") === LStr("32"))
    assert(eval("return math.floor(3.7) + math.ceil(3.2) + math.max(1, 5, 3) + math.min(2, 8)") === LNum(14))
  }

  test("error/pcall/assert; next() detects empty tables (the reference example idiom)") {
    assert(eval("local ok, err = pcall(function() error('boom') end) return tostring(ok) .. ':' .. err") === LStr("false:boom"))
    assert(eval("local ok, v = pcall(function() return 7 end) return v") === LNum(7))
    intercept[LuaError](eval("assert(false, 'nope')"))
    assert(eval("if next({}) == nil then return 'empty' end return 'full'") === LStr("empty"))
    assert(eval("if next({1}) == nil then return 'empty' end return 'full'") === LStr("full"))
  }

  test("cjson encode/decode round-trips arrays and objects") {
    assert(eval("""return cjson.encode({1, 'two', true})""") === LStr("""[1,"two",true]"""))
    assert(eval("""return cjson.encode({k = 'v'})""") === LStr("""{"k":"v"}"""))
    assert(eval("""local t = cjson.decode('{"a": [1, 2, {"b": null}]}') return t.a[2]""") === LNum(2))
    assert(eval("""local t = cjson.decode('{"a": {"b": 3.5}}') return t.a.b""") === LNum(3.5))
  }

  test("comments and long strings lex correctly") {
    assert(eval("-- line comment\nreturn 1 --[[ long\ncomment ]] + 1") === LNum(2))
    assert(eval("return [[raw\nstring]]") === LStr("raw\nstring"))
  }

  test("runaway scripts hit the instruction budget instead of hanging") {
    val e = intercept[LuaError](eval("while true do end"))
    assert(e.getMessage.contains("instruction budget"))
  }

  // ----------------------------------------------- redis EVAL integration

  /** Resp.Bulk wraps Array[Byte] (reference equality); compare via a
    * string rendering. */
  private def norm(v: Resp.Value): String = v match {
    case Resp.Bulk(null) => "nil"
    case Resp.Bulk(d) => s"bulk:${new String(d, "UTF-8")}"
    case Resp.Int64(n) => s"int:$n"
    case Resp.Simple(s) => s"ok:$s"
    case Resp.Err(m) => s"err:$m"
    case Resp.Arr(null) => "nilarr"
    case Resp.Arr(xs) => xs.map(norm).mkString("[", ",", "]")
  }

  private def withRedis(f: Resp.Client => Unit): Unit = {
    val srv = new Resp.MiniRedis().start()
    val c = new Resp.Client("127.0.0.1", srv.port)
    try f(c) finally { c.close(); srv.stop() }
  }

  test("EVAL: KEYS/ARGV binding and redis.call state round-trip") {
    withRedis { c =>
      val r = c.cmd("EVAL", "redis.call('SET', KEYS[1], ARGV[1]) return redis.call('GET', KEYS[1])", "1", "k", "v1")
      assert(norm(r) === "bulk:v1")
      assert(c.str("GET", "k") === "v1")
    }
  }

  test("EVAL conversion table: number/bool/table/status/error returns") {
    withRedis { c =>
      assert(c.cmd("EVAL", "return 3.7", "0") === Resp.Int64(3)) // numbers truncate
      assert(c.cmd("EVAL", "return true", "0") === Resp.Int64(1))
      assert(c.cmd("EVAL", "return false", "0") === Resp.NullBulk)
      assert(c.cmd("EVAL", "return nil", "0") === Resp.NullBulk)
      assert(norm(c.cmd("EVAL", "return {1, 'two', 3}", "0")) === "[int:1,bulk:two,int:3]")
      // array conversion stops at the first nil
      assert(norm(c.cmd("EVAL", "return {1, nil, 3}", "0")) === "[int:1]")
      assert(c.cmd("EVAL", "return redis.status_reply('GOOD')", "0") === Resp.Simple("GOOD"))
      val e = intercept[Resp.RedisErrorException](c.cmd("EVAL", "return redis.error_reply('my error')", "0"))
      assert(e.getMessage === "my error")
      // GET on a missing key reaches Lua as false
      assert(norm(c.cmd("EVAL", "local v = redis.call('GET', 'missing') if v == false then return 'absent' end return v", "0")) ===
        "bulk:absent")
    }
  }

  test("redis.call errors abort the script; redis.pcall surfaces the error table") {
    withRedis { c =>
      c.cmd("LPUSH", "alist", "x")
      val e = intercept[Resp.RedisErrorException](
        c.cmd("EVAL", "redis.call('INCR', 'alist') return 'unreached'", "0"))
      assert(e.getMessage.contains("WRONGTYPE"))
      val r = c.cmd("EVAL",
        "local res = redis.pcall('INCR', 'alist') if res.err then return 'caught' end return 'no'", "0")
      assert(norm(r) === "bulk:caught")
    }
  }

  test("EVALSHA + SCRIPT LOAD/EXISTS cache contract (the go-redis Script.Run path)") {
    withRedis { c =>
      val src = "return redis.call('INCRBY', KEYS[1], ARGV[1])"
      val e = intercept[Resp.RedisErrorException](c.cmd("EVALSHA", "0" * 40, "1", "n", "5"))
      assert(e.getMessage.startsWith("NOSCRIPT"))
      val sha = c.str("SCRIPT", "LOAD", src)
      assert(sha.length === 40)
      assert(c.cmd("SCRIPT", "EXISTS", sha, "0" * 40) ===
        Resp.Arr(Vector(Resp.Int64(1), Resp.Int64(0))))
      assert(c.cmd("EVALSHA", sha, "1", "n", "5") === Resp.Int64(5))
      assert(c.cmd("EVALSHA", sha, "1", "n", "3") === Resp.Int64(8))
      // plain EVAL also populates the cache
      c.cmd("EVAL", "return 1", "0")
      val sha2 = java.security.MessageDigest.getInstance("SHA-1")
        .digest("return 1".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(c.cmd("EVALSHA", sha2, "0") === Resp.Int64(1))
    }
  }

  test("a real fixed-window rate limiter script enforces its limit") {
    withRedis { c =>
      // the canonical INCR+EXPIRE rate-limit pattern from the redis docs
      val src =
        """local current = redis.call('INCR', KEYS[1])
          |if current == 1 then
          |  redis.call('PEXPIRE', KEYS[1], ARGV[1])
          |end
          |if current > tonumber(ARGV[2]) then
          |  return 0
          |end
          |return 1
          |""".stripMargin
      val allowed = (1 to 5).map(_ => c.long("EVAL", src, "1", "rl:u1", "60000", "3"))
      assert(allowed === Vector(1, 1, 1, 0, 0))
    }
  }

  test("redis.sha1hex matches SHA-1") {
    withRedis { c =>
      assert(c.str("EVAL", "return redis.sha1hex('')", "0") ===
        "da39a3ee5e6b4b0d3255bfef95601890afd80709")
    }
  }
}
