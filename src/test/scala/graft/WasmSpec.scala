package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Wasm
import graft.operators.Wasm.{Asm, Instance, WasmTrap}
import graft.operators.Wasm.Asm._

/** The from-scratch WebAssembly MVP interpreter (operators/Wasm.scala).
  * Modules are hand-assembled with Wasm.Asm — built independently of the
  * decoder under test, the same vector discipline as KafkaSpec's
  * hand-computed frames. */
class WasmSpec extends AnyFunSuite {

  private def inst(bin: Array[Byte], host: Map[(String, String), Wasm.HostFunc] = Map.empty) =
    new Instance(Wasm.decode(bin), host)

  /** One exported (i32, i32) -> i32 function with the given body. */
  private def binOpModule(body: Array[Byte], locals: Seq[(Int, Int)] = Nil): Array[Byte] =
    Asm.module(
      types = Seq(funcType(Seq(I32, I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(FuncDef(0, locals, body)),
      memPages = 1,
      exports = Seq(("f", 0)))

  test("LEB128: unsigned and signed round-trip through the decoder") {
    // assembler emits, decoder reads — the i32.const immediate crosses both
    for (v <- Seq(0, 1, 63, 64, 127, 128, 12345, -1, -64, -65, Int.MaxValue, Int.MinValue)) {
      val m = Asm.module(
        types = Seq(funcType(Nil, Seq(I32))),
        imports = Nil,
        funcs = Seq(FuncDef(0, Nil, i32const(v))),
        memPages = 1, exports = Seq(("f", 0)))
      assert(inst(m).invoke("f").head.toInt === v, s"const $v")
    }
  }

  test("i32 arithmetic, division traps, unsigned compare") {
    val add = binOpModule(localGet(0) ++ localGet(1) ++ I32Add)
    assert(inst(add).invoke("f", Vector(5, 7)).head === 12L)
    // wrap-around is mod 2^32
    assert(inst(add).invoke("f", Vector(0xffffffffL, 1)).head === 0L)
    val divS = binOpModule(localGet(0) ++ localGet(1) ++ Array(0x6d.toByte))
    assert(inst(divS).invoke("f", Vector(-7 & 0xffffffffL, 2)).head === (-3L & 0xffffffffL))
    intercept[WasmTrap](inst(divS).invoke("f", Vector(1, 0)))
    val remU = binOpModule(localGet(0) ++ localGet(1) ++ Array(0x70.toByte))
    assert(inst(remU).invoke("f", Vector(0xffffffffL, 10)).head === (0xffffffffL % 10))
    val ltU = binOpModule(localGet(0) ++ localGet(1) ++ I32LtU)
    assert(inst(ltU).invoke("f", Vector(0xffffffffL, 1)).head === 0L) // unsigned: max > 1
    assert(inst(ltU).invoke("f", Vector(1, 0xffffffffL)).head === 1L)
  }

  test("i64 and float arithmetic through raw-bits stack discipline") {
    val m = Asm.module(
      types = Seq(funcType(Seq(I64, I64), Seq(I64)), funcType(Seq(F64, F64), Seq(F64))),
      imports = Nil,
      funcs = Seq(
        FuncDef(0, Nil, localGet(0) ++ localGet(1) ++ Array(0x7e.toByte)), // i64.mul
        FuncDef(1, Nil, localGet(0) ++ localGet(1) ++ Array(0xa3.toByte))), // f64.div
      memPages = 1,
      exports = Seq(("mul", 0), ("fdiv", 1)))
    assert(inst(m).invoke("mul", Vector(123456789L, 987654321L)).head ===
      123456789L * 987654321L)
    val q = inst(m).invoke("fdiv", Vector(
      java.lang.Double.doubleToRawLongBits(1.0), java.lang.Double.doubleToRawLongBits(3.0))).head
    assert(java.lang.Double.longBitsToDouble(q) === 1.0 / 3.0)
  }

  test("control flow: block/loop/br_if computes a sum; if/else; br_table") {
    // sum 1..n with a loop
    val sum = Asm.module(
      types = Seq(funcType(Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(FuncDef(0, Seq((2, I32)), // locals: 1 = i, 2 = acc
        i32const(0) ++ localSet(1) ++ i32const(0) ++ localSet(2) ++
          block(loop(
            localGet(1) ++ localGet(0) ++ I32GeU ++ brIf(1) ++
              localGet(1) ++ i32const(1) ++ I32Add ++ localTee(1) ++
              localGet(2) ++ I32Add ++ localSet(2) ++
              br(0))) ++
          localGet(2))),
      memPages = 1, exports = Seq(("sum", 0)))
    assert(inst(sum).invoke("sum", Vector(10)).head === 55L)
    assert(inst(sum).invoke("sum", Vector(0)).head === 0L)
    // if/else
    val max = binOpModule(
      localGet(0) ++ localGet(1) ++ I32GeS ++
        ifElse(localGet(0) ++ localSet(2), localGet(1) ++ localSet(2)) ++ localGet(2),
      locals = Seq((1, I32)))
    assert(inst(max).invoke("f", Vector(3, 9)).head === 9L)
    assert(inst(max).invoke("f", Vector(9, 3)).head === 9L)
    // br_table: case 0 -> 10, case 1 -> 20, default -> 99
    val table = Asm.module(
      types = Seq(funcType(Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(FuncDef(0, Seq((1, I32)),
        block(block(block(
          localGet(0) ++
            Array(0x0e.toByte, 2.toByte, 0.toByte, 1.toByte, 2.toByte)) ++ // br_table [0 1] 2
          i32const(10) ++ localSet(1) ++ br(1)) ++
          i32const(20) ++ localSet(1) ++ br(0)) ++
          // default lands past all blocks only via depth 2; set it first then overwritten paths br out
          localGet(1) ++
          localGet(1) ++ I32Eqz ++ ifOnly(i32const(99) ++ localSet(1)) ++ Array(0x1a.toByte) ++
          localGet(1))),
      memPages = 1, exports = Seq(("f", 0)))
    assert(inst(table).invoke("f", Vector(0)).head === 10L)
    assert(inst(table).invoke("f", Vector(1)).head === 20L)
    assert(inst(table).invoke("f", Vector(7)).head === 99L)
  }

  test("memory: loads, stores, data segments, bounds traps, memory.grow") {
    val m = Asm.module(
      types = Seq(funcType(Seq(I32), Seq(I32)), funcType(Nil, Seq(I32))),
      imports = Nil,
      funcs = Seq(
        FuncDef(0, Nil, localGet(0) ++ load8u(0)), // peek byte
        FuncDef(1, Nil, // grow by 1 page, return old size
          i32const(1) ++ Array(0x40.toByte, 0.toByte))),
      memPages = 1,
      exports = Seq(("peek", 0), ("grow", 1)),
      data = Seq((8, "AB".getBytes("UTF-8"))))
    val i = inst(m)
    assert(i.invoke("peek", Vector(8)).head === 'A'.toLong)
    assert(i.invoke("peek", Vector(9)).head === 'B'.toLong)
    assert(i.invoke("peek", Vector(10)).head === 0L)
    intercept[WasmTrap](i.invoke("peek", Vector(65536))) // past page 0
    assert(i.invoke("grow").head === 1L) // old size 1 page
    assert(i.invoke("peek", Vector(65536)).head === 0L) // now valid
  }

  test("calls: guest-to-guest and host imports; globals persist across calls") {
    var hostCalls = Vector.empty[Long]
    val host: Map[(String, String), Wasm.HostFunc] = Map(
      ("env", "observe") -> { args => hostCalls ++= args; Vector.empty })
    val m = Asm.module(
      types = Seq(funcType(Seq(I32), Nil), funcType(Seq(I32), Seq(I32)), funcType(Nil, Seq(I32))),
      imports = Seq(("env", "observe", 0)), // func 0
      funcs = Seq(
        FuncDef(1, Nil, // func 1: double(x) = x * 2, reports to host
          localGet(0) ++ call(0) ++ localGet(0) ++ i32const(2) ++ I32Mul),
        FuncDef(2, Nil, // func 2: counter() = ++global
          globalGet(0) ++ i32const(1) ++ I32Add ++ globalSet(0) ++ globalGet(0))),
      memPages = 1,
      globalsInit = Seq(100),
      exports = Seq(("double", 1), ("counter", 2)))
    val i = inst(m, host)
    assert(i.invoke("double", Vector(21)).head === 42L)
    assert(hostCalls === Vector(21L))
    assert(i.invoke("counter").head === 101L)
    assert(i.invoke("counter").head === 102L)
    // a fresh instance restarts globals — instance isolation
    assert(inst(m, host).invoke("counter").head === 101L)
  }

  test("unreachable and unresolved imports trap") {
    val m = Asm.module(
      types = Seq(funcType(Nil, Nil)),
      imports = Nil,
      funcs = Seq(FuncDef(0, Nil, Array(0x00.toByte))),
      memPages = 1, exports = Seq(("boom", 0)))
    intercept[WasmTrap](inst(m).invoke("boom"))
    val needsImport = Asm.module(
      types = Seq(funcType(Nil, Nil)),
      imports = Seq(("nowhere", "missing", 0)),
      funcs = Seq(FuncDef(0, Nil, Array.emptyByteArray)),
      memPages = 1, exports = Seq(("f", 1)))
    intercept[WasmTrap](inst(needsImport))
  }

  // -------------------------------------------------- the v0 message ABI

  test("uppercase module: full bento_wasm ABI round-trip (the reference's example)") {
    val runner = new Wasm.Runner(Wasm.decode(Asm.uppercaseModule()), "process")
    val (content, meta) = runner.run("hello world 123", Map("k" -> "v"))
    assert(content === "HELLO WORLD 123")
    assert(meta === Map("k" -> "v", "processor" -> "wasm"))
    // repeated runs on the same pooled runner: bump allocator keeps moving,
    // results stay correct (the reference reuses pooled runners the same way)
    val (c2, _) = runner.run("second Message!", Map.empty)
    assert(c2 === "SECOND MESSAGE!")
    val (c3, _) = runner.run("", Map.empty)
    assert(c3 === "")
  }

  test("wasm processor over a DataFrame: content rewritten, meta stamped, traps land in the error facet") {
    val spark = SparkSpec.session
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, map, monotonically_increasing_id}
    import org.apache.spark.sql.types.{MapType, StringType}
    val env = Seq("alpha", "Bravo c", "DONE").toDF("text").select(
      col("text").as(graft.core.Msg.ContentCol),
      map().cast(MapType(StringType, StringType)).as(graft.core.Msg.MetaCol),
      lit(null).cast(StringType).as(graft.core.Msg.ErrorCol),
      monotonically_increasing_id().as(graft.core.Msg.SeqCol))
    val out = Wasm.processor(Asm.uppercaseModule())(env)
    val rows = out.select(graft.core.Msg.ContentCol, graft.core.Msg.MetaCol)
      .collect()
      .map(r => (r.getString(0), r.getMap[String, String](1).toMap))
    assert(rows.map(_._1).sorted === Array("ALPHA", "BRAVO C", "DONE"))
    assert(rows.forall(_._2.get("processor").contains("wasm")))
    // a module whose process() traps: rows keep content, error facet set
    val trapping = Asm.module(
      types = Seq(funcType(Nil, Nil), funcType(Seq(I32), Seq(I32))),
      imports = Nil,
      funcs = Seq(
        FuncDef(0, Nil, Array(0x00.toByte)),
        FuncDef(1, Nil, localGet(0))), // malloc: identity (never reached)
      memPages = 1, exports = Seq(("process", 0), ("malloc", 1)))
    val bad = Wasm.processor(trapping)(env)
    val errs = bad.select(graft.core.Msg.ErrorCol).as[String].collect()
    assert(errs.forall(e => e != null && e.contains("unreachable")))
  }
}
