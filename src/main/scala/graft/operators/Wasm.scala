package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions.{coalesce, col, udf}

/** `wasm` processor — executes a function exported by a WebAssembly
  * module for each message (impl/wasm/processor_wazero.go:21). The
  * reference embeds the wazero runtime; no wasm runtime exists on this
  * classpath, so this is a from-scratch WebAssembly MVP interpreter
  * built from the PUBLIC spec (W3C WebAssembly Core 1.0): binary module
  * decoding (LEB128, type/import/function/memory/global/export/start/
  * code/data sections), a tree-walking evaluator over structured
  * control flow, linear memory with bounds-trapped access, and the full
  * numeric instruction set (i32/i64/f32/f64 arithmetic, comparison,
  * conversion and reinterpret ops).
  *
  * The host ABI mirrors the reference 1:1 (impl/wasm/functions.go):
  * module `bento_wasm` exports `v0_msg_as_bytes() -> i64` (ptr<<32|len,
  * inbound content allocated via the guest's own `malloc`/`allocate`),
  * `v0_msg_set_bytes(ptr, len)`, `v0_msg_get_meta(kptr, klen) -> i64`
  * and `v0_msg_set_meta(kptr, klen, vptr, vlen)`; the guest exports the
  * processed function (default `process`) plus its allocator — the same
  * contract the reference's Go/Rust example modules compile against.
  * Each task thread holds its own instantiated module (the reference
  * pools runners for the same reason, processor_wazero.go:57
  * "not possible to execute a single WASM runtime across parallel
  * threads"); decode happens once per JVM per module hash.
  *
  * Declared out: WASI preview1 (the reference instantiates it for
  * TinyGo's sake; fixture modules here are freestanding), `call_indirect`
  * tables, and SIMD/reference-types/multi-value post-MVP proposals.
  */
object Wasm {

  final class WasmTrap(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------- decoding

  private final class Reader(val buf: Array[Byte], var pos: Int = 0) {
    def u8(): Int = { val b = buf(pos) & 0xff; pos += 1; b }
    def u32(): Long = { // LEB128 unsigned
      var result = 0L; var shift = 0; var b = 0
      do { b = u8(); result |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      result
    }
    def s32(): Int = s64().toInt
    def s64(): Long = { // LEB128 signed
      var result = 0L; var shift = 0; var b = 0
      do { b = u8(); result |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      if (shift < 64 && (b & 0x40) != 0) result |= -1L << shift
      result
    }
    def f32(): Long = {
      var v = 0L
      var i = 0
      while (i < 4) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def f64(): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def bytes(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; out
    }
    def name(): String = new String(bytes(u32().toInt), UTF_8)
    def hasMore: Boolean = pos < buf.length
  }

  /** Function signature: parameter and result value types (0x7f i32,
    * 0x7e i64, 0x7d f32, 0x7c f64). MVP: at most one result. */
  final case class FuncType(params: Vector[Int], results: Vector[Int])

  private final case class Import(module: String, name: String, typeIdx: Int)
  private final case class Export(name: String, kind: Int, idx: Int)
  private final case class GlobalDef(valType: Int, mutable: Boolean, init: Long)
  private final case class FuncBody(typeIdx: Int, localTypes: Vector[Int], body: Vector[I])
  private final case class DataSeg(offset: Int, bytes: Array[Byte])

  /** Decoded module (immutable; instantiate per thread). */
  final class Module private[Wasm] (
      private[Wasm] val types: Vector[FuncType],
      private[Wasm] val imports: Vector[Import],
      private[Wasm] val funcs: Vector[FuncBody],
      private[Wasm] val memMinPages: Int,
      private[Wasm] val memMaxPages: Int,
      private[Wasm] val globals: Vector[GlobalDef],
      private[Wasm] val exports: Vector[Export],
      private[Wasm] val startIdx: Option[Int],
      private[Wasm] val data: Vector[DataSeg]) {
    def exportedFunc(name: String): Option[Int] =
      exports.find(e => e.name == name && e.kind == 0).map(_.idx)
  }

  // structured-instruction tree
  sealed trait I
  private final case class Op(code: Int, a: Long = 0, b: Long = 0) extends I
  private final case class BlockI(body: Vector[I]) extends I
  private final case class LoopI(body: Vector[I]) extends I
  private final case class IfI(thn: Vector[I], els: Vector[I]) extends I
  private final case class BrTableI(targets: Vector[Int], default: Int) extends I

  def decode(bin: Array[Byte]): Module = {
    val r = new Reader(bin)
    if (r.u8() != 0 || r.u8() != 'a' || r.u8() != 's' || r.u8() != 'm')
      throw new WasmTrap("bad wasm magic")
    val ver = (r.u8() | (r.u8() << 8) | (r.u8() << 16) | (r.u8() << 24))
    if (ver != 1) throw new WasmTrap(s"unsupported wasm version $ver")

    var types = Vector.empty[FuncType]
    var imports = Vector.empty[Import]
    var funcTypeIdxs = Vector.empty[Int]
    var memMin = 0; var memMax = 65536
    var globals = Vector.empty[GlobalDef]
    var exports = Vector.empty[Export]
    var startIdx: Option[Int] = None
    var bodies = Vector.empty[(Vector[Int], Vector[I])]
    var data = Vector.empty[DataSeg]

    while (r.hasMore) {
      val secId = r.u8()
      val secLen = r.u32().toInt
      val secEnd = r.pos + secLen
      secId match {
        case 1 => // types
          val n = r.u32().toInt
          types = Vector.fill(n) {
            if (r.u8() != 0x60) throw new WasmTrap("expected functype")
            val params = Vector.fill(r.u32().toInt)(r.u8())
            val results = Vector.fill(r.u32().toInt)(r.u8())
            if (results.length > 1) throw new WasmTrap("multi-value results unsupported")
            FuncType(params, results)
          }
        case 2 => // imports
          val n = r.u32().toInt
          imports = Vector.fill(n) {
            val mod = r.name(); val nm = r.name()
            r.u8() match {
              case 0 => Import(mod, nm, r.u32().toInt)
              case k => throw new WasmTrap(s"only function imports supported (kind $k)")
            }
          }
        case 3 => // function type indices
          funcTypeIdxs = Vector.fill(r.u32().toInt)(r.u32().toInt)
        case 5 => // memory
          val n = r.u32().toInt
          if (n > 1) throw new WasmTrap("multiple memories unsupported")
          if (n == 1) {
            val flags = r.u8()
            memMin = r.u32().toInt
            if ((flags & 1) != 0) memMax = r.u32().toInt
          }
        case 6 => // globals
          globals = Vector.fill(r.u32().toInt) {
            val vt = r.u8()
            val mut = r.u8() == 1
            val init = constExpr(r)
            GlobalDef(vt, mut, init)
          }
        case 7 => // exports
          exports = Vector.fill(r.u32().toInt) {
            val nm = r.name(); Export(nm, r.u8(), r.u32().toInt)
          }
        case 8 => startIdx = Some(r.u32().toInt)
        case 10 => // code
          bodies = Vector.fill(r.u32().toInt) {
            val size = r.u32().toInt
            val end = r.pos + size
            val localTypes = (0 until r.u32().toInt).flatMap { _ =>
              val count = r.u32().toInt; val t = r.u8(); Vector.fill(count)(t)
            }.toVector
            val body = decodeInstrs(r, end)
            r.pos = end
            (localTypes, body)
          }
        case 11 => // data
          data = Vector.fill(r.u32().toInt) {
            val flags = r.u32().toInt
            if (flags != 0) throw new WasmTrap("only active memory-0 data segments supported")
            val off = constExpr(r).toInt
            DataSeg(off, r.bytes(r.u32().toInt))
          }
        case _ => r.pos = secEnd // custom/table/element: skip
      }
      r.pos = secEnd
    }
    val funcs = funcTypeIdxs.zip(bodies).map { case (t, (lt, b)) => FuncBody(t, lt, b) }
    new Module(types, imports, funcs, memMin, memMax, globals, exports, startIdx, data)
  }

  /** Init expressions: `<const> end` only (imports of globals unsupported). */
  private def constExpr(r: Reader): Long = {
    val v = r.u8() match {
      case 0x41 => r.s32().toLong & 0xffffffffL
      case 0x42 => r.s64()
      case 0x43 => r.f32()
      case 0x44 => r.f64()
      case op => throw new WasmTrap(s"unsupported init expr opcode 0x${op.toHexString}")
    }
    if (r.u8() != 0x0b) throw new WasmTrap("init expr not terminated")
    v
  }

  private def blockType(r: Reader): Unit = {
    val bt = r.u8()
    // 0x40 empty or a single valtype; s33 type indices are post-MVP multi-value
    if (bt != 0x40 && bt != 0x7f && bt != 0x7e && bt != 0x7d && bt != 0x7c)
      throw new WasmTrap(s"unsupported block type 0x${bt.toHexString}")
  }

  private def decodeInstrs(r: Reader, end: Int): Vector[I] = {
    val out = Vector.newBuilder[I]
    var done = false
    while (!done && r.pos < end) {
      val op = r.u8()
      op match {
        case 0x0b => done = true // end
        case 0x05 => r.pos -= 1; done = true // else: caller handles
        case 0x02 => blockType(r); out += BlockI(decodeInstrs(r, end))
        case 0x03 => blockType(r); out += LoopI(decodeInstrs(r, end))
        case 0x04 =>
          blockType(r)
          val thn = decodeInstrs(r, end)
          val els = if (r.pos < end && (r.buf(r.pos) & 0xff) == 0x05) {
            r.pos += 1; decodeInstrs(r, end)
          } else Vector.empty[I]
          out += IfI(thn, els)
        case 0x0e =>
          val n = r.u32().toInt
          val targets = Vector.fill(n)(r.u32().toInt)
          out += BrTableI(targets, r.u32().toInt)
        case 0x0c | 0x0d | 0x10 => out += Op(op, r.u32())
        case 0x20 | 0x21 | 0x22 | 0x23 | 0x24 => out += Op(op, r.u32())
        case x if x >= 0x28 && x <= 0x3e => // loads/stores: align + offset
          val align = r.u32(); val offset = r.u32()
          out += Op(op, offset, align)
        case 0x3f | 0x40 => r.u8(); out += Op(op) // memory.size/grow: reserved byte
        case 0x41 => out += Op(op, r.s32().toLong)
        case 0x42 => out += Op(op, r.s64())
        case 0x43 => out += Op(op, r.f32())
        case 0x44 => out += Op(op, r.f64())
        case _ => out += Op(op) // no immediates
      }
    }
    out.result()
  }

  // ----------------------------------------------------------- evaluation

  private val PageSize = 65536

  /** A host import: raw-Long args in, raw-Long results out (i32 in low
    * bits, floats as raw bits). */
  type HostFunc = Vector[Long] => Vector[Long]

  /** One instantiated module: its own linear memory and globals. NOT
    * thread-safe — one per task thread, like the reference's pooled
    * module runners. */
  final class Instance(module: Module, hostFuncs: Map[(String, String), HostFunc]) {
    private[Wasm] var memory: Array[Byte] = new Array[Byte](module.memMinPages * PageSize)
    private val globals: Array[Long] = module.globals.map(_.init).toArray
    private val importCount = module.imports.length
    private val boundImports: Vector[HostFunc] = module.imports.map { imp =>
      hostFuncs.getOrElse((imp.module, imp.name),
        throw new WasmTrap(s"unresolved import ${imp.module}.${imp.name}"))
    }

    module.data.foreach { seg =>
      if (seg.offset + seg.bytes.length > memory.length)
        throw new WasmTrap("data segment out of bounds")
      System.arraycopy(seg.bytes, 0, memory, seg.offset, seg.bytes.length)
    }
    module.startIdx.foreach(invokeByIndex(_, Vector.empty))

    def invoke(name: String, args: Vector[Long] = Vector.empty): Vector[Long] =
      invokeByIndex(module.exportedFunc(name).getOrElse(
        throw new WasmTrap(s"no exported function '$name'")), args)

    def invokeByIndex(funcIdx: Int, args: Vector[Long]): Vector[Long] = {
      if (funcIdx < importCount) return boundImports(funcIdx)(args)
      val fb = module.funcs(funcIdx - importCount)
      val ft = module.types(fb.typeIdx)
      val locals = new Array[Long](ft.params.length + fb.localTypes.length)
      args.copyToArray(locals)
      val stack = new LongStack
      val sig = exec(fb.body, locals, stack)
      if (sig != SigNone && sig != SigReturn && sig != 0)
        throw new WasmTrap("branch escaped function body")
      ft.results.map(_ => stack.pop())
    }

    // read/write helpers with bounds traps
    private def checkMem(addr: Long, size: Int): Int = {
      if (addr < 0 || addr + size > memory.length)
        throw new WasmTrap(s"out of bounds memory access at $addr+$size (mem ${memory.length})")
      addr.toInt
    }
    def readBytes(ptr: Int, len: Int): Array[Byte] = {
      val a = checkMem(ptr.toLong & 0xffffffffL, len)
      java.util.Arrays.copyOfRange(memory, a, a + len)
    }
    def writeBytes(ptr: Int, data: Array[Byte]): Unit = {
      val a = checkMem(ptr.toLong & 0xffffffffL, data.length)
      System.arraycopy(data, 0, memory, a, data.length)
    }
    private def loadN(addr: Long, n: Int): Long = {
      val a = checkMem(addr, n)
      var v = 0L
      var i = 0
      while (i < n) { v |= (memory(a + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    private def storeN(addr: Long, n: Int, v: Long): Unit = {
      val a = checkMem(addr, n)
      var i = 0
      while (i < n) { memory(a + i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    }

    // branch signals: >=0 relative label depth, or sentinels
    private val SigNone = -1
    private val SigReturn = Int.MinValue

    private def exec(body: Vector[I], locals: Array[Long], stack: LongStack): Int = {
      var i = 0
      while (i < body.length) {
        body(i) match {
          case BlockI(inner) =>
            val sig = exec(inner, locals, stack)
            if (sig == 0) () // branch to this block: fall out
            else if (sig > 0) return sig - 1
            else if (sig == SigReturn) return SigReturn
          case LoopI(inner) =>
            var looping = true
            while (looping) {
              val sig = exec(inner, locals, stack)
              if (sig == 0) () // branch to a loop label: continue
              else if (sig > 0) return sig - 1
              else if (sig == SigReturn) return SigReturn
              else looping = false
            }
          case IfI(thn, els) =>
            val sig = exec(if (stack.pop() != 0) thn else els, locals, stack)
            if (sig == 0) ()
            else if (sig > 0) return sig - 1
            else if (sig == SigReturn) return SigReturn
          case BrTableI(targets, default) =>
            val idx = stack.pop().toInt
            return if (idx >= 0 && idx < targets.length) targets(idx) else default
          case Op(code, a, b) =>
            val sig = execOp(code, a, b, locals, stack)
            if (sig != SigNone) return sig
        }
        i += 1
      }
      SigNone
    }

    private def i32(v: Long): Long = v & 0xffffffffL
    private def si32(v: Long): Int = v.toInt
    private def f32of(bits: Long): Float = java.lang.Float.intBitsToFloat(bits.toInt)
    private def f32bits(f: Float): Long = java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL
    private def f64of(bits: Long): Double = java.lang.Double.longBitsToDouble(bits)
    private def f64bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
    private def bool(b: Boolean): Long = if (b) 1L else 0L

    private def execOp(code: Int, a: Long, b: Long, locals: Array[Long], st: LongStack): Int = {
      code match {
        case 0x00 => throw new WasmTrap("unreachable executed")
        case 0x01 => () // nop
        case 0x0c => return a.toInt // br
        case 0x0d => if (st.pop() != 0) return a.toInt // br_if
        case 0x0f => return Int.MinValue // return
        case 0x10 => // call
          val funcIdx = a.toInt
          val ft =
            if (funcIdx < importCount) module.types(module.imports(funcIdx).typeIdx)
            else module.types(module.funcs(funcIdx - importCount).typeIdx)
          val args = Vector.fill(ft.params.length)(st.pop()).reverse
          invokeByIndex(funcIdx, args).foreach(st.push)
        case 0x11 => throw new WasmTrap("call_indirect unsupported (declared)")
        case 0x1a => st.pop() // drop
        case 0x1b => // select
          val c = st.pop(); val v2 = st.pop(); val v1 = st.pop()
          st.push(if (c != 0) v1 else v2)
        case 0x20 => st.push(locals(a.toInt))
        case 0x21 => locals(a.toInt) = st.pop()
        case 0x22 => locals(a.toInt) = st.peek
        case 0x23 => st.push(globals(a.toInt))
        case 0x24 =>
          if (!module.globals(a.toInt).mutable) throw new WasmTrap("global.set on immutable global")
          globals(a.toInt) = st.pop()

        // loads (a = static offset)
        case 0x28 => st.push(i32(loadN(i32(st.pop()) + a, 4)))
        case 0x29 => st.push(loadN(i32(st.pop()) + a, 8))
        case 0x2a => st.push(loadN(i32(st.pop()) + a, 4))
        case 0x2b => st.push(loadN(i32(st.pop()) + a, 8))
        case 0x2c => st.push(i32(loadN(i32(st.pop()) + a, 1).toByte.toLong))
        case 0x2d => st.push(loadN(i32(st.pop()) + a, 1))
        case 0x2e => st.push(i32(loadN(i32(st.pop()) + a, 2).toShort.toLong))
        case 0x2f => st.push(loadN(i32(st.pop()) + a, 2))
        case 0x30 => st.push(loadN(i32(st.pop()) + a, 1).toByte.toLong)
        case 0x31 => st.push(loadN(i32(st.pop()) + a, 1))
        case 0x32 => st.push(loadN(i32(st.pop()) + a, 2).toShort.toLong)
        case 0x33 => st.push(loadN(i32(st.pop()) + a, 2))
        case 0x34 => st.push(loadN(i32(st.pop()) + a, 4).toInt.toLong)
        case 0x35 => st.push(loadN(i32(st.pop()) + a, 4))
        // stores
        case 0x36 => { val v = st.pop(); storeN(i32(st.pop()) + a, 4, v) }
        case 0x37 => { val v = st.pop(); storeN(i32(st.pop()) + a, 8, v) }
        case 0x38 => { val v = st.pop(); storeN(i32(st.pop()) + a, 4, v) }
        case 0x39 => { val v = st.pop(); storeN(i32(st.pop()) + a, 8, v) }
        case 0x3a => { val v = st.pop(); storeN(i32(st.pop()) + a, 1, v) }
        case 0x3b => { val v = st.pop(); storeN(i32(st.pop()) + a, 2, v) }
        case 0x3c => { val v = st.pop(); storeN(i32(st.pop()) + a, 1, v) }
        case 0x3d => { val v = st.pop(); storeN(i32(st.pop()) + a, 2, v) }
        case 0x3e => { val v = st.pop(); storeN(i32(st.pop()) + a, 4, v) }
        case 0x3f => st.push(memory.length / PageSize)
        case 0x40 =>
          val delta = si32(st.pop())
          val cur = memory.length / PageSize
          if (delta < 0 || cur + delta > module.memMaxPages) st.push(i32(-1))
          else {
            memory = java.util.Arrays.copyOf(memory, (cur + delta) * PageSize)
            st.push(cur)
          }

        case 0x41 => st.push(i32(a))
        case 0x42 => st.push(a)
        case 0x43 => st.push(a)
        case 0x44 => st.push(a)

        // i32 comparison
        case 0x45 => st.push(bool(si32(st.pop()) == 0))
        case 0x46 => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) == y)) }
        case 0x47 => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) != y)) }
        case 0x48 => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) < y)) }
        case 0x49 => { val y = i32(st.pop()); st.push(bool(i32(st.pop()) < y)) }
        case 0x4a => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) > y)) }
        case 0x4b => { val y = i32(st.pop()); st.push(bool(i32(st.pop()) > y)) }
        case 0x4c => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) <= y)) }
        case 0x4d => { val y = i32(st.pop()); st.push(bool(i32(st.pop()) <= y)) }
        case 0x4e => { val y = si32(st.pop()); st.push(bool(si32(st.pop()) >= y)) }
        case 0x4f => { val y = i32(st.pop()); st.push(bool(i32(st.pop()) >= y)) }
        // i64 comparison
        case 0x50 => st.push(bool(st.pop() == 0))
        case 0x51 => { val y = st.pop(); st.push(bool(st.pop() == y)) }
        case 0x52 => { val y = st.pop(); st.push(bool(st.pop() != y)) }
        case 0x53 => { val y = st.pop(); st.push(bool(st.pop() < y)) }
        case 0x54 => { val y = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(st.pop(), y) < 0)) }
        case 0x55 => { val y = st.pop(); st.push(bool(st.pop() > y)) }
        case 0x56 => { val y = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(st.pop(), y) > 0)) }
        case 0x57 => { val y = st.pop(); st.push(bool(st.pop() <= y)) }
        case 0x58 => { val y = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(st.pop(), y) <= 0)) }
        case 0x59 => { val y = st.pop(); st.push(bool(st.pop() >= y)) }
        case 0x5a => { val y = st.pop(); st.push(bool(java.lang.Long.compareUnsigned(st.pop(), y) >= 0)) }
        // f32 comparison
        case 0x5b => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) == y)) }
        case 0x5c => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) != y)) }
        case 0x5d => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) < y)) }
        case 0x5e => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) > y)) }
        case 0x5f => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) <= y)) }
        case 0x60 => { val y = f32of(st.pop()); st.push(bool(f32of(st.pop()) >= y)) }
        // f64 comparison
        case 0x61 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) == y)) }
        case 0x62 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) != y)) }
        case 0x63 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) < y)) }
        case 0x64 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) > y)) }
        case 0x65 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) <= y)) }
        case 0x66 => { val y = f64of(st.pop()); st.push(bool(f64of(st.pop()) >= y)) }

        // i32 arithmetic
        case 0x67 => st.push(java.lang.Integer.numberOfLeadingZeros(si32(st.pop())).toLong)
        case 0x68 => st.push(java.lang.Integer.numberOfTrailingZeros(si32(st.pop())).toLong)
        case 0x69 => st.push(java.lang.Integer.bitCount(si32(st.pop())).toLong)
        case 0x6a => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) + y)) }
        case 0x6b => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) - y)) }
        case 0x6c => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) * y)) }
        case 0x6d =>
          val y = si32(st.pop()); val x = si32(st.pop())
          if (y == 0) throw new WasmTrap("integer divide by zero")
          if (x == Int.MinValue && y == -1) throw new WasmTrap("integer overflow")
          st.push(i32(x / y))
        case 0x6e =>
          val y = si32(st.pop()); val x = si32(st.pop())
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(i32(java.lang.Integer.divideUnsigned(x, y)))
        case 0x6f =>
          val y = si32(st.pop()); val x = si32(st.pop())
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(i32(if (y == -1) 0 else x % y))
        case 0x70 =>
          val y = si32(st.pop()); val x = si32(st.pop())
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(i32(java.lang.Integer.remainderUnsigned(x, y)))
        case 0x71 => { val y = st.pop(); st.push(i32(st.pop() & y)) }
        case 0x72 => { val y = st.pop(); st.push(i32(st.pop() | y)) }
        case 0x73 => { val y = st.pop(); st.push(i32(st.pop() ^ y)) }
        case 0x74 => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) << (y & 31))) }
        case 0x75 => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) >> (y & 31))) }
        case 0x76 => { val y = si32(st.pop()); st.push(i32(si32(st.pop()) >>> (y & 31))) }
        case 0x77 => { val y = si32(st.pop()); st.push(i32(java.lang.Integer.rotateLeft(si32(st.pop()), y))) }
        case 0x78 => { val y = si32(st.pop()); st.push(i32(java.lang.Integer.rotateRight(si32(st.pop()), y))) }
        // i64 arithmetic
        case 0x79 => st.push(java.lang.Long.numberOfLeadingZeros(st.pop()).toLong)
        case 0x7a => st.push(java.lang.Long.numberOfTrailingZeros(st.pop()).toLong)
        case 0x7b => st.push(java.lang.Long.bitCount(st.pop()).toLong)
        case 0x7c => { val y = st.pop(); st.push(st.pop() + y) }
        case 0x7d => { val y = st.pop(); st.push(st.pop() - y) }
        case 0x7e => { val y = st.pop(); st.push(st.pop() * y) }
        case 0x7f =>
          val y = st.pop(); val x = st.pop()
          if (y == 0) throw new WasmTrap("integer divide by zero")
          if (x == Long.MinValue && y == -1) throw new WasmTrap("integer overflow")
          st.push(x / y)
        case 0x80 =>
          val y = st.pop(); val x = st.pop()
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(java.lang.Long.divideUnsigned(x, y))
        case 0x81 =>
          val y = st.pop(); val x = st.pop()
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(if (y == -1) 0 else x % y)
        case 0x82 =>
          val y = st.pop(); val x = st.pop()
          if (y == 0) throw new WasmTrap("integer divide by zero")
          st.push(java.lang.Long.remainderUnsigned(x, y))
        case 0x83 => { val y = st.pop(); st.push(st.pop() & y) }
        case 0x84 => { val y = st.pop(); st.push(st.pop() | y) }
        case 0x85 => { val y = st.pop(); st.push(st.pop() ^ y) }
        case 0x86 => { val y = st.pop(); st.push(st.pop() << (y & 63)) }
        case 0x87 => { val y = st.pop(); st.push(st.pop() >> (y & 63)) }
        case 0x88 => { val y = st.pop(); st.push(st.pop() >>> (y & 63)) }
        case 0x89 => { val y = st.pop(); st.push(java.lang.Long.rotateLeft(st.pop(), y.toInt)) }
        case 0x8a => { val y = st.pop(); st.push(java.lang.Long.rotateRight(st.pop(), y.toInt)) }
        // f32 arithmetic
        case 0x8b => st.push(f32bits(math.abs(f32of(st.pop()))))
        case 0x8c => st.push(f32bits(-f32of(st.pop())))
        case 0x8d => st.push(f32bits(math.ceil(f32of(st.pop()).toDouble).toFloat))
        case 0x8e => st.push(f32bits(math.floor(f32of(st.pop()).toDouble).toFloat))
        case 0x8f => st.push(f32bits(f32of(st.pop()).toLong.toFloat)) // trunc (finite fixture range)
        case 0x90 => st.push(f32bits(math.rint(f32of(st.pop()).toDouble).toFloat))
        case 0x91 => st.push(f32bits(math.sqrt(f32of(st.pop()).toDouble).toFloat))
        case 0x92 => { val y = f32of(st.pop()); st.push(f32bits(f32of(st.pop()) + y)) }
        case 0x93 => { val y = f32of(st.pop()); st.push(f32bits(f32of(st.pop()) - y)) }
        case 0x94 => { val y = f32of(st.pop()); st.push(f32bits(f32of(st.pop()) * y)) }
        case 0x95 => { val y = f32of(st.pop()); st.push(f32bits(f32of(st.pop()) / y)) }
        case 0x96 => { val y = f32of(st.pop()); st.push(f32bits(math.min(f32of(st.pop()), y))) }
        case 0x97 => { val y = f32of(st.pop()); st.push(f32bits(math.max(f32of(st.pop()), y))) }
        case 0x98 => { val y = f32of(st.pop()); st.push(f32bits(java.lang.Math.copySign(f32of(st.pop()), y))) }
        // f64 arithmetic
        case 0x99 => st.push(f64bits(math.abs(f64of(st.pop()))))
        case 0x9a => st.push(f64bits(-f64of(st.pop())))
        case 0x9b => st.push(f64bits(math.ceil(f64of(st.pop()))))
        case 0x9c => st.push(f64bits(math.floor(f64of(st.pop()))))
        case 0x9d => st.push(f64bits(f64of(st.pop()).toLong.toDouble))
        case 0x9e => st.push(f64bits(math.rint(f64of(st.pop()))))
        case 0x9f => st.push(f64bits(math.sqrt(f64of(st.pop()))))
        case 0xa0 => { val y = f64of(st.pop()); st.push(f64bits(f64of(st.pop()) + y)) }
        case 0xa1 => { val y = f64of(st.pop()); st.push(f64bits(f64of(st.pop()) - y)) }
        case 0xa2 => { val y = f64of(st.pop()); st.push(f64bits(f64of(st.pop()) * y)) }
        case 0xa3 => { val y = f64of(st.pop()); st.push(f64bits(f64of(st.pop()) / y)) }
        case 0xa4 => { val y = f64of(st.pop()); st.push(f64bits(math.min(f64of(st.pop()), y))) }
        case 0xa5 => { val y = f64of(st.pop()); st.push(f64bits(math.max(f64of(st.pop()), y))) }
        case 0xa6 => { val y = f64of(st.pop()); st.push(f64bits(java.lang.Math.copySign(f64of(st.pop()), y))) }
        // conversions
        case 0xa7 => st.push(i32(st.pop())) // i32.wrap_i64
        case 0xa8 => st.push(i32(f32of(st.pop()).toInt.toLong)) // i32.trunc_f32_s
        case 0xa9 => st.push(i32(f32of(st.pop()).toLong)) // i32.trunc_f32_u
        case 0xaa => st.push(i32(f64of(st.pop()).toInt.toLong)) // i32.trunc_f64_s
        case 0xab => st.push(i32(f64of(st.pop()).toLong)) // i32.trunc_f64_u
        case 0xac => st.push(si32(st.pop()).toLong) // i64.extend_i32_s
        case 0xad => st.push(i32(st.pop())) // i64.extend_i32_u
        case 0xae => st.push(f32of(st.pop()).toLong) // i64.trunc_f32_s
        case 0xaf => st.push(f32of(st.pop()).toLong)
        case 0xb0 => st.push(f64of(st.pop()).toLong) // i64.trunc_f64_s
        case 0xb1 => st.push(f64of(st.pop()).toLong)
        case 0xb2 => st.push(f32bits(si32(st.pop()).toFloat)) // f32.convert_i32_s
        case 0xb3 => st.push(f32bits(i32(st.pop()).toFloat))
        case 0xb4 => st.push(f32bits(st.pop().toFloat)) // f32.convert_i64_s
        case 0xb5 => st.push(f32bits(st.pop().toFloat))
        case 0xb6 => st.push(f32bits(f64of(st.pop()).toFloat)) // f32.demote_f64
        case 0xb7 => st.push(f64bits(si32(st.pop()).toDouble)) // f64.convert_i32_s
        case 0xb8 => st.push(f64bits(i32(st.pop()).toDouble))
        case 0xb9 => st.push(f64bits(st.pop().toDouble)) // f64.convert_i64_s
        case 0xba => st.push(f64bits(st.pop().toDouble))
        case 0xbb => st.push(f64bits(f32of(st.pop()).toDouble)) // f64.promote_f32
        case 0xbc => st.push(i32(st.pop())) // i32.reinterpret_f32 (both raw bits)
        case 0xbd => () // i64.reinterpret_f64: raw bits already
        case 0xbe => st.push(i32(st.pop())) // f32.reinterpret_i32
        case 0xbf => () // f64.reinterpret_i64
        case other => throw new WasmTrap(f"unsupported opcode 0x$other%02x")
      }
      -1
    }
  }

  private final class LongStack {
    private var arr = new Array[Long](64)
    private var n = 0
    def push(v: Long): Unit = {
      if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
      arr(n) = v; n += 1
    }
    def pop(): Long = {
      if (n == 0) throw new WasmTrap("operand stack underflow")
      n -= 1; arr(n)
    }
    def peek: Long = {
      if (n == 0) throw new WasmTrap("operand stack underflow")
      arr(n - 1)
    }
  }

  // ----------------------------------------------------- bento_wasm ABI

  /** Per-message state + the four v0 host functions (functions.go). */
  final class Runner(module: Module, function: String) {
    private var content: Array[Byte] = Array.emptyByteArray
    private var meta: Map[String, String] = Map.empty

    private val hostFuncs: Map[(String, String), HostFunc] = Map(
      ("bento_wasm", "v0_msg_as_bytes") -> { _ =>
        val ptr = allocInbound(content)
        Vector((ptr.toLong << 32) | content.length.toLong)
      },
      ("bento_wasm", "v0_msg_set_bytes") -> { args =>
        content = instance.readBytes(args(0).toInt, args(1).toInt)
        Vector.empty
      },
      ("bento_wasm", "v0_msg_get_meta") -> { args =>
        val key = new String(instance.readBytes(args(0).toInt, args(1).toInt), UTF_8)
        val v = meta.getOrElse(key, "").getBytes(UTF_8)
        val ptr = allocInbound(v)
        Vector((ptr.toLong << 32) | v.length.toLong)
      },
      ("bento_wasm", "v0_msg_set_meta") -> { args =>
        val key = new String(instance.readBytes(args(0).toInt, args(1).toInt), UTF_8)
        val v = new String(instance.readBytes(args(2).toInt, args(3).toInt), UTF_8)
        meta = meta + (key -> v)
        Vector.empty
      })

    private val instance = new Instance(module, hostFuncs)
    private val alloc: Vector[Long] => Vector[Long] = {
      // go modules export malloc/free; rust allocate/deallocate
      // (processor_wazero.go:128-132 probes both)
      val name = Seq("malloc", "allocate").find(module.exportedFunc(_).isDefined)
        .getOrElse(throw new WasmTrap("module exports neither malloc nor allocate"))
      args => instance.invoke(name, args)
    }

    private def allocInbound(data: Array[Byte]): Int = {
      val ptr = alloc(Vector(data.length.toLong)).headOption
        .getOrElse(throw new WasmTrap("allocator returned no pointer")).toInt
      instance.writeBytes(ptr, data)
      ptr
    }

    /** Run the exported function against one message. */
    def run(content0: String, meta0: Map[String, String]): (String, Map[String, String]) = {
      content = (if (content0 == null) "" else content0).getBytes(UTF_8)
      meta = meta0
      instance.invoke(function)
      (new String(content, UTF_8), meta)
    }
  }

  // ------------------------------------------------------------ processor

  // decode once per JVM per module; instantiate once per task thread (the
  // runner's linear memory is mutable state — the reference pools for the
  // same reason)
  private val moduleCache = new ConcurrentHashMap[String, Module]()
  private val runnerCache = new ConcurrentHashMap[String, ThreadLocal[Runner]]()

  private def sha(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b).map("%02x".format(_)).mkString

  /** The `wasm` processor: run `function` from the module against each
    * message; guest mutations of content/metadata flow back through the
    * v0 ABI. Traps land in the error facet (the reference returns the
    * error and the part is dropped/nacked; here the row carries the
    * error for try/catch/DLQ routing, the processor-family contract). */
  def processor(moduleBytes: Array[Byte], function: String = "process",
                contentCol: String = graft.core.Msg.ContentCol,
                metaCol: String = graft.core.Msg.MetaCol): graft.core.Processor = {
    val key = sha(moduleBytes) + ":" + function
    moduleCache.computeIfAbsent(key, _ => decode(moduleBytes)) // driver-side fail-fast
    val binary = moduleBytes
    val f = udf { (content: String, meta: Map[String, String]) =>
      val mod = moduleCache.computeIfAbsent(key, _ => decode(binary))
      val runner = runnerCache.computeIfAbsent(key,
        _ => ThreadLocal.withInitial(() => new Runner(mod, function))).get()
      try {
        val (c, m) = runner.run(content, if (meta == null) Map.empty[String, String] else meta)
        (c, m, null: String)
      } catch {
        case e: WasmTrap => (content, meta, s"wasm: ${e.getMessage}")
      }
    }
    graft.core.Processor("wasm") { df =>
      df.withColumn("_wasm", f(col(contentCol), col(metaCol)))
        .withColumn(contentCol, col("_wasm._1"))
        .withColumn(metaCol, col("_wasm._2"))
        .withColumn(graft.core.Msg.ErrorCol,
          coalesce(col(graft.core.Msg.ErrorCol), col("_wasm._3")))
        .drop("_wasm")
    }
  }

  // ------------------------------------------------- fixture assembler

  /** Minimal wasm binary assembler — fixture tooling for building the
    * test/gate modules in-sandbox (no wasm toolchain exists here; the
    * reference ships pre-compiled example .wasm files and skips its tests
    * when they are absent, processor_wazero_test.go:21). Hand-assembled
    * binaries play the role KafkaSpec's hand-computed frames do: spec
    * vectors built independently of the decoder under test. */
  object Asm {
    val I32 = 0x7f; val I64 = 0x7e; val F32 = 0x7d; val F64 = 0x7c

    def uleb(v: Long): Array[Byte] = {
      val out = Array.newBuilder[Byte]
      var x = v
      var more = true
      while (more) {
        val b = (x & 0x7f).toInt
        x >>>= 7
        if (x == 0) { out += b.toByte; more = false } else out += (b | 0x80).toByte
      }
      out.result()
    }
    def sleb(v: Long): Array[Byte] = {
      val out = Array.newBuilder[Byte]
      var x = v
      var more = true
      while (more) {
        val b = (x & 0x7f).toInt
        x >>= 7
        if ((x == 0 && (b & 0x40) == 0) || (x == -1 && (b & 0x40) != 0)) { out += b.toByte; more = false }
        else out += (b | 0x80).toByte
      }
      out.result()
    }
    def vec(items: Seq[Array[Byte]]): Array[Byte] =
      uleb(items.length) ++ items.flatten
    def name(s: String): Array[Byte] = {
      val b = s.getBytes(UTF_8); uleb(b.length) ++ b
    }
    def section(id: Int, body: Array[Byte]): Array[Byte] =
      Array(id.toByte) ++ uleb(body.length) ++ body

    def funcType(params: Seq[Int], results: Seq[Int]): Array[Byte] =
      Array(0x60.toByte) ++ vec(params.map(t => Array(t.toByte))) ++ vec(results.map(t => Array(t.toByte)))

    final case class FuncDef(typeIdx: Int, locals: Seq[(Int, Int)], body: Array[Byte])

    /** Assemble a module: types, imports (all from `bento_wasm`), funcs,
      * one memory, mutable i32 globals, exports (name → func index), and
      * active data segments. */
    def module(types: Seq[Array[Byte]],
               imports: Seq[(String, String, Int)],
               funcs: Seq[FuncDef],
               memPages: Int,
               globalsInit: Seq[Int] = Nil,
               exports: Seq[(String, Int)] = Nil,
               data: Seq[(Int, Array[Byte])] = Nil): Array[Byte] = {
      val header = Array[Byte](0, 'a', 's', 'm', 1, 0, 0, 0)
      val typeSec = section(1, vec(types))
      val importSec = if (imports.isEmpty) Array.emptyByteArray
        else section(2, vec(imports.map { case (m, n, t) =>
          name(m) ++ name(n) ++ Array(0.toByte) ++ uleb(t) }))
      val funcSec = section(3, vec(funcs.map(f => uleb(f.typeIdx))))
      val memSec = section(5, vec(Seq(Array(0.toByte) ++ uleb(memPages))))
      val globalSec = if (globalsInit.isEmpty) Array.emptyByteArray
        else section(6, vec(globalsInit.map(v =>
          Array(I32.toByte, 1.toByte, 0x41.toByte) ++ sleb(v) ++ Array(0x0b.toByte))))
      val exportSec = section(7, vec(exports.map { case (n, idx) =>
        name(n) ++ Array(0.toByte) ++ uleb(idx) }))
      val codeSec = section(10, vec(funcs.map { f =>
        val locals = vec(f.locals.map { case (count, t) => uleb(count) ++ Array(t.toByte) })
        val body = locals ++ f.body ++ Array(0x0b.toByte)
        uleb(body.length) ++ body
      }))
      val dataSec = if (data.isEmpty) Array.emptyByteArray
        else section(11, vec(data.map { case (off, bytes) =>
          uleb(0) ++ Array(0x41.toByte) ++ sleb(off) ++ Array(0x0b.toByte) ++ uleb(bytes.length) ++ bytes }))
      header ++ typeSec ++ importSec ++ funcSec ++ memSec ++ globalSec ++ exportSec ++ codeSec ++ dataSec
    }

    // opcode emitters for fixture bodies
    def i32const(v: Int): Array[Byte] = Array(0x41.toByte) ++ sleb(v)
    def i64const(v: Long): Array[Byte] = Array(0x42.toByte) ++ sleb(v)
    def localGet(i: Int): Array[Byte] = Array(0x20.toByte) ++ uleb(i)
    def localSet(i: Int): Array[Byte] = Array(0x21.toByte) ++ uleb(i)
    def localTee(i: Int): Array[Byte] = Array(0x22.toByte) ++ uleb(i)
    def globalGet(i: Int): Array[Byte] = Array(0x23.toByte) ++ uleb(i)
    def globalSet(i: Int): Array[Byte] = Array(0x24.toByte) ++ uleb(i)
    def call(i: Int): Array[Byte] = Array(0x10.toByte) ++ uleb(i)
    def br(depth: Int): Array[Byte] = Array(0x0c.toByte) ++ uleb(depth)
    def brIf(depth: Int): Array[Byte] = Array(0x0d.toByte) ++ uleb(depth)
    def block(body: Array[Byte]): Array[Byte] = Array(0x02.toByte, 0x40.toByte) ++ body ++ Array(0x0b.toByte)
    def loop(body: Array[Byte]): Array[Byte] = Array(0x03.toByte, 0x40.toByte) ++ body ++ Array(0x0b.toByte)
    def ifElse(thn: Array[Byte], els: Array[Byte]): Array[Byte] =
      Array(0x04.toByte, 0x40.toByte) ++ thn ++ Array(0x05.toByte) ++ els ++ Array(0x0b.toByte)
    def ifOnly(thn: Array[Byte]): Array[Byte] =
      Array(0x04.toByte, 0x40.toByte) ++ thn ++ Array(0x0b.toByte)
    def load8u(offset: Int): Array[Byte] = Array(0x2d.toByte, 0.toByte) ++ uleb(offset)
    def store8(offset: Int): Array[Byte] = Array(0x3a.toByte, 0.toByte) ++ uleb(offset)
    val I32Add: Array[Byte] = Array(0x6a.toByte)
    val I32Sub: Array[Byte] = Array(0x6b.toByte)
    val I32Mul: Array[Byte] = Array(0x6c.toByte)
    val I32And: Array[Byte] = Array(0x71.toByte)
    val I32GeU: Array[Byte] = Array(0x4f.toByte)
    val I32GeS: Array[Byte] = Array(0x4e.toByte)
    val I32LeS: Array[Byte] = Array(0x4c.toByte)
    val I32LtU: Array[Byte] = Array(0x49.toByte)
    val I32Eqz: Array[Byte] = Array(0x45.toByte)
    val I64ShrU: Array[Byte] = Array(0x88.toByte)
    val I32WrapI64: Array[Byte] = Array(0xa7.toByte)
    val Return: Array[Byte] = Array(0x0f.toByte)

    /** The reference's `uppercase` example module, hand-assembled (its Go
      * source lives at public/wasm/examples/uppercase/main.go: fetch the
      * content, uppercase ASCII letters in place, write it back, stamp a
      * metadata key). Exports process + malloc/free with a bump
      * allocator — the exact shape the wazero processor probes for. */
    def uppercaseModule(): Array[Byte] = {
      val tV2V = 0 // () -> ()
      val tI2I = 1 // (i32) -> i32
      val tI2V = 2 // (i32) -> ()
      val tV2J = 3 // () -> i64
      val tII2V = 4 // (i32, i32) -> ()
      val tIIII2V = 5 // (i32, i32, i32, i32) -> ()
      val types = Seq(
        funcType(Nil, Nil), funcType(Seq(I32), Seq(I32)), funcType(Seq(I32), Nil),
        funcType(Nil, Seq(I64)), funcType(Seq(I32, I32), Nil),
        funcType(Seq(I32, I32, I32, I32), Nil))
      // imports (function index space starts with these)
      val imports = Seq(
        ("bento_wasm", "v0_msg_as_bytes", tV2J), // 0
        ("bento_wasm", "v0_msg_set_bytes", tII2V), // 1
        ("bento_wasm", "v0_msg_set_meta", tIIII2V)) // 2
      // func 3: malloc(size) -> i32 — bump allocator off global 0
      val malloc = FuncDef(tI2I, Nil,
        globalGet(0) ++ // ret = heap
          globalGet(0) ++ localGet(0) ++ I32Add ++ globalSet(0)) // heap += size
      // func 4: free(ptr) — no-op
      val free = FuncDef(tI2V, Nil, Array.emptyByteArray)
      // func 5: process()
      // locals: 0 ptrlen(i64 -> local types), 1 ptr, 2 len, 3 i, 4 b
      val process = FuncDef(tV2V, Seq((1, I64), (4, I32)),
        call(0) ++ localSet(0) ++ // ptrlen = v0_msg_as_bytes()
          localGet(0) ++ i64const(32) ++ I64ShrU ++ I32WrapI64 ++ localSet(1) ++ // ptr
          localGet(0) ++ I32WrapI64 ++ localSet(2) ++ // len
          i32const(0) ++ localSet(3) ++ // i = 0
          block(loop(
            localGet(3) ++ localGet(2) ++ I32GeU ++ brIf(1) ++ // if i >= len break
              localGet(1) ++ localGet(3) ++ I32Add ++ load8u(0) ++ localSet(4) ++ // b = mem[ptr+i]
              localGet(4) ++ i32const('a'.toInt) ++ I32GeS ++
              ifOnly(localGet(4) ++ i32const('z'.toInt) ++ I32LeS ++
                ifOnly(
                  localGet(1) ++ localGet(3) ++ I32Add ++ // addr
                    localGet(4) ++ i32const(32) ++ I32Sub ++ // b - 32
                    store8(0))) ++
              localGet(3) ++ i32const(1) ++ I32Add ++ localSet(3) ++ // i++
              br(0))) ++
          localGet(1) ++ localGet(2) ++ call(1) ++ // v0_msg_set_bytes(ptr, len)
          i32const(16) ++ i32const(9) ++ i32const(32) ++ i32const(4) ++ call(2)) // set_meta("processor"→… see data
      // data: key "processor" at 16, value "wasm" at 32; heap starts at 64
      module(types, imports, Seq(malloc, free, process), memPages = 2,
        globalsInit = Seq(64),
        exports = Seq(("malloc", 3), ("free", 4), ("process", 5)),
        data = Seq((16, "processor".getBytes(UTF_8)), (32, "wasm".getBytes(UTF_8))))
    }
  }
}
