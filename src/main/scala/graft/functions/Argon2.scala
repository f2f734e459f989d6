package graft.functions

/** Pure-Scala Argon2 (RFC 9106) over a from-scratch Blake2b (RFC 7693) —
  * backs the reference's `compare_argon2` Bloblang method
  * (internal/impl/crypto/argon2.go) with zero external jars.
  *
  * Supports Argon2d / Argon2i / Argon2id, version 0x13, with the PHC
  * string format `$argon2id$v=19$m=…,t=…,p=…$<b64salt>$<b64tag>`.
  * Single-threaded fill (lanes are still computed in the spec's lane
  * order, so p > 1 is bit-correct, just not parallel — password hashing
  * is a per-row scalar op; Spark parallelizes across rows, not inside
  * one hash).
  */
object Argon2 {

  // ===== Blake2b (RFC 7693) ==================================================

  private val IV = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private final class Blake2b(outLen: Int) {
    require(outLen >= 1 && outLen <= 64)
    private val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    private val buf = new Array[Byte](128)
    private var bufLen = 0
    private var tLo = 0L // bytes compressed so far (128-bit counter, low word)
    private var tHi = 0L

    private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = rotr(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = rotr(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = rotr(v(b) ^ v(c), 63)
    }

    private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
      val m = new Array[Long](16)
      var i = 0
      while (i < 16) {
        var w = 0L
        var j = 7
        while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
        m(i) = w
        i += 1
      }
      val v = new Array[Long](16)
      System.arraycopy(h, 0, v, 0, 8)
      System.arraycopy(IV, 0, v, 8, 8)
      v(12) ^= tLo
      v(13) ^= tHi
      if (last) v(14) = ~v(14)
      var r = 0
      while (r < 12) {
        val s = Sigma(r)
        g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
        g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
        g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
        g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
        g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
        g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
        g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
        g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
        r += 1
      }
      i = 0
      while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
    }

    def update(data: Array[Byte], off0: Int, len: Int): this.type = {
      var off = off0
      var rem = len
      while (rem > 0) {
        if (bufLen == 128) { // buffer full AND more input → not the last block
          tLo += 128
          if (tLo == 0) tHi += 1
          compress(buf, 0, last = false)
          bufLen = 0
        }
        val take = math.min(128 - bufLen, rem)
        System.arraycopy(data, off, buf, bufLen, take)
        bufLen += take
        off += take
        rem -= take
      }
      this
    }
    def update(data: Array[Byte]): this.type = update(data, 0, data.length)

    def digest(): Array[Byte] = {
      tLo += bufLen
      if (tLo < bufLen && bufLen > 0) tHi += 1 // unsigned overflow carry
      java.util.Arrays.fill(buf, bufLen, 128, 0.toByte)
      compress(buf, 0, last = true)
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
      out
    }
  }

  /** Blake2b-`outLen`(data), outLen ≤ 64. */
  def blake2b(outLen: Int, data: Array[Byte]*): Array[Byte] = {
    val b = new Blake2b(outLen)
    data.foreach(b.update)
    b.digest()
  }

  // ===== Argon2 (RFC 9106) ===================================================

  private def le32(x: Int): Array[Byte] = Array(
    x.toByte, (x >>> 8).toByte, (x >>> 16).toByte, (x >>> 24).toByte)

  /** Variable-length hash H' (RFC 9106 §3.3). Package-visible for the
    * external-oracle spec (python hashlib.blake2b replay). */
  private[graft] def hPrime(outLen: Int, a: Array[Byte]): Array[Byte] = {
    if (outLen <= 64) return blake2b(outLen, le32(outLen), a)
    val out = new Array[Byte](outLen)
    var v = blake2b(64, le32(outLen), a)
    var pos = 0
    var rem = outLen
    while (rem > 64) {
      System.arraycopy(v, 0, out, pos, 32)
      pos += 32
      rem -= 32
      // RFC 9106 §3.3: V_{r+1} is a Blake2b with digest length T-32r (not a
      // truncated Blake2b-64 — the length is part of the IV), so when the
      // remainder after this step is the final block, size it exactly.
      v = if (rem > 64) blake2b(64, v) else blake2b(rem, v)
    }
    System.arraycopy(v, 0, out, pos, rem)
    out
  }

  /** Permutation P's GB function (§3.6): BlaKa-style with the 32-bit
    * multiplicative twist a + b + 2·trunc(a)·trunc(b). */
  @inline private def gb(v: Array[Long], a: Int, b: Int, c: Int, d: Int): Unit = {
    def mul(x: Long, y: Long): Long = 2L * (x & 0xffffffffL) * (y & 0xffffffffL)
    v(a) = v(a) + v(b) + mul(v(a), v(b))
    v(d) = rotr(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d) + mul(v(c), v(d))
    v(b) = rotr(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + mul(v(a), v(b))
    v(d) = rotr(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d) + mul(v(c), v(d))
    v(b) = rotr(v(b) ^ v(c), 63)
  }

  private def permute(v: Array[Long], idx: Array[Int]): Unit = {
    gb(v, idx(0), idx(4), idx(8), idx(12))
    gb(v, idx(1), idx(5), idx(9), idx(13))
    gb(v, idx(2), idx(6), idx(10), idx(14))
    gb(v, idx(3), idx(7), idx(11), idx(15))
    gb(v, idx(0), idx(5), idx(10), idx(15))
    gb(v, idx(1), idx(6), idx(11), idx(12))
    gb(v, idx(2), idx(7), idx(8), idx(13))
    gb(v, idx(3), idx(4), idx(9), idx(14))
  }

  /** Compression G(x, y) → out, each a 128-long (1 KiB) block (§3.5).
    * If `xor`, out ^= result (second+ passes overwrite with xor). */
  private def gBlock(x: Array[Long], y: Array[Long], out: Array[Long], xor: Boolean): Unit = {
    val r = new Array[Long](128)
    var i = 0
    while (i < 128) { r(i) = x(i) ^ y(i); i += 1 }
    val z = r.clone()
    // rows: 8 groups of 16 consecutive words
    i = 0
    while (i < 8) {
      permute(z, Array.tabulate(16)(j => i * 16 + j))
      i += 1
    }
    // columns: 8 groups of 2-word pairs striding 16
    i = 0
    while (i < 8) {
      permute(z, Array.tabulate(16)(j => 2 * i + (j / 2) * 16 + (j % 2)))
      i += 1
    }
    i = 0
    while (i < 128) {
      val v = z(i) ^ r(i)
      if (xor) out(i) ^= v else out(i) = v
      i += 1
    }
  }

  private def blockFromBytes(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](128)
    var i = 0
    while (i < 128) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (b(i * 8 + j) & 0xffL); j -= 1 }
      out(i) = w
      i += 1
    }
    out
  }

  private def blockToBytes(v: Array[Long]): Array[Byte] = {
    val out = new Array[Byte](1024)
    var i = 0
    while (i < 1024) { out(i) = (v(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }

  /** Argon2 core. `variant`: 0=d, 1=i, 2=id. `mKiB` = memory in KiB blocks,
    * `t` = passes, `p` = lanes. Returns `tagLen` bytes. */
  def rawHash(variant: Int, password: Array[Byte], salt: Array[Byte],
              t: Int = 3, mKiB: Int = 65536, p: Int = 1, tagLen: Int = 32,
              secret: Array[Byte] = Array.empty, ad: Array[Byte] = Array.empty): Array[Byte] = {
    require(variant >= 0 && variant <= 2, "variant: 0=d 1=i 2=id")
    require(t >= 1 && p >= 1 && mKiB >= 8 * p && tagLen >= 4)

    val h0 = blake2b(64,
      le32(p), le32(tagLen), le32(mKiB), le32(t), le32(0x13), le32(variant),
      le32(password.length), password, le32(salt.length), salt,
      le32(secret.length), secret, le32(ad.length), ad)

    val mPrime = 4 * p * (mKiB / (4 * p))
    val q = mPrime / p // lane length (columns)
    val segLen = q / 4
    val mem = Array.ofDim[Array[Long]](mPrime)
    def blk(lane: Int, col: Int): Array[Long] = mem(lane * q + col)

    var l = 0
    while (l < p) {
      mem(l * q) = blockFromBytes(hPrime(1024, h0 ++ le32(0) ++ le32(l)))
      mem(l * q + 1) = blockFromBytes(hPrime(1024, h0 ++ le32(1) ++ le32(l)))
      l += 1
    }

    val zeroBlock = new Array[Long](128)

    var pass = 0
    while (pass < t) {
      var slice = 0
      while (slice < 4) {
        l = 0
        while (l < p) {
          // data-independent addressing for Argon2i always, and for
          // Argon2id during the first half of the first pass
          val dataIndependent =
            variant == 1 || (variant == 2 && pass == 0 && slice < 2)
          var addrBlock: Array[Long] = null
          var inputBlock: Array[Long] = null
          var addrCounter = 0L
          if (dataIndependent) {
            inputBlock = new Array[Long](128)
            inputBlock(0) = pass.toLong
            inputBlock(1) = l.toLong
            inputBlock(2) = slice.toLong
            inputBlock(3) = mPrime.toLong
            inputBlock(4) = t.toLong
            inputBlock(5) = variant.toLong
          }
          def nextAddresses(): Array[Long] = {
            addrCounter += 1
            inputBlock(6) = addrCounter
            val tmp = new Array[Long](128)
            gBlock(zeroBlock, inputBlock, tmp, xor = false)
            val out = new Array[Long](128)
            gBlock(zeroBlock, tmp, out, xor = false)
            out
          }

          var idx = if (pass == 0 && slice == 0) 2 else 0
          if (dataIndependent && idx > 0) () // counter starts fresh per segment anyway
          while (idx < segLen) {
            val col = slice * segLen + idx
            val prevCol = if (col == 0) q - 1 else col - 1
            val prev = blk(l, prevCol)

            // J1, J2 (§3.4.1)
            var j1 = 0L
            var j2 = 0L
            if (dataIndependent) {
              if (idx % 128 == 0 || addrBlock == null) addrBlock = nextAddresses()
              val a = addrBlock(idx % 128)
              j1 = a & 0xffffffffL
              j2 = a >>> 32
            } else {
              j1 = prev(0) & 0xffffffffL
              j2 = (prev(0) >>> 32) & 0xffffffffL
            }

            // reference lane (§3.4.2)
            val refLane =
              if (pass == 0 && slice == 0) l
              else (j2 % p).toInt

            // reference area size |R| (§3.4.3)
            val sameLane = refLane == l
            val refAreaSize: Long =
              if (pass == 0) {
                if (slice == 0) idx - 1L
                else if (sameLane) slice.toLong * segLen + idx - 1
                else slice.toLong * segLen - (if (idx == 0) 1L else 0L)
              } else {
                if (sameLane) q.toLong - segLen + idx - 1
                else q.toLong - segLen - (if (idx == 0) 1L else 0L)
              }

            // φ(J1): non-uniform mapping toward recent blocks
            val x = (j1 * j1) >>> 32
            val y = (refAreaSize * x) >>> 32
            val relPos = refAreaSize - 1 - y

            // start position: first block of the NEXT slice on later passes
            val startPos =
              if (pass == 0) 0L
              else if (slice == 3) 0L
              else (slice + 1L) * segLen
            val refCol = ((startPos + relPos) % q).toInt

            val dest = l * q + col
            val doXor = pass > 0
            if (mem(dest) == null) mem(dest) = new Array[Long](128)
            gBlock(prev, blk(refLane, refCol), mem(dest), xor = doXor)
            idx += 1
          }
          l += 1
        }
        slice += 1
      }
      pass += 1
    }

    // final block: XOR of every lane's last column
    val c = blk(0, q - 1).clone()
    l = 1
    while (l < p) {
      val b = blk(l, q - 1)
      var i = 0
      while (i < 128) { c(i) ^= b(i); i += 1 }
      l += 1
    }
    hPrime(tagLen, blockToBytes(c))
  }

  // ===== PHC string format ===================================================

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.withoutPadding.encodeToString(b)
  private def unb64(s: String): Array[Byte] = java.util.Base64.getDecoder.decode(s)

  private def variantName(v: Int): String = v match {
    case 0 => "argon2d"
    case 1 => "argon2i"
    case 2 => "argon2id"
  }

  /** PHC-format hash, e.g. `$argon2id$v=19$m=65536,t=3,p=1$<salt>$<tag>`. */
  def hash(password: String, salt: Array[Byte], variant: Int = 2,
           t: Int = 3, mKiB: Int = 65536, p: Int = 1, tagLen: Int = 32): String = {
    val tag = rawHash(variant, password.getBytes("UTF-8"), salt, t, mKiB, p, tagLen)
    s"$$${variantName(variant)}$$v=19$$m=$mKiB,t=$t,p=$p$$${b64(salt)}$$${b64(tag)}"
  }

  /** Deterministic salt from a seed (reproducible pipelines/tests). */
  def saltFromSeed(seed: Long): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(java.nio.ByteBuffer.allocate(8).putLong(seed).array()).take(16)

  /** Verify a password against a PHC string (the reference's
    * `compare_argon2`). */
  def check(password: String, phc: String): Boolean = {
    if (password == null || phc == null) return false
    try {
      val parts = phc.split('$')
      // ["", name, "v=19", "m=..,t=..,p=..", salt, tag]
      if (parts.length != 6) return false
      val variant = parts(1) match {
        case "argon2d" => 0
        case "argon2i" => 1
        case "argon2id" => 2
        case _ => return false
      }
      if (parts(2) != "v=19") return false
      val params = parts(3).split(',').map(_.split('=')).map(kv => kv(0) -> kv(1).toInt).toMap
      val salt = unb64(parts(4))
      val want = unb64(parts(5))
      val got = rawHash(variant, password.getBytes("UTF-8"), salt,
        params("t"), params("m"), params("p"), want.length)
      java.security.MessageDigest.isEqual(got, want)
    } catch { case _: Exception => false }
  }
}
