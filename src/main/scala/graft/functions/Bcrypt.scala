package graft.functions

/** Pure-Scala bcrypt (Provos & Mazières, "A Future-Adaptable Password
  * Scheme", USENIX 1999) — backs the reference's `compare_bcrypt` Bloblang
  * method (internal/impl/crypto/bcrypt.go) with zero external jars.
  *
  * Implementation notes:
  *  - The Blowfish P-array and S-boxes are the hexadecimal digits of π.
  *    Rather than embedding the 1042-word table, we DERIVE it at class
  *    init from a Machin-formula π computation (16·atan(1/5) − 4·atan(1/239)
  *    in fixed-point BigInt) and assert the first word equals the published
  *    0x243f6a88. Same table as every Blowfish implementation, no blob.
  *  - EksBlowfish per the paper: ExpandKey(salt, key), then 2^cost
  *    iterations of ExpandKey(0, key); ExpandKey(0, salt).
  *  - Output: "$2a$" ‖ cost ‖ "$" ‖ bcrypt-base64(salt₁₆) ‖
  *    bcrypt-base64(first 23 bytes of 64×ECB("OrpheanBeholderScryDoubt")).
  *
  * Thread-safety: the shared π-derived boxes are read-only; each hash call
  * clones them into private working arrays.
  */
object Bcrypt {

  // ---- π table derivation ---------------------------------------------------

  private val Words = 18 + 4 * 256 // P-array + four S-boxes
  private val HexDigits = Words * 8

  /** atan(1/x) in fixed point: returns round-down of atan(1/x)·scale. */
  private def atanInv(x: Long, scale: BigInt): BigInt = {
    val x2 = BigInt(x * x)
    var power = scale / x // scale / x^(2k+1)
    var sum = BigInt(0)
    var k = 0
    while (power.signum != 0) {
      val term = power / (2 * k + 1)
      sum = if ((k & 1) == 0) sum + term else sum - term
      power = power / x2
      k += 1
    }
    sum
  }

  /** First `HexDigits` hex digits of the fractional part of π. */
  private def piFractionHex: String = {
    val guard = 16 // guard digits against round-down drift
    val scale = BigInt(1) << (4 * (HexDigits + guard))
    val pi = 16 * atanInv(5, scale) - 4 * atanInv(239, scale)
    val frac = pi - 3 * scale
    val hex = frac.toString(16)
    // pad to full width (the fraction starts 0x243f…, no leading zero, but
    // stay defensive), then drop the guard digits
    ("0" * (HexDigits + guard - hex.length) + hex).substring(0, HexDigits)
  }

  /** (initial P-array, initial concatenated S-boxes). */
  private lazy val (pInit, sInit): (Array[Int], Array[Int]) = {
    val hex = piFractionHex
    val words = Array.tabulate(Words) { i =>
      java.lang.Integer.parseUnsignedInt(hex.substring(i * 8, i * 8 + 8), 16)
    }
    require(words(0) == 0x243f6a88 && words(1) == 0x85a308d3,
      "π digit derivation is wrong — refusing to produce bogus hashes")
    (words.take(18), words.drop(18))
  }

  // ---- Blowfish core --------------------------------------------------------

  private final class State {
    val p: Array[Int] = pInit.clone()
    val s: Array[Int] = sInit.clone()
    var xl = 0
    var xr = 0

    private def f(x: Int): Int =
      ((s(x >>> 24) + s(256 + ((x >>> 16) & 0xff))) ^ s(512 + ((x >>> 8) & 0xff))) +
        s(768 + (x & 0xff))

    /** Encipher (this.xl, this.xr) in place. */
    def encipher(): Unit = {
      var l = xl
      var r = xr
      var i = 0
      while (i < 16) {
        l ^= p(i)
        r ^= f(l)
        val t = l; l = r; r = t
        i += 1
      }
      val t = l; l = r; r = t // undo final swap
      r ^= p(16)
      l ^= p(17)
      xl = l
      xr = r
    }

    /** Next big-endian 32-bit word from `data`, cycling; returns new offset. */
    private def cyclicWord(data: Array[Byte], off0: Int): (Int, Int) = {
      var w = 0
      var off = off0
      var i = 0
      while (i < 4) {
        w = (w << 8) | (data(off) & 0xff)
        off = (off + 1) % data.length
        i += 1
      }
      (w, off)
    }

    /** ExpandKey(data, key) per the bcrypt paper; data == null means the
      * all-zero block (classic Blowfish key schedule). */
    def expandKey(data: Array[Byte], key: Array[Byte]): Unit = {
      var koff = 0
      var i = 0
      while (i < 18) {
        val (w, o) = cyclicWord(key, koff)
        p(i) ^= w
        koff = o
        i += 1
      }
      var doff = 0
      xl = 0
      xr = 0
      i = 0
      while (i < 18) {
        if (data != null) {
          val (w1, o1) = cyclicWord(data, doff)
          val (w2, o2) = cyclicWord(data, o1)
          xl ^= w1; xr ^= w2; doff = o2
        }
        encipher()
        p(i) = xl
        p(i + 1) = xr
        i += 2
      }
      i = 0
      while (i < 1024) {
        if (data != null) {
          val (w1, o1) = cyclicWord(data, doff)
          val (w2, o2) = cyclicWord(data, o1)
          xl ^= w1; xr ^= w2; doff = o2
        }
        encipher()
        s(i) = xl
        s(i + 1) = xr
        i += 2
      }
    }
  }

  // ---- bcrypt ---------------------------------------------------------------

  private val Alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val Magic = "OrpheanBeholderScryDoubt".getBytes("US-ASCII")

  private def b64(bytes: Array[Byte]): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < bytes.length) {
      val b0 = bytes(i) & 0xff
      sb.append(Alphabet(b0 >>> 2))
      if (i + 1 < bytes.length) {
        val b1 = bytes(i + 1) & 0xff
        sb.append(Alphabet(((b0 & 0x03) << 4) | (b1 >>> 4)))
        if (i + 2 < bytes.length) {
          val b2 = bytes(i + 2) & 0xff
          sb.append(Alphabet(((b1 & 0x0f) << 2) | (b2 >>> 6)))
          sb.append(Alphabet(b2 & 0x3f))
        } else sb.append(Alphabet((b1 & 0x0f) << 2))
      } else sb.append(Alphabet((b0 & 0x03) << 4))
      i += 3
    }
    sb.toString
  }

  private def unb64(s: String, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var (i, o) = (0, 0)
    def v(c: Char): Int = {
      val x = Alphabet.indexOf(c)
      require(x >= 0, s"invalid bcrypt base64 char '$c'")
      x
    }
    while (o < outLen) {
      val c0 = v(s(i)); val c1 = v(s(i + 1))
      out(o) = ((c0 << 2) | (c1 >>> 4)).toByte
      o += 1
      if (o < outLen) {
        val c2 = v(s(i + 2))
        out(o) = (((c1 & 0x0f) << 4) | (c2 >>> 2)).toByte
        o += 1
        if (o < outLen) {
          val c3 = v(s(i + 3))
          out(o) = (((c2 & 0x03) << 6) | c3).toByte
          o += 1
        }
      }
      i += 4
    }
    out
  }

  /** Format a salt string from raw parts. */
  def formatSalt(cost: Int, salt16: Array[Byte]): String = {
    require(cost >= 4 && cost <= 31, s"bcrypt cost $cost out of range [4,31]")
    require(salt16.length == 16, "bcrypt salt must be 16 bytes")
    f"$$2a$$$cost%02d$$${b64(salt16)}"
  }

  /** Deterministic salt from a seed (for reproducible pipelines/tests). */
  def saltFromSeed(cost: Int, seed: Long): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(java.nio.ByteBuffer.allocate(8).putLong(seed).array())
    formatSalt(cost, d.take(16))
  }

  /** bcrypt hash. `salt` is the "$2a$NN$<22 chars>" prefix (a full previous
    * hash also works — extra chars are ignored, as in crypt(3)). */
  def hash(password: String, salt: String): String = {
    require(salt.length >= 29 && salt.startsWith("$2"), s"malformed bcrypt salt")
    // only the modern minor variants: the ancient "$2$" form predates the
    // $2a fix and would re-serialize ambiguously — reject it loudly
    val minor = salt(2) match {
      case m @ ('a' | 'b' | 'y') => m
      case m => throw new IllegalArgumentException(s"unsupported bcrypt variant 2$m")
    }
    val costOff = 4
    val cost = salt.substring(costOff, costOff + 2).toInt
    require(cost >= 4 && cost <= 31, s"bcrypt cost $cost out of range [4,31]")
    val salt16 = unb64(salt.substring(costOff + 3, costOff + 25), 16)

    // key = UTF-8 password + NUL, truncated to 72 bytes
    val pw = password.getBytes("UTF-8")
    val key = java.util.Arrays.copyOf(pw, math.min(pw.length + 1, 72))

    val st = new State
    st.expandKey(salt16, key)
    var round = 0L
    val rounds = 1L << cost
    while (round < rounds) {
      st.expandKey(null, key)
      st.expandKey(null, salt16)
      round += 1
    }

    val ct = new Array[Int](6)
    var i = 0
    while (i < 6) {
      ct(i) = ((Magic(i * 4) & 0xff) << 24) | ((Magic(i * 4 + 1) & 0xff) << 16) |
        ((Magic(i * 4 + 2) & 0xff) << 8) | (Magic(i * 4 + 3) & 0xff)
      i += 1
    }
    i = 0
    while (i < 64) {
      var j = 0
      while (j < 6) {
        st.xl = ct(j)
        st.xr = ct(j + 1)
        st.encipher()
        ct(j) = st.xl
        ct(j + 1) = st.xr
        j += 2
      }
      i += 1
    }
    val out = new Array[Byte](23) // last byte of the 24 is dropped (crypt(3) quirk)
    i = 0
    while (i < 23) {
      out(i) = (ct(i / 4) >>> (24 - 8 * (i % 4))).toByte
      i += 1
    }
    f"$$2$minor%c$$$cost%02d$$${b64(salt16)}${b64(out)}"
  }

  /** Constant-time verify (the reference's `compare_bcrypt`). */
  def check(password: String, hashed: String): Boolean = {
    if (password == null || hashed == null) return false
    val recomputed =
      try hash(password, hashed)
      catch { case _: IllegalArgumentException => return false }
    java.security.MessageDigest.isEqual(
      recomputed.getBytes("US-ASCII"), hashed.getBytes("US-ASCII"))
  }
}
