package graft.functions

/** From-scratch GIF89a multi-frame decoder (public format spec:
  * https://www.w3.org/Graphics/GIF/spec-gif89a.txt) — header + logical
  * screen descriptor, global/local color tables, sub-block-chained LZW
  * pixel data with variable code width, and interlace reordering.
  *
  * Exists because the JDK's ImageIO GIF reader mis-decodes some small
  * multi-frame images (verified against an independent decode of the same
  * bytes), and the reference's video/frame seam needs a trustworthy
  * pure-JVM path. Same provenance pattern as the MMDB reader
  * (functions/Mmdb.scala): public binary spec, no third-party code.
  * Reference seam: frame sampling over media columns (SURVEY multimodal).
  */
object Gif {

  /** One decoded frame: position on the canvas + packed 0xRRGGBB pixels
    * (row-major, interlace already undone). `transparentIdx` preserved so
    * callers can honor transparency if they composite. */
  final case class Frame(x: Int, y: Int, w: Int, h: Int,
                         pixels: Array[Int], transparentIdx: Int)

  def isGif(d: Array[Byte]): Boolean =
    d.length > 6 && d(0) == 'G' && d(1) == 'I' && d(2) == 'F' && d(3) == '8'

  private def u16(d: Array[Byte], i: Int): Int = (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8)

  /** Decode every stored frame (no disposal compositing — frames come back
    * as stored, which is exact for full-canvas frames). */
  def decodeFrames(data: Array[Byte]): Vector[Frame] = {
    require(isGif(data), "not a GIF")
    // header + logical screen descriptor + at least a trailer byte
    require(data.length >= 14, s"gif: truncated header (${data.length} bytes)")
    val frames = Vector.newBuilder[Frame]
    var i = 6
    i += 4 // canvas w/h (logical screen)
    val packed = data(i) & 0xFF
    i += 3 // packed + bgcolor + aspect
    var gct: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      gct = readColorTable(data, i, n)
      i += 3 * n
    }
    var transparent = -1
    var done = false
    while (!done && i < data.length) {
      (data(i) & 0xFF) match {
        case 0x21 => // extension: note GCE transparency, skip sub-blocks
          val label = data(i + 1) & 0xFF
          i += 2
          if (label == 0xF9 && (data(i) & 0xFF) >= 4) {
            val flags = data(i + 1) & 0xFF
            transparent = if ((flags & 1) != 0) data(i + 4) & 0xFF else -1
          }
          while ((data(i) & 0xFF) != 0) i += (data(i) & 0xFF) + 1
          i += 1
        case 0x2C => // image descriptor
          val (ix, iy) = (u16(data, i + 1), u16(data, i + 3))
          val (iw, ih) = (u16(data, i + 5), u16(data, i + 7))
          val ip = data(i + 9) & 0xFF
          i += 10
          var ct = gct
          if ((ip & 0x80) != 0) {
            val n = 2 << (ip & 7)
            ct = readColorTable(data, i, n)
            i += 3 * n
          }
          require(ct != null, "gif: image without color table")
          val minCode = data(i) & 0xFF
          i += 1
          // concatenate sub-blocks
          val lzw = new java.io.ByteArrayOutputStream()
          while ((data(i) & 0xFF) != 0) {
            val len = data(i) & 0xFF
            lzw.write(data, i + 1, len)
            i += len + 1
          }
          i += 1
          val idxs = lzwDecode(minCode, lzw.toByteArray, iw * ih)
          val interlaced = (ip & 0x40) != 0
          val px = new Array[Int](iw * ih)
          var src = 0
          def rowOrder: Iterator[Int] =
            if (!interlaced) (0 until ih).iterator
            else Iterator.range(0, ih, 8) ++ Iterator.range(4, ih, 8) ++
              Iterator.range(2, ih, 4) ++ Iterator.range(1, ih, 2)
          for (row <- rowOrder; cx <- 0 until iw) {
            val idx = if (src < idxs.length) idxs(src) else 0
            px(row * iw + cx) = ct(idx & 0xFF)
            src += 1
          }
          frames += Frame(ix, iy, iw, ih, px, transparent)
          transparent = -1
        case 0x3B => done = true // trailer
        case b => throw new IllegalArgumentException(f"gif: unknown block 0x$b%02x at $i")
      }
    }
    frames.result()
  }

  private def readColorTable(d: Array[Byte], off: Int, n: Int): Array[Int] =
    Array.tabulate(n) { k =>
      ((d(off + 3 * k) & 0xFF) << 16) | ((d(off + 3 * k + 1) & 0xFF) << 8) |
        (d(off + 3 * k + 2) & 0xFF)
    }

  /** GIF-flavor LZW: little-endian bit packing, CLEAR/END codes, code
    * width grows at dictionary size 2^width (capped at 12 bits). */
  private def lzwDecode(minCode: Int, buf: Array[Byte], maxPixels: Int): Array[Int] = {
    val clear = 1 << minCode
    val end = clear + 1
    var codeSize = minCode + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val stack = new Array[Int](4097)
    var next = end + 1
    val out = new Array[Int](maxPixels)
    var outN = 0
    var prev = -1
    var acc = 0L
    var nbits = 0
    def reset(): Unit = {
      var k = 0
      while (k < clear) { prefix(k) = -1; suffix(k) = k; k += 1 }
      next = end + 1; codeSize = minCode + 1; prev = -1
    }
    reset()
    var bi = 0
    while (bi < buf.length && outN < maxPixels) {
      acc |= (buf(bi) & 0xFFL) << nbits
      nbits += 8
      bi += 1
      while (nbits >= codeSize && outN < maxPixels) {
        val code = (acc & ((1L << codeSize) - 1)).toInt
        acc >>= codeSize
        nbits -= codeSize
        if (code == clear) reset()
        else if (code == end) { outN = maxPixels; nbits = 0 } // stop: tail stays zero-padded
        else {
          // entry = dict[code], or dict[prev] + first(dict[prev]) (KwKwK)
          val base = if (code < next) code
            else { require(prev >= 0 && code == next, s"gif lzw: bad code $code"); prev }
          var sp = 0
          var p = base
          while (prefix(p) >= 0) { stack(sp) = suffix(p); sp += 1; p = prefix(p) }
          stack(sp) = suffix(p); sp += 1
          val first = suffix(p)
          var w = sp - 1
          while (w >= 0 && outN < maxPixels) { out(outN) = stack(w); outN += 1; w -= 1 }
          if (code >= next && outN < maxPixels) { out(outN) = first; outN += 1 } // KwKwK tail
          if (prev >= 0 && next < 4096) {
            prefix(next) = prev; suffix(next) = first; next += 1
            if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          }
          prev = code
        }
      }
    }
    out
  }
}
