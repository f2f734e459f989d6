package graft.functions

/** From-scratch RIFF/AVI container parser (the public AVI RIFF form:
  * `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf ...)) LIST('movi'
  * ##db/##dc ...) [idx1])`). The reference ships video inputs through
  * ffmpeg-class codecs; no such native lib exists in this container, so
  * the container walk, stream-format read and uncompressed-DIB frame
  * decode are implemented from the spec, and MJPEG (`##dc` chunks whose
  * payload is a JPEG) rides the JDK's ImageIO JPEG reader. The remaining
  * stub in [[graft.ml.Multimodal]] covers true inter-frame codecs
  * (H.264-class) only.
  *
  * Everything errors loudly on malformed input — truncated chunks,
  * unsupported bit depths and compression fccs throw with offsets, never
  * hang or return garbage (same contract as Gif.scala / Mmdb.scala).
  */
object Avi {

  /** One decoded frame: packed 0xRRGGBB pixels, row-major top-down. */
  final case class Frame(w: Int, h: Int, pixels: Array[Int])

  def isAvi(d: Array[Byte]): Boolean =
    d.length >= 12 && fcc(d, 0) == "RIFF" && fcc(d, 8) == "AVI "

  private def fcc(d: Array[Byte], off: Int): String =
    new String(d, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def le32(d: Array[Byte], off: Int): Int = {
    if (off + 4 > d.length)
      throw new java.io.EOFException(s"AVI truncated: need 4 bytes at $off of ${d.length}")
    (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8) |
      ((d(off + 2) & 0xFF) << 16) | ((d(off + 3) & 0xFF) << 24)
  }

  private def le16(d: Array[Byte], off: Int): Int =
    (d(off) & 0xFF) | ((d(off + 1) & 0xFF) << 8)

  /** Video stream format from the first `strf` BITMAPINFOHEADER. */
  private final case class VideoFmt(w: Int, h: Int, bitCount: Int, compression: Int)

  /** Decode every video frame ('##db' raw DIB, '##dc' MJPEG). */
  def decodeFrames(data: Array[Byte]): Vector[Frame] = {
    if (!isAvi(data))
      throw new java.io.IOException("not a RIFF/AVI payload")
    var fmt: Option[VideoFmt] = None
    val frames = Vector.newBuilder[Frame]

    // RIFF walk: a LIST's payload is a 4-byte list type then sub-chunks;
    // every chunk is fcc + le32 size + payload padded to even length.
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fcc(data, off)
        val size = le32(data, off + 4)
        if (size < 0 || off + 8 + size > end)
          throw new java.io.EOFException(
            s"AVI chunk '$id' at $off overruns: size=$size end=$end")
        val body = off + 8
        id match {
          case "LIST" => walk(body + 4, body + size) // skip the list type fcc
          case "strf" if fmt.isEmpty =>
            // BITMAPINFOHEADER: biSize w h planes bitCount compression
            fmt = Some(VideoFmt(le32(data, body + 4), le32(data, body + 8),
              le16(data, body + 14), le32(data, body + 16)))
          case _ if id.length == 4 && id.endsWith("db") =>
            frames += decodeDib(data, body, size,
              fmt.getOrElse(throw new java.io.IOException("AVI ##db before strf")))
          case _ if id.length == 4 && id.endsWith("dc") =>
            frames += decodeCompressed(data, body, size)
          case _ => () // avih, strh, idx1, JUNK, vprp ... skipped
        }
        off = body + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, data.length)
    val out = frames.result()
    if (out.isEmpty) throw new java.io.IOException("AVI contains no video frames")
    out
  }

  /** Uncompressed bottom-up 24-bit BI_RGB DIB bits (the '##db' payload):
    * BGR byte order, rows padded to 4-byte boundaries. */
  private def decodeDib(d: Array[Byte], off: Int, size: Int, fmt: VideoFmt): Frame = {
    if (fmt.compression != 0)
      throw new java.io.IOException(s"##db with biCompression=${fmt.compression} (want BI_RGB)")
    if (fmt.bitCount != 24)
      throw new java.io.IOException(s"unsupported DIB bit depth ${fmt.bitCount} (24-bit only)")
    val (w, h) = (fmt.w, math.abs(fmt.h))
    val stride = (w * 3 + 3) & ~3
    if (size < stride * h)
      throw new java.io.EOFException(s"DIB frame short: $size < ${stride * h}")
    val topDown = fmt.h < 0
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val srcRow = off + stride * (if (topDown) y else h - 1 - y)
      var x = 0
      while (x < w) {
        val p = srcRow + x * 3
        px(y * w + x) = ((d(p + 2) & 0xFF) << 16) | ((d(p + 1) & 0xFF) << 8) | (d(p) & 0xFF)
        x += 1
      }
      y += 1
    }
    Frame(w, h, px)
  }

  /** Compressed '##dc' frame: MJPEG (JPEG SOI magic) via ImageIO; anything
    * else is the honest unsupported-codec boundary. */
  private def decodeCompressed(d: Array[Byte], off: Int, size: Int): Frame = {
    if (size < 2 || d(off) != 0xFF.toByte || d(off + 1) != 0xD8.toByte)
      throw new java.io.IOException(
        "unsupported compressed AVI frame (MJPEG only; H.264-class codecs need a native decoder)")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(d, off, size))
    if (img == null) throw new java.io.IOException("ImageIO rejected MJPEG frame")
    val (w, h) = (img.getWidth, img.getHeight)
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = img.getRGB(x, y) & 0xFFFFFF; x += 1 }
      y += 1
    }
    Frame(w, h, px)
  }

  /** Minimal spec-shaped AVI writer (fixtures + the synthetic gate table):
    * one 'vids' stream, frames as raw 24-bit DIB '00db' chunks or
    * pre-encoded JPEG '00dc' chunks. */
  def write(w: Int, h: Int, rawFrames: Seq[Array[Int]] = Nil,
            jpegFrames: Seq[Array[Byte]] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32b(v: Int): Array[Byte] =
      Array(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xFF).toByte)
    def le16b(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes ++ le32b(body.length) ++ body ++
        (if ((body.length & 1) == 1) Array(0.toByte) else Array.emptyByteArray)
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes ++ body)

    val stride = (w * 3 + 3) & ~3
    val nFrames = rawFrames.length + jpegFrames.length
    val avih = le32b(40000) ++ le32b(stride * h * 25) ++ le32b(0) ++ le32b(0x10) ++
      le32b(nFrames) ++ le32b(0) ++ le32b(1) ++ le32b(stride * h) ++
      le32b(w) ++ le32b(h) ++ Array.fill(16)(0.toByte)
    val handler = if (rawFrames.nonEmpty) "DIB " else "MJPG"
    val strh = "vids".getBytes ++ handler.getBytes ++ le32b(0) ++ le16b(0) ++ le16b(0) ++
      le32b(0) ++ le32b(1) ++ le32b(25) ++ le32b(0) ++ le32b(nFrames) ++
      le32b(stride * h) ++ le32b(-1) ++ le32b(0) ++
      le16b(0) ++ le16b(0) ++ le16b(w) ++ le16b(h)
    val strf = le32b(40) ++ le32b(w) ++ le32b(h) ++ le16b(1) ++ le16b(24) ++
      le32b(0) ++ le32b(stride * h) ++ le32b(0) ++ le32b(0) ++ le32b(0) ++ le32b(0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))

    val dibChunks = rawFrames.map { px =>
      require(px.length == w * h, s"frame pixel count ${px.length} != ${w * h}")
      val body = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val dstRow = stride * (h - 1 - y) // bottom-up
        var x = 0
        while (x < w) {
          val rgb = px(y * w + x)
          body(dstRow + x * 3) = (rgb & 0xFF).toByte
          body(dstRow + x * 3 + 1) = ((rgb >> 8) & 0xFF).toByte
          body(dstRow + x * 3 + 2) = ((rgb >> 16) & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      chunk("00db", body)
    }
    val jpgChunks = jpegFrames.map(chunk("00dc", _))
    val movi = list("movi", (dibChunks ++ jpgChunks).flatten.toArray)

    val riffBody = "AVI ".getBytes ++ hdrl ++ movi
    bos.write("RIFF".getBytes)
    bos.write(le32b(riffBody.length))
    bos.write(riffBody)
    bos.toByteArray
  }
}
