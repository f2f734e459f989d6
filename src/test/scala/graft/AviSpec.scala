package graft

import graft.functions.Avi
import graft.ml.Multimodal

/** RIFF/AVI container parser + frame decode (functions/Avi.scala): exact
  * raw-DIB round-trip, MJPEG via ImageIO, loud failure on malformed and
  * unsupported payloads.
  */
class AviSpec extends SparkSpec {

  private def frame(seed: Int, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((seed * 131 + i * 7919) & 0xFFFFFF))

  test("raw-DIB frames round-trip exactly, any geometry incl. odd strides") {
    for ((w, h) <- Seq((2, 2), (3, 1), (5, 4), (1, 7))) {
      val fs = (0 until 3).map(f => frame(f + w * 10 + h, w, h))
      val bytes = Avi.write(w, h, rawFrames = fs)
      assert(Avi.isAvi(bytes))
      val got = Avi.decodeFrames(bytes)
      assert(got.length == 3)
      got.zip(fs).foreach { case (g, want) =>
        assert(g.w == w && g.h == h)
        assert(g.pixels.sameElements(want), s"${w}x$h")
      }
    }
  }

  test("syntheticAvi matches the shared pixel formula frame by frame") {
    val key = 123L
    val got = Avi.decodeFrames(Multimodal.syntheticAvi(key, 3))
    def ch(x: Int, y: Int, c: Int, f: Int): Int =
      (((key * 37 + f * 53 + y * 16 + x * 4 + c) % 256) + 256).toInt % 256
    for (f <- 0 until 3; y <- 0 until 2; x <- 0 until 2) {
      val rgb = got(f).pixels(y * 2 + x)
      assert((rgb & 0xFF) == ch(x, y, 0, f))
      assert(((rgb >> 8) & 0xFF) == ch(x, y, 1, f))
      assert(((rgb >> 16) & 0xFF) == ch(x, y, 2, f))
    }
  }

  test("MJPEG '00dc' frames decode via ImageIO (self-consistent, lossy)") {
    // encode a frame with ImageIO's own JPEG writer; the parser must
    // route it through the MJPEG path and agree with ImageIO's decode
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, ((x * 32) << 16) | (y * 32))
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val bytes = Avi.write(8, 8, jpegFrames = Seq(jb.toByteArray, jb.toByteArray))
    val got = Avi.decodeFrames(bytes)
    assert(got.length == 2 && got.head.w == 8 && got.head.h == 8)
    val viaImageIO = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jb.toByteArray))
    for (y <- 0 until 8; x <- 0 until 8)
      assert(got.head.pixels(y * 8 + x) == (viaImageIO.getRGB(x, y) & 0xFFFFFF))
  }

  test("malformed and unsupported payloads fail loudly, never hang") {
    intercept[java.io.IOException](Avi.decodeFrames("not avi".getBytes))
    // truncated: chop a valid file mid-movi
    val ok = Avi.write(2, 2, rawFrames = Seq(frame(1, 2, 2)))
    intercept[java.io.EOFException](Avi.decodeFrames(ok.dropRight(6)))
    // non-JPEG compressed frame = the honest unsupported-codec boundary
    val h264ish = Avi.write(2, 2, jpegFrames = Seq(Array[Byte](0, 0, 0, 1, 0x67)))
    intercept[java.io.IOException](Avi.decodeFrames(h264ish))
  }

  test("aviFrameStats emits one stats row per frame") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val media = Seq((1L, Multimodal.syntheticAvi(1L, 2)), (2L, Multimodal.syntheticAvi(2L, 4)))
      .toDF("media_id", "data")
    val got = Multimodal.aviFrameStats(media).toDF()
      .groupBy("media_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 4L))
  }
}
