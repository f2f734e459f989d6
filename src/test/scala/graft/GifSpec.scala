package graft

import graft.functions.Gif
import graft.ml.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch GIF89a decoder (functions/Gif.scala). The JDK ImageIO GIF
  * reader mis-decodes rows past the first on some small multi-frame images
  * (it returned pixel (0,1) == pixel (0,0) for the synthetic 2×2 frames
  * while an independent byte-level decode shows indices [0,1,2,3] stored
  * correctly) — these gates pin our decoder to the spec instead. */
class GifSpec extends AnyFunSuite {

  test("synthetic animated GIF round-trips exactly (every frame, every pixel)") {
    for (key <- Seq(0L, 7L, 123L, 4999L); n <- Seq(1, 2, 4)) {
      val frames = Gif.decodeFrames(Multimodal.syntheticGif(key, n))
      assert(frames.length == n, s"key=$key want $n frames, got ${frames.length}")
      for ((fr, f) <- frames.zipWithIndex) {
        assert(fr.w == 2 && fr.h == 2)
        for (y <- 0 until 2; x <- 0 until 2) {
          def ch(c: Int) = (((key * 37 + f * 53 + y * 16 + x * 4 + c) % 256) + 256) % 256
          val rgb = fr.pixels(y * 2 + x)
          assert((rgb & 0xFF) == ch(0) && ((rgb >> 8) & 0xFF) == ch(1) &&
            ((rgb >> 16) & 0xFF) == ch(2),
            s"key=$key frame=$f px($x,$y): got ${Integer.toHexString(rgb)}")
        }
      }
    }
  }

  test("agrees with ImageIO on a single-frame GIF (LZW growth + KwKwK path)") {
    // 64x64 indexed image with a repetitive diagonal pattern: forces the
    // LZW dictionary through several code-width bumps and KwKwK cases
    val n = 64
    val (rA, gA, bA) = (new Array[Byte](256), new Array[Byte](256), new Array[Byte](256))
    for (i <- 0 until 256) { rA(i) = i.toByte; gA(i) = (255 - i).toByte; bA(i) = (i * 7 % 256).toByte }
    val icm = new java.awt.image.IndexColorModel(8, 256, rA, gA, bA)
    val img = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until n; x <- 0 until n)
      img.getRaster.setSample(x, y, 0, (x + y) % 17 * 3 % 256)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", out)
    val bytes = out.toByteArray

    val ours = Gif.decodeFrames(bytes)
    assert(ours.length == 1)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until n; x <- 0 until n)
      assert(ours(0).pixels(y * n + x) == (theirs.getRGB(x, y) & 0xFFFFFF),
        s"divergence at ($x,$y)")
  }

  test("rejects non-GIF payloads loudly") {
    assert(!Gif.isGif("plainly not a gif".getBytes))
    // truncated header → loud failure (OOB or explicit), never a hang
    intercept[Exception](Gif.decodeFrames("GIF8 almost".getBytes))
    intercept[IllegalArgumentException](Gif.decodeFrames("nope".getBytes))
  }
}
