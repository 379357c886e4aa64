package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal.ImageResizeCodec

/** Pixel-level pinning of the exact integer box filter on NON-uniform
  * images (the gate row `q_media_resize` covers solid fills; this
  * covers the pooling math itself). */
class ImageResizeSpec extends AnyFunSuite {

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("checkerboard 4x4 -> 2x2: each cell averages its exact 2x2 block") {
    // red checkerboard: (x+y) even -> 255, odd -> 0; every 2x2 block
    // holds two of each -> truncated block mean 127
    val bytes = png(4, 4)((x, y) => if ((x + y) % 2 == 0) 0xff0000 else 0)
    val f = ImageResizeCodec(2, 2).decode(bytes)
    assert(f.toSeq == Seq(2f, 2f, 127f, 0f, 0f))
  }

  test("never upsamples: small image keeps its dims and exact means") {
    // 2x3 with distinct per-pixel green values 10,20,...,60: output is
    // identity (blocks are single pixels), mean = 35
    var v = 0
    val bytes = png(2, 3) { (_, _) => v += 10; v << 8 }
    val f = ImageResizeCodec(4, 4).decode(bytes)
    assert(f(0) == 2f && f(1) == 3f)
    assert(f(3) == 35f, s"green mean ${f(3)}")
  }

  test("non-divisible dims: 5x1 -> 2x1 splits blocks 2+3 exactly") {
    // blue row 10,20,30,40,50: cells [10,20] -> 15, [30,40,50] -> 40;
    // mean over cells = 27 (truncating float->int emulated by floor)
    val vals = Array(10, 20, 30, 40, 50)
    val bytes = png(5, 1)((x, _) => vals(x))
    val f = ImageResizeCodec(2, 1).decode(bytes)
    assert(f(0) == 2f && f(1) == 1f)
    assert(f(4) == (15 + 40) / 2f, s"blue mean ${f(4)}")
  }

  test("undecodable payload yields the zero vector") {
    assert(ImageResizeCodec(4, 4).decode(Array[Byte](1, 2, 3)).toSeq
      == Seq(0f, 0f, 0f, 0f, 0f))
  }
}
