package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRow}

/** End-to-end proof that the multimodal pipeline decodes REAL images:
  * PNGs are generated in-memory (deterministic pixel patterns), wrapped
  * as MediaRows, and driven through the same `mapPartitions` decode
  * pipeline the catalog uses — with `ImageCodec` (javax.imageio) in
  * place of the deterministic stub. */
class ImageCodecSpec extends SparkSpec {

  private def png(w: Int, h: Int, rgb: (Int, Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y, 0))
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out), "no PNG writer in this JDK")
    out.toByteArray
  }

  test("ImageCodec decodes a generated PNG: dimensions and channel means") {
    // 4x2 solid red
    val red = Multimodal.ImageCodec.decode(png(4, 2, (_, _, _) => 0xff0000))
    assert(red(0) == 4f && red(1) == 2f, "width/height")
    assert(red(2) == 255f && red(3) == 0f && red(4) == 0f, "solid red means")
    assert(math.abs(red(5) - 0.299f * 255f) < 0.01f, "BT.601 luma")
    assert(red(6) == 2f, "aspect ratio")

    // 2x2 checkerboard black/white -> all channel means 127.5
    val checker = Multimodal.ImageCodec.decode(
      png(2, 2, (x, y, _) => if ((x + y) % 2 == 0) 0xffffff else 0x000000))
    assert(checker(2) == 127.5f && checker(3) == 127.5f && checker(4) == 127.5f)
  }

  test("corrupt payload degrades to a zero vector, not a task failure") {
    val junk = Multimodal.ImageCodec.decode(Array[Byte](1, 2, 3, 4, 5))
    assert(junk.toSeq == Seq.fill(Multimodal.ImageCodec.dim)(0f))
  }

  test("JPEG payloads decode through the same codec (lossy: means within ±2)") {
    // JPEG quantization shifts solid fills by at most a unit or two —
    // the gate rows stay on PNG for hash-exactness; this pins that the
    // codec path handles the other dominant web format end-to-end
    val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x6496c8)
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", out), "no JPEG writer in this JDK")
    val f = Multimodal.ImageCodec.decode(out.toByteArray)
    assert(f(0) == 16f && f(1) == 16f, s"dims wrong: ${f.toSeq}")
    assert(math.abs(f(2) - 0x64) <= 2 && math.abs(f(3) - 0x96) <= 2 &&
      math.abs(f(4) - 0xc8) <= 2, s"JPEG means drifted: ${f.toSeq}")
  }

  test("real PNGs flow through the distributed mapPartitions pipeline") {
    import spark.implicits._
    val redBytes = png(4, 2, (_, _, _) => 0xff0000)
    val greenBytes = png(3, 3, (_, _, _) => 0x00ff00)
    val rows = Seq(
      (1L, redBytes, 4, 2),
      (2L, greenBytes, 3, 3),
      (3L, Array[Byte](9, 9, 9), 0, 0)                 // corrupt blob
    ).map { case (id, bytes, w, h) =>
      MediaRow(id, bytes, MediaMeta("image/png", bytes.length.toLong, w, h))
    }.toDS().repartition(2)

    val feats = Multimodal.extractFeatures(rows, codec = Multimodal.ImageCodec)
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).features.take(5).toSeq == Seq(4f, 2f, 255f, 0f, 0f))
    assert(feats(2L).features.take(5).toSeq == Seq(3f, 3f, 0f, 255f, 0f))
    assert(feats(3L).features.toSeq == Seq.fill(8)(0f), "corrupt blob -> zeros")
    // the checksum is the shared Codec byte-fold over the PAYLOAD,
    // identical across codecs (decode changes features, not identity)
    assert(feats(1L).checksum == Multimodal.FakeCodec.checksum(redBytes))
    assert(feats(1L).n_bytes == redBytes.length.toLong)
  }
}
