package graft

import graft.multimodal.ImageCodec
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Round 16: the fast gray-PNG path must be pixel-exact against ImageIO in
  * BOTH directions — the optimization's whole correctness contract is that
  * only the compressed byte stream changes, never a sample.
  */
class FastGrayPngSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def samples(img: BufferedImage): Seq[Int] = {
    val r = img.getRaster
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield r.getSample(x, y, 0)
  }

  test("fast-encoded gray PNG decodes pixel-identical via ImageIO AND the fast reader") {
    for (seed <- Seq(0L, 7L, 123L); (w, h) <- Seq((32, 24), (9, 8), (1, 1), (17, 3))) {
      val img = ImageCodec.renderGrayImage(seed, w, h)
      val png = ImageCodec.encodePng(img) // fast writer for TYPE_BYTE_GRAY
      val viaImageIO = ImageIO.read(new ByteArrayInputStream(png))
      assert(viaImageIO != null, s"ImageIO rejected the fast PNG ($w x $h)")
      assert(samples(viaImageIO) === samples(img), s"ImageIO pixel drift ($w x $h)")
      val viaFast = ImageCodec.decode(png).get
      assert(samples(viaFast) === samples(img), s"fast-reader pixel drift ($w x $h)")
    }
  }

  test("fast reader decodes ImageIO-written gray PNGs (foreign filter choices) exactly") {
    val img = ImageCodec.renderGrayImage(42L, 40, 30)
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", bos)) // the JDK writer picks its own row filters
    val png = bos.toByteArray
    val back = ImageCodec.decode(png).get
    assert(samples(back) === samples(img))
  }

  test("header metadata of the fast PNG reads as 8-bit single-band png") {
    val png = ImageCodec.renderGrayPng(5L, 23, 11)
    assert(ImageCodec.decodeMeta(png) === Some((23, 11, 1, "png")))
  }

  test("non-matching payloads fall through: RGB PNG, JPEG, garbage") {
    val rgb = new BufferedImage(5, 4, BufferedImage.TYPE_3BYTE_BGR)
    rgb.setRGB(2, 2, 0x884422)
    val rgbPng = ImageCodec.encodePng(rgb) // ImageIO path (not byte-gray)
    val dec = ImageCodec.decode(rgbPng).get
    assert((dec.getRGB(2, 2) & 0xFFFFFF) === 0x884422)
    assert(ImageCodec.decode("not a png".getBytes("UTF-8")) === None)
    val jpg = ImageCodec.encode(ImageCodec.renderGrayImage(3L, 16, 16), "jpeg")
    assert(ImageCodec.decode(jpg).isDefined) // ImageIO fallback still works
  }

  test("a CRC-corrupted gray PNG decodes to None, never garbage pixels (ADVICE r16)") {
    val img = ImageCodec.renderGrayImage(11L, 16, 12)
    val png = ImageCodec.encodePng(img)
    // flip one byte inside the IDAT payload (IHDR chunk spans bytes 8..32;
    // IDAT data starts at 41) — the stored CRC no longer matches, so the
    // fast reader must refuse and the ImageIO fallback rejects it too
    val corrupted = png.clone()
    corrupted(45) = (corrupted(45) ^ 0x5A).toByte
    assert(ImageCodec.decode(corrupted).isEmpty, "corrupted IDAT must not decode")
    // corrupt only the stored IHDR CRC (data bytes intact): ImageIO happens
    // to tolerate that, decoding the correct pixels — the contract is
    // "never DIFFERENT from ImageIO", so the fast path must refuse and the
    // fallback must yield the same samples as the pristine stream
    val badIhdr = png.clone()
    badIhdr(30) = (badIhdr(30) ^ 0x5A).toByte
    val viaFallback = ImageCodec.decode(badIhdr)
    val viaImageIO  = Option(ImageIO.read(new ByteArrayInputStream(badIhdr)))
    assert(viaFallback.map(samples) == viaImageIO.map(samples),
      "bad-IHDR-CRC decode must match ImageIO exactly")
  }

  test("renderGrayImage with delta equals render → brighten, sample for sample") {
    val base    = ImageCodec.renderGrayPng(11L, 32, 24)
    val brightA = ImageCodec.brighten(base, 40).get
    val brightB = ImageCodec.encodePng(ImageCodec.renderGrayImage(11L, 32, 24, delta = 40))
    assert(java.util.Arrays.equals(brightA, brightB),
      "fused render-with-delta must be byte-identical to the brighten round trip")
  }
}
