package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ImageCodecSpec extends AnyFunSuite with Matchers {
  import ImageCodec._

  test("PNG roundtrip across the dimension range, including 1x1") {
    for ((w, h) <- Seq((1, 1), (16, 16), (960, 640), (4096, 2160), (1, 99999))) {
      val m = parse(encodePng(w, h, Array[Byte](1, 2, 3)))
      m shouldBe ImageMeta("png", w, h, valid = true)
    }
  }

  test("JPEG roundtrip and marker walk past APP0") {
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 65535))) {
      parse(encodeJpeg(w, h)) shouldBe ImageMeta("jpeg", w, h, valid = true)
    }
  }

  test("GIF roundtrip is little-endian") {
    parse(encodeGif(640, 480)) shouldBe ImageMeta("gif", 640, 480, valid = true)
    // hand-built, low byte first: w = 0x02 + (0x01 << 8) = 258,
    // h = 0x00 + (0x01 << 8) = 256
    val g = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x02, 0x01, 0x00, 0x01, 0, 0, 0, 0x3b)
    parse(g) shouldBe ImageMeta("gif", 258, 256, valid = true)
  }

  test("a single bit flip in the PNG IHDR fails the CRC, not just big damage") {
    val b = encodePng(960, 640, Array[Byte](9, 9, 9))
    for (off <- 8 until 33) { // anywhere in the IHDR chunk incl. its CRC
      val c = b.clone(); c(off) = (c(off) ^ 0x01).toByte
      withClue(s"flip at $off")(parsePng(c).valid shouldBe false)
    }
  }

  test("truncation before the header is complete is invalid, never a crash") {
    // metadata lives in a fixed-position header: PNG needs sig+IHDR (33
    // bytes), JPEG needs SOI+APP0+SOF (33 in this shell), GIF needs 10.
    // Any shorter prefix must parse invalid; once the header is complete,
    // payload truncation is (correctly) invisible to a metadata parser.
    val sources = Seq(
      (encodePng(64, 64, Array[Byte](1)), 33),
      (encodeJpeg(64, 64), 33),
      (encodeGif(64, 64), 10))
    for ((b, metaLen) <- sources) {
      for (n <- 0 until metaLen) parse(b.take(n)).valid shouldBe false
      for (n <- metaLen to b.length) parse(b.take(n)).valid shouldBe true
    }
  }

  test("JPEG missing its SOF parses invalid (EOI reached first)") {
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte, 0, 4, 0, 0) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    parseJpeg(noSof).valid shouldBe false
  }

  test("unknown magic sniffs to invalid") {
    parse("not an image at all".getBytes("US-ASCII")).valid shouldBe false
    parse(null).valid shouldBe false
    parse(Array.empty[Byte]).valid shouldBe false
  }

  private def lumaStats(rgb: Array[Byte]): (Long, Int, Int) = {
    val lumas = rgb.grouped(3).map(p =>
      (p(0) & 0xff) * 299 + (p(1) & 0xff) * 587 + (p(2) & 0xff) * 114).toSeq
    (lumas.map(_.toLong).sum, lumas.min, lumas.max)
  }

  test("PNG pixel decode reverses deflate + every scanline filter exactly") {
    val rnd = new scala.util.Random(17)
    // each single filter type alone, then a mix cycling all five
    val filters: Seq[Int => Int] =
      (0 to 4).map(f => (_: Int) => f) :+ ((y: Int) => y % 5)
    for ((rf, idx) <- filters.zipWithIndex; (w, h) <- Seq((1, 1), (7, 3), (16, 9))) {
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val st = decodePngPixels(encodePngPixels(w, h, rgb, rf))
      val (sum, mn, mx) = lumaStats(rgb)
      withClue(s"filter set $idx, ${w}x$h: ") {
        st shouldBe PixelStats(w.toLong * h, sum, mn, mx, valid = true)
      }
    }
  }

  test("PNG pixel decode rejects IDAT corruption, truncation, and trailing garbage") {
    val rgb = Array.tabulate[Byte](12 * 5 * 3)(i => (i * 7).toByte)
    val png = encodePngPixels(12, 5, rgb, _ % 5)
    decodePngPixels(png).valid shouldBe true
    // flip one IDAT payload byte: the chunk CRC must catch it
    val idatOff = 8 + 25 // sig + IHDR chunk(4+4+13+4)
    val corrupt = png.clone()
    corrupt(idatOff + 8 + 3) = (corrupt(idatOff + 8 + 3) ^ 0x5a).toByte
    decodePngPixels(corrupt).valid shouldBe false
    // truncated file: invalid, never a crash
    for (n <- 0 until png.length by 7) decodePngPixels(png.take(n)).valid shouldBe false
    // wrong color type (grayscale) refuses pixel decode
    val gray = png.clone(); gray(25) = 0
    decodePngPixels(gray).valid shouldBe false
    // metadata-only shell (arbitrary payload) fails the inflate stage
    decodePngPixels(encodePng(4, 4, Array[Byte](1, 2, 3))).valid shouldBe false
  }
}
