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

  private val testPalette =
    Array.tabulate[Byte](768) { i =>
      val c = i / 3
      ((i % 3 match {
        case 0 => c * 7; case 1 => c * 13; case _ => c * 29
      }) % 256).toByte
    }

  private def gifLuma(indices: Array[Byte]): (Long, Int, Int) = {
    val lumas = indices.map { ib =>
      val c = ib & 0xff
      (c * 7 % 256) * 299 + (c * 13 % 256) * 587 + (c * 29 % 256) * 114
    }.toSeq
    (lumas.map(_.toLong).sum, lumas.min, lumas.max)
  }

  test("GIF LZW roundtrip: random index streams across dictionary growth to 12-bit codes") {
    val rnd = new scala.util.Random(41)
    for ((w, h) <- Seq((1, 1), (5, 4), (16, 16), (48, 48))) {
      val idx = Array.fill[Byte](w * h)(rnd.nextInt(256).toByte)
      val st = decodeGifPixels(encodeGifPixels(w, h, idx, testPalette))
      val (sum, mn, mx) = gifLuma(idx)
      withClue(s"${w}x$h: ") {
        st shouldBe PixelStats(w.toLong * h, sum, mn, mx, valid = true)
      }
    }
    // degenerate runs: constant and two-symbol streams (KwKwK territory)
    for (pattern <- Seq(Array.fill[Byte](300)(7),
      Array.tabulate[Byte](300)(j => (j % 2).toByte))) {
      val st = decodeGifPixels(encodeGifPixels(30, 10, pattern, testPalette))
      st.valid shouldBe true
      st.nPixels shouldBe 300L
    }
  }

  test("GIF LZW code-width timing: streams ending EXACTLY on a width boundary") {
    // Build an index stream whose consecutive pairs are all distinct, so
    // the dictionary gains exactly n-1 entries; n = 255 / 767 / 1791 puts
    // the counter at exactly 512 / 1024 / 2048 when END is written — the
    // one place the encoder/decoder one-entry lag closes. A width-timing
    // bug flips precisely these cases.
    def distinctPairStream(n: Int): Array[Byte] = {
      val used = scala.collection.mutable.Set.empty[(Int, Int)]
      val out = new Array[Byte](n)
      var cur = 0
      out(0) = 0
      for (j <- 1 until n) {
        // rotate the preference so prefix visits stay balanced (a fixed
        // smallest-b preference exhausts node 0's out-edges)
        val nxt = (1 to 256).map(t => (cur + t) % 256)
          .find(b => !used.contains((cur, b))).get
        used += ((cur, nxt))
        out(j) = nxt.toByte
        cur = nxt
      }
      out
    }
    for (n <- Seq(254, 255, 256, 766, 767, 768, 1790, 1791, 1792)) {
      val idx = distinctPairStream(n)
      val st = decodeGifPixels(encodeGifPixels(n, 1, idx, testPalette))
      val (sum, mn, mx) = gifLuma(idx)
      withClue(s"n=$n: ") {
        st shouldBe PixelStats(n.toLong, sum, mn, mx, valid = true)
      }
    }
  }

  test("GIF pixel decode rejects truncation, bad dims, and short streams") {
    val idx = Array.tabulate[Byte](60)(j => (j * 11).toByte)
    val gif = encodeGifPixels(10, 6, idx, testPalette)
    decodeGifPixels(gif).valid shouldBe true
    for (n <- 0 until gif.length by 5)
      decodeGifPixels(gif.take(n)).valid shouldBe false
    // image-descriptor dims disagreeing with the screen descriptor
    val badDims = gif.clone()
    badDims(6) = (badDims(6) + 1).toByte // screen width no longer matches
    decodeGifPixels(badDims).valid shouldBe false
    // metadata-only shell (no pixel stream) must not pass
    decodeGifPixels(encodeGif(4, 4)).valid shouldBe false
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

  // ------------------------------------------------------------- JPEG ----

  test("JPEG tile-constant round trip is bit-exact (gray and neutral-chroma)") {
    for ((w, h) <- Seq((8, 8), (24, 16), (16, 24))) {
      val yPlane = Array.tabulate(w * h) { p =>
        val tx = (p % w) / 8; val ty = (p / w) / 8
        ((tx * 53 + ty * 101 + 7) % 256).toByte
      }
      val expectedLumas = (for {
        ty <- 0 until h / 8; tx <- 0 until w / 8
      } yield ((tx * 53 + ty * 101 + 7) % 256) * 1000).toArray
      for (planes <- Seq(
        Array(yPlane),
        Array(yPlane, Array.fill(w * h)(128.toByte), Array.fill(w * h)(128.toByte)))) {
        val st = decodeJpegPixels(encodeJpegPixels(w, h, planes))
        withClue(s"${w}x$h planes=${planes.length}: ") {
          st.valid shouldBe true
          st.nPixels shouldBe (w * h).toLong
          st.sumLuma1000 shouldBe expectedLumas.map(_.toLong * 64).sum
          st.minLuma1000 shouldBe expectedLumas.min
          st.maxLuma1000 shouldBe expectedLumas.max
        }
      }
    }
  }

  test("JPEG arbitrary images round-trip within quantization tolerance") {
    val rnd = new scala.util.Random(7)
    for ((w, h) <- Seq((8, 8), (19, 13), (32, 24))) { // incl. partial blocks
      val planes = Array.fill(3)(Array.tabulate(w * h)(_ => rnd.nextInt(256).toByte))
      val Some((dw, dh, rgb)) = decodeJpegToRgb(encodeJpegPixels(w, h, planes))
      dw shouldBe w; dh shouldBe h
      // reference: exact same color conversion applied to the ORIGINAL
      // planes; per-channel error bounded by the quantizer's worst case
      var worst = 0
      for (p <- 0 until w * h) {
        val yy = planes(0)(p) & 0xff
        val cb = (planes(1)(p) & 0xff) - 128
        val cr = (planes(2)(p) & 0xff) - 128
        def cl(d: Double) = math.max(0, math.min(255, Math.round(d).toInt))
        val exp = Seq(cl(yy + 1.402 * cr),
          cl(yy - 0.344136 * cb - 0.714136 * cr), cl(yy + 1.772 * cb))
        for (c <- 0 to 2)
          worst = math.max(worst, math.abs((rgb(3 * p + c) & 0xff) - exp(c)))
      }
      // AC step 16 ⇒ per-coefficient error ≤ 8; the IDCT spreads worst-case
      // coherent error far below this in practice
      withClue(s"${w}x$h worst channel error $worst: ")(worst should be <= 96)
    }
  }

  test("JPEG restart intervals: DRI + RSTn markers decode identically") {
    val w = 40; val h = 16 // 5x2 = 10 MCUs
    val yPlane = Array.tabulate(w * h)(p => ((p * 13 + 5) % 256).toByte)
    val plain = decodeJpegPixels(encodeJpegPixels(w, h, Array(yPlane)))
    plain.valid shouldBe true
    for (ri <- Seq(1, 3, 4)) {
      val st = decodeJpegPixels(encodeJpegPixels(w, h, Array(yPlane), restartInterval = ri))
      withClue(s"restartInterval=$ri: ")(st shouldBe plain)
    }
  }

  test("JPEG decode rejects truncation, progressive frames, and the metadata shell") {
    val yPlane = Array.tabulate(64)(p => (p * 3).toByte)
    val jpeg = encodeJpegPixels(8, 8, Array(yPlane))
    decodeJpegPixels(jpeg).valid shouldBe true
    for (n <- 0 until jpeg.length by 5)
      decodeJpegPixels(jpeg.take(n)).valid shouldBe false
    // flip SOF0 marker to SOF2 (progressive): refused, not mis-decoded
    val prog = jpeg.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    decodeJpegPixels(prog).valid shouldBe false
    // the dimension-only shell has no tables and no scan
    decodeJpegPixels(encodeJpeg(8, 8)).valid shouldBe false
    // garbage is invalid, never a throw
    decodeJpegPixels(Array.tabulate[Byte](100)(_.toByte)).valid shouldBe false
  }

  test("pngAHash: content-derived, encoding- and brightness-invariant, corrupt-safe") {
    val w = 8; val h = 8
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 53 + 11) % 256).toByte)
    val a = encodePngPixels(w, h, rgb, y => y % 5)
    // same pixels, every row filtered differently → different bytes
    val b = encodePngPixels(w, h, rgb, y => (y + 1) % 5)
    java.util.Arrays.equals(a, b) shouldBe false
    pngAHash(a) shouldBe pngAHash(b)
    pngAHash(a).get should have length (w * h).toLong
    // uniform brightness +3 where no channel wraps → identical hash
    val bright = rgb.map(v => (((v & 0xff) % 250) + 3).toByte)
    val base = rgb.map(v => ((v & 0xff) % 250).toByte)
    pngAHash(encodePngPixels(w, h, bright, _ => 0)) shouldBe
      pngAHash(encodePngPixels(w, h, base, _ => 0))
    // different content → different hash
    val other = Array.tabulate(w * h * 3)(i => ((i * 151 + 7) % 256).toByte)
    pngAHash(encodePngPixels(w, h, other, _ => 0)) should not be pngAHash(a)
    // corruption → None, never a throw
    val bad = a.clone(); bad(40) = (bad(40) ^ 0x7f).toByte
    pngAHash(bad) shouldBe None
    pngAHash(Array.tabulate[Byte](60)(_.toByte)) shouldBe None
  }

  test("pngResizeNearest: exact floor-mapped resample, up and down, corrupt-safe") {
    val w = 10; val h = 6
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 29 + 5) % 256).toByte)
    val png = encodePngPixels(w, h, rgb, y => y % 5)

    // downscale 10x6 → 5x3: sx = x*10/5 = 2x, sy = y*6/3 = 2y
    val down = pngResizeNearest(png, 5, 3).get
    val expDown = Array.tabulate(5 * 3 * 3) { j =>
      val p = j / 3; val c = j % 3
      val sx = (p % 5) * 2; val sy = (p / 5) * 2
      rgb((sy * w + sx) * 3 + c) & 0xff
    }
    val expDownCs = expDown.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum
    pngWeightedChecksum(down).get shouldBe ((5, 3, expDownCs))

    // upscale 10x6 → 20x12: sx = x*10/20 = x/2, sy = y/2 — pixels repeat
    val up = pngResizeNearest(png, 20, 12).get
    val expUp = Array.tabulate(20 * 12 * 3) { j =>
      val p = j / 3; val c = j % 3
      val sx = (p % 20) * 10 / 20; val sy = (p / 20) * 6 / 12
      rgb((sy * w + sx) * 3 + c) & 0xff
    }
    val expUpCs = expUp.zipWithIndex.map { case (v, j) => v.toLong * (j + 1) }.sum
    pngWeightedChecksum(up).get shouldBe ((20, 12, expUpCs))

    // identity target reproduces the source pixels exactly
    pngWeightedChecksum(pngResizeNearest(png, w, h).get) shouldBe
      pngWeightedChecksum(png)

    // corruption → None, never a throw
    val bad = png.clone(); bad(40) = (bad(40) ^ 0x7f).toByte
    pngResizeNearest(bad, 4, 4) shouldBe None
    pngResizeNearest(Array.tabulate[Byte](60)(_.toByte), 4, 4) shouldBe None
  }
}
