package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class VideoCodecSpec extends AnyFunSuite with Matchers {
  import VideoCodec._

  test("MP4 roundtrip across timescales, durations, and fixed-point dims") {
    for {
      ts <- Seq(600, 1000, 90000)
      d <- Seq(0L, 1L, 30000L, 0xffffffffL)
      (w, h) <- Seq((16, 16), (1280, 720), (65535, 65535))
    } {
      val m = parse(encodeMp4(ts, d, w, h))
      withClue(s"$ts/$d/${w}x$h") {
        m shouldBe VideoMeta("mp4", w, h, d * 1000L / ts, valid = true)
      }
    }
  }

  test("AVI roundtrip across frame periods and counts") {
    for {
      us <- Seq(16667, 33333, 41708) // 60/30/24 fps
      f <- Seq(0L, 1L, 1440L, 0xffffffffL)
    } {
      val m = parse(encodeAvi(us, f, 640, 480))
      withClue(s"$us/$f") {
        m shouldBe VideoMeta("avi", 640, 480, us * f / 1000L, valid = true)
      }
    }
  }

  test("declared-size lies are rejected at every nesting level") {
    val mp4 = encodeMp4(1000, 5000L, 320, 240)
    // moov size (top level), trak size (nested), tkhd size (leaf)
    for (off <- Seq(23, 20 + 8 + 108 + 3, 20 + 8 + 108 + 8 + 3)) {
      val b = mp4.clone(); b(off) = (b(off) ^ 0x5a).toByte
      withClue(s"mp4 size byte $off") { parse(b).valid shouldBe false }
    }
    val avi = encodeAvi(33333, 100L, 320, 240)
    for (off <- Seq(4, 16)) { // RIFF size, LIST size
      val b = avi.clone(); b(off) = (b(off) ^ 0x5a).toByte
      withClue(s"avi size byte $off") { parse(b).valid shouldBe false }
    }
  }

  test("version/magic checks: non-v0 full boxes and wrong fourcc reject") {
    val mp4 = encodeMp4(1000, 5000L, 320, 240)
    val badVer = mp4.clone(); badVer(20 + 8 + 8) = 1.toByte // mvhd version=1
    parse(badVer).valid shouldBe false
    val badMagic = mp4.clone(); badMagic(4) = 'x'.toByte
    parse(badMagic).valid shouldBe false
    val avi = encodeAvi(33333, 100L, 320, 240)
    val badAvi = avi.clone(); badAvi(8) = 'x'.toByte // 'AVI ' fourcc
    parse(badAvi).valid shouldBe false
  }

  test("truncation at every prefix length is invalid, never a crash") {
    val mp4 = encodeMp4(90000, 123456L, 1920, 1080)
    for (n <- 0 until mp4.length) parse(mp4.take(n)).valid shouldBe false
    val avi = encodeAvi(16667, 9999L, 1920, 1080)
    for (n <- 0 until avi.length) parse(avi.take(n)).valid shouldBe false
    parse(null) shouldBe Invalid
    parse(Array.fill[Byte](64)(0x2a)) shouldBe Invalid
  }

  // ------------------------------------------------ MJPEG content --------

  private def tileFrame(w: Int, h: Int, f: Int): Array[Byte] = {
    val y = Array.tabulate(w * h) { p =>
      val tx = (p % w) / 8; val ty = (p / w) / 8
      ((f * 41 + tx * 53 + ty * 101 + 7) % 256).toByte
    }
    ImageCodec.encodeJpegPixels(w, h, Array(y))
  }

  test("MJPEG: per-frame decode is bit-exact on tile-constant frames") {
    val (w, h) = (24, 16)
    val frames = (0 until 5).map(tileFrame(w, h, _))
    val avi = encodeAviMjpeg(40000, w, h, frames)
    parseAvi(avi).valid shouldBe true // header walk still agrees
    val st = decodeAviMjpegFrames(avi)
    st.valid shouldBe true
    st.nFrames shouldBe 5L
    st.nPixels shouldBe (5L * w * h)
    val lumas = for {
      f <- 0 until 5; ty <- 0 until h / 8; tx <- 0 until w / 8
    } yield ((f * 41 + tx * 53 + ty * 101 + 7) % 256) * 1000
    st.sumLuma1000 shouldBe lumas.map(_.toLong * 64).sum
    st.minLuma1000 shouldBe lumas.min
    st.maxLuma1000 shouldBe lumas.max
  }

  test("MJPEG frame sampling: stride-k decodes exactly every k-th frame") {
    val (w, h) = (16, 8)
    val frames = (0 until 7).map(tileFrame(w, h, _))
    val avi = encodeAviMjpeg(40000, w, h, frames)
    for (stride <- 1 to 4) {
      val st = decodeAviMjpegFrames(avi, stride)
      val sampled = (0 until 7).filter(_ % stride == 0)
      withClue(s"stride=$stride") {
        st.valid shouldBe true
        st.nFrames shouldBe sampled.length.toLong
        val lumas = for {
          f <- sampled; ty <- 0 until h / 8; tx <- 0 until w / 8
        } yield ((f * 41 + tx * 53 + ty * 101 + 7) % 256) * 1000
        st.sumLuma1000 shouldBe lumas.map(_.toLong * 64).sum
      }
    }
  }

  test("MJPEG rejects: corrupt frame, dimension-lying frame, truncation, header-only") {
    val (w, h) = (16, 8)
    val frames = (0 until 3).map(tileFrame(w, h, _))
    val avi = encodeAviMjpeg(40000, w, h, frames)
    decodeAviMjpegFrames(avi).valid shouldBe true
    // break a frame's SOI marker: the per-frame JPEG parse must refuse
    // (JPEG carries no checksum, so entropy-byte flips can legitimately
    // still decode — structural damage is the detectable corruption class)
    val corrupt = avi.clone()
    val moviAt = {
      var i = 12
      while (!(new String(corrupt, i, 4, "US-ASCII") == "LIST" &&
        new String(corrupt, i + 8, 4, "US-ASCII") == "movi")) i += 1
      i
    }
    // first chunk: moviAt+12 = "00dc", +16 = size, +20 = JPEG SOI
    new String(corrupt, moviAt + 12, 4, "US-ASCII") shouldBe "00dc"
    corrupt(moviAt + 20) = 0x00
    decodeAviMjpegFrames(corrupt).valid shouldBe false
    // a frame whose dims disagree with the avih header
    val liar = encodeAviMjpeg(40000, w, h,
      frames.init :+ tileFrame(32, 16, 0))
    decodeAviMjpegFrames(liar).valid shouldBe false
    // truncation is invalid, never a crash
    for (n <- 0 until avi.length by 7)
      decodeAviMjpegFrames(avi.take(n)).valid shouldBe false
    // a metadata-only AVI has no movi list
    decodeAviMjpegFrames(encodeAvi(40000, 3L, w, h)).valid shouldBe false
  }
}
