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
}
