package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AudioCodecSpec extends AnyFunSuite with Matchers {
  import AudioCodec._

  test("WAV roundtrip across rates, channel counts, and the empty stream") {
    for {
      sr <- Seq(8000, 16000, 44100, 48000)
      ch <- Seq(1, 2)
      n <- Seq(0, 1, 999, 48000)
    } {
      val m = parse(encodeWav(sr, ch, n))
      withClue(s"$sr/$ch/$n") {
        m shouldBe AudioMeta("wav", sr, ch, n * 1000L / sr, valid = true)
      }
    }
  }

  test("FLAC roundtrip unpacks the 20/3/36-bit STREAMINFO fields exactly") {
    for {
      sr <- Seq(8000, 44100, 96000, 655350) // 655350 needs all 20 bits
      ch <- Seq(1, 2, 8)
      n <- Seq(0L, 1L, 44100L, (1L << 36) - 1) // max needs all 36 bits
    } {
      val m = parse(encodeFlac(sr, ch, n))
      withClue(s"$sr/$ch/$n") {
        m shouldBe AudioMeta("flac", sr, ch, n * 1000L / sr, valid = true)
      }
    }
  }

  test("WAV declared-size lies are rejected: RIFF size and chunk size") {
    val b = encodeWav(16000, 2, 100)
    val riffLie = b.clone(); riffLie(4) = (riffLie(4) ^ 0x5a).toByte
    parse(riffLie).valid shouldBe false
    // grow the data chunk's declared size past the actual bytes
    val dataSizeOff = 40 // RIFF(12) + fmt hdr(8) + fmt(16) + "data"
    val chunkLie = b.clone()
    chunkLie(dataSizeOff) = (chunkLie(dataSizeOff) + 1).toByte
    parse(chunkLie).valid shouldBe false
  }

  test("FLAC structural checks: block type, block length, magic") {
    val b = encodeFlac(44100, 2, 44100L)
    val badType = b.clone(); badType(4) = (badType(4) | 0x01).toByte
    parse(badType).valid shouldBe false
    val badLen = b.clone(); badLen(6) = (badLen(6) ^ 0x5a).toByte
    parse(badLen).valid shouldBe false
    val badMagic = b.clone(); badMagic(0) = 'g'.toByte
    parse(badMagic).valid shouldBe false
  }

  test("truncation anywhere before the header completes is invalid, never a crash") {
    val wav = encodeWav(8000, 1, 10)
    for (n <- 0 until 44) parse(wav.take(n)).valid shouldBe false
    val flac = encodeFlac(8000, 1, 10L)
    for (n <- 0 until flac.length) parse(flac.take(n)).valid shouldBe false
    parse(flac).valid shouldBe true
  }

  test("non-PCM WAV is rejected (format tag != 1)") {
    val b = encodeWav(8000, 1, 10)
    b(20) = 3 // IEEE-float format tag
    parse(b).valid shouldBe false
  }

  test("pcmStats decodes the exact sample values: energy and crossings match a direct recompute") {
    for (n <- Seq(1, 2, 40, 777)) {
      val st = pcmStats(encodeWav(8000, 1, n))
      // re-derive every sample from the encoder's byte pattern directly
      val samples = (0 until n).map { k =>
        val lo = (2 * k * 31 + 7) % 251
        val hi = ((2 * k + 1) * 31 + 7) % 251
        ((hi << 8) | lo).toShort.toInt
      }
      withClue(s"n=$n") {
        st.valid shouldBe true
        st.nSamples shouldBe n.toLong
        st.sumSq shouldBe samples.map(s => s.toLong * s.toLong).sum
        st.zeroCrossings shouldBe samples.sliding(2).count {
          case Seq(a, b) => (a < 0 && b > 0) || (a > 0 && b < 0)
          case _         => false
        }.toLong
      }
    }
  }

  test("pcmStats on FLAC / corrupt / empty input is invalid, never a crash") {
    pcmStats(encodeFlac(8000, 1, 10L)).valid shouldBe false
    val bad = encodeWav(8000, 1, 10)
    bad(4) = (bad(4) ^ 0x5a).toByte
    pcmStats(bad).valid shouldBe false
    pcmStats(Array.emptyByteArray).valid shouldBe false
    // zero-sample stream: valid but silent
    val empty = pcmStats(encodeWav(8000, 1, 0))
    empty.valid shouldBe true
    empty.nSamples shouldBe 0L
    empty.sumSq shouldBe 0L
  }

  test("pcmSpectrum16: DFT bins match a direct recompute; tail framing; corrupt-safe") {
    // direct reimplementation of the bin algebra against the same tables
    def direct(samples: Array[Short]): Array[Long] = {
      val out = new Array[Long](8)
      for (f <- 0 until samples.length / 16; bin <- 0 until 8) {
        var re = 0L; var im = 0L
        for (j <- 0 until 16) {
          val t = (bin * j) % 16
          re += samples(f * 16 + j) * AudioCodec.Cos16(t)
          im += samples(f * 16 + j) * AudioCodec.Sin16(t)
        }
        out(bin) += re * re + im * im
      }
      out
    }
    val s = Array.tabulate(48)(k => (((k * 37) % 173) - 86).toShort)
    pcmSpectrum16(encodeWavSamples(8000, 1, s)).get shouldBe direct(s)

    // DC signal concentrates in bin 0 (others only see table floor error)
    val dc = Array.fill[Short](32)(100)
    val spec = pcmSpectrum16(encodeWavSamples(8000, 1, dc)).get
    spec(0) shouldBe spec.max
    spec(0) should be > 100L * spec.drop(1).max

    // tail samples short of a frame are dropped: 16+15 ≡ 16
    val t31 = Array.tabulate(31)(k => ((k * 91) % 200 - 100).toShort)
    pcmSpectrum16(encodeWavSamples(8000, 1, t31)).get shouldBe
      pcmSpectrum16(encodeWavSamples(8000, 1, t31.take(16))).get

    // FLAC / corrupt / empty → None, never a throw
    pcmSpectrum16(encodeFlac(8000, 1, 10L)) shouldBe None
    val bad2 = encodeWavSamples(8000, 1, s); bad2(4) = (bad2(4) ^ 0x5a).toByte
    pcmSpectrum16(bad2) shouldBe None
    pcmSpectrum16(Array.emptyByteArray) shouldBe None
  }
}
