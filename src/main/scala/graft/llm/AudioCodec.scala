package graft.llm

/** REAL byte-level audio metadata codec — the `ImageCodec` discipline
  * applied to sound containers: WAV/RIFF (little-endian chunk walk with a
  * declared-size consistency check) and FLAC (fLaC magic + the STREAMINFO
  * bit-packed block: 20-bit sample rate, 3-bit channels, 36-bit total
  * samples, big-endian). This is what `soundfile.info` / `ffprobe` read
  * before any sample is decoded — and it is the half every data-pipeline
  * audio gate (duration floors, sample-rate routing, mono/stereo splits)
  * actually consumes. PCM/entropy decode stays env-bounded (no audio libs
  * in this container); the header logic rejects genuinely corrupt input
  * (bad magic, truncation, declared sizes that disagree with the byte
  * count) rather than pattern-matching fake bytes.
  *
  * Encoders exist so tests and the oracle can plant corpora with known
  * sample counts: `parse(encode(sr, ch, n)).durationMs == n * 1000 / sr`
  * is the construct∘parse identity `llm_audio_meta` hash-gates.
  */
object AudioCodec {

  final case class AudioMeta(
      format: String,
      sampleRate: Int,
      channels: Int,
      durationMs: Long,
      valid: Boolean)

  val Invalid = AudioMeta("unknown", 0, 0, 0L, valid = false)

  // little-endian helpers (RIFF) ------------------------------------------

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ---------------------------------------------------------------- WAV --

  /** Minimal structurally-valid 16-bit PCM WAV: RIFF/WAVE header, `fmt `
    * chunk, `data` chunk of `nSamples` frames of deterministic bytes. */
  def encodeWav(sampleRate: Int, channels: Int, nSamples: Int): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nSamples >= 0,
      s"bad wav params $sampleRate/$channels/$nSamples")
    val blockAlign = channels * 2
    val byteRate = sampleRate * blockAlign
    val dataSize = nSamples * blockAlign
    val data = Array.tabulate(dataSize)(i => ((i * 31 + 7) % 251).toByte)
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(16)
    val riffBody = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(dataSize) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody
  }

  /** 16-bit PCM WAV with CALLER-SUPPLIED samples (channel-interleaved
    * little-endian), same container structure as [[encodeWav]] — the
    * encode half of content-level audio gates that need per-asset
    * signal, not just per-asset length. */
  def encodeWavSamples(
      sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0,
      s"bad wav params $sampleRate/$channels")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val blockAlign = channels * 2
    val byteRate = sampleRate * blockAlign
    val data = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(16)
    val riffBody = "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(riffBody.length) ++ riffBody
  }

  /** Fixed-point cos/sin tables for the 16-point DFT: floor(cos(2πj/16)
    * · 1024) (resp. sin) — INTEGER LITERALS shared verbatim with the
    * DuckDB oracle, so the spectrum below is exact cross-engine
    * arithmetic with no trig at query time. */
  private[llm] val Cos16 = Array[Long](1024, 946, 724, 391, 0, -392, -725,
    -947, -1024, -947, -725, -392, -1, 391, 724, 946)
  private[llm] val Sin16 = Array[Long](0, 391, 724, 946, 1024, 946, 724,
    391, 0, -392, -725, -947, -1024, -947, -725, -392)

  /** REAL spectral feature extraction — the mel-spectrogram front-end
    * math on actually-decoded PCM: non-overlapping 16-sample frames, an
    * 8-bin fixed-point DFT per frame (re/im against [[Cos16]]/[[Sin16]],
    * exact integer multiply-accumulate), per-bin power re²+im² summed
    * over frames. Tail samples short of a full frame are dropped (the
    * standard framing contract). Returns the 8 per-bin powers; None for
    * anything [[pcmStats]] would reject. No float anywhere — the whole
    * spectrum is oracle-restatable integer algebra. */
  def pcmSpectrum16(b: Array[Byte]): Option[Array[Long]] = {
    val meta = parse(b)
    if (!meta.valid || meta.format != "wav") return None
    var off = 12
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = readLe32(b, off + 4)
      if (id == "data") {
        val n = (size / 2).toInt // 16-bit samples, channel-interleaved
        val power = new Array[Long](8)
        var f = 0
        while ((f + 1) * 16 <= n) {
          var bin = 0
          while (bin < 8) {
            var re = 0L
            var im = 0L
            var j = 0
            while (j < 16) {
              val base = off + 8 + 2 * (f * 16 + j)
              val s = ((b(base + 1) << 8) | (b(base) & 0xff)).toShort.toLong
              val t = (bin * j) % 16
              re += s * Cos16(t)
              im += s * Sin16(t)
              j += 1
            }
            power(bin) += re * re + im * im
            bin += 1
          }
          f += 1
        }
        return Some(power)
      }
      off += 8 + size.toInt
    }
    None
  }

  /** Chunk-walk a RIFF/WAVE container: verify magic, the declared RIFF
    * size against the actual byte count, locate `fmt ` (PCM only) and
    * `data`, and require the declared data size to FIT — a truncated or
    * size-lying file parses invalid, exactly like a CRC failure in PNG. */
  def parseWav(b: Array[Byte]): AudioMeta = {
    if (b.length < 44) return Invalid
    if (new String(b, 0, 4, "US-ASCII") != "RIFF") return Invalid
    if (new String(b, 8, 4, "US-ASCII") != "WAVE") return Invalid
    if (readLe32(b, 4) != b.length - 8L) return Invalid
    var off = 12
    var sampleRate = 0
    var channels = 0
    var blockAlign = 0
    var dataSize = -1L
    var fmtSeen = false
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = readLe32(b, off + 4)
      if (off + 8 + size > b.length) return Invalid // declared size lies
      if (id == "fmt ") {
        if (size < 16) return Invalid
        if (readLe16(b, off + 8) != 1) return Invalid // PCM only
        channels = readLe16(b, off + 10)
        sampleRate = readLe32(b, off + 12).toInt
        blockAlign = readLe16(b, off + 20)
        fmtSeen = true
      } else if (id == "data") {
        dataSize = size
      }
      off += 8 + size.toInt
    }
    if (!fmtSeen || dataSize < 0 || sampleRate <= 0 || blockAlign <= 0) Invalid
    else {
      val nSamples = dataSize / blockAlign
      AudioMeta("wav", sampleRate, channels,
        nSamples * 1000L / sampleRate, valid = true)
    }
  }

  // --------------------------------------------------------------- FLAC --

  /** Minimal structurally-valid FLAC: `fLaC` magic + a last-block
    * STREAMINFO (type 0, 34 bytes) carrying the bit-packed sample rate /
    * channels / bits-per-sample / total-samples fields per the spec. */
  def encodeFlac(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), s"bad rate $sampleRate")
    require(channels >= 1 && channels <= 8, s"bad channels $channels")
    require(totalSamples >= 0 && totalSamples < (1L << 36), s"bad n $totalSamples")
    val info = new Array[Byte](34)
    // min/max block size 4096 (BE16 at 0 and 2); frame sizes left 0
    info(0) = 0x10; info(1) = 0x00; info(2) = 0x10; info(3) = 0x00
    // bytes 10..17: sr(20) | ch-1(3) | bps-1(5) | totalSamples(36), BE
    val bps = 16
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bps - 1).toLong << 36) | totalSamples
    var i = 0
    while (i < 8) {
      info(10 + i) = ((packed >>> (56 - 8 * i)) & 0xff).toByte
      i += 1
    }
    // bytes 18..33: md5 of the (absent) audio stream — zeros
    "fLaC".getBytes("US-ASCII") ++
      Array(0x80.toByte, 0.toByte, 0.toByte, 34.toByte) ++ info // last-block, type 0
  }

  /** Parse the STREAMINFO bit fields; magic, block type/length, and field
    * ranges are all verified. */
  def parseFlac(b: Array[Byte]): AudioMeta = {
    if (b.length < 42) return Invalid
    if (new String(b, 0, 4, "US-ASCII") != "fLaC") return Invalid
    if ((b(4) & 0x7f) != 0) return Invalid // first block must be STREAMINFO
    val blockLen = ((b(5) & 0xff) << 16) | ((b(6) & 0xff) << 8) | (b(7) & 0xff)
    if (blockLen != 34 || b.length < 8 + 34) return Invalid
    var packed = 0L
    var i = 0
    while (i < 8) { packed = (packed << 8) | (b(18 + i) & 0xffL); i += 1 }
    val sampleRate = (packed >>> 44).toInt
    val channels = ((packed >>> 41) & 0x7).toInt + 1
    val totalSamples = packed & ((1L << 36) - 1)
    if (sampleRate <= 0) Invalid
    else AudioMeta("flac", sampleRate, channels,
      totalSamples * 1000L / sampleRate, valid = true)
  }

  // ---------------------------------------------------- PCM features ----

  final case class PcmStats(
      nSamples: Long, sumSq: Long, zeroCrossings: Long, valid: Boolean)

  val InvalidPcm = PcmStats(0L, 0L, 0L, valid = false)

  /** REAL sample-level feature extraction from a WAV container: decode the
    * 16-bit little-endian PCM stream out of the `data` chunk and compute
    * the two classic audio-gate features — energy (Σ sample², the exact
    * integer under RMS) and the zero-crossing count (consecutive samples
    * with strictly opposite signs) — the silence/clipping/speech-vs-tone
    * heuristics a corpus audio filter runs before any model sees a clip.
    * This is actual signal math on actual decoded samples (the stub-free
    * half the env allows: PCM needs no codec library), not a byte hash.
    * Structural validation is `parseWav`'s; non-PCM/invalid input yields
    * valid=false, never a throw. */
  def pcmStats(b: Array[Byte]): PcmStats = {
    val meta = parse(b)
    if (!meta.valid || meta.format != "wav") return InvalidPcm
    // locate the data chunk (parseWav proved sizes consistent)
    var off = 12
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = readLe32(b, off + 4)
      if (id == "data") {
        val n = size / 2 // 16-bit samples, channel-interleaved
        var k = 0L
        var sumSq = 0L
        var crossings = 0L
        var prev = 0
        while (k < n) {
          val base = off + 8 + 2 * k.toInt
          val s = ((b(base + 1) << 8) | (b(base) & 0xff)).toShort.toInt
          sumSq += s.toLong * s.toLong
          if (k > 0 && ((prev < 0 && s > 0) || (prev > 0 && s < 0)))
            crossings += 1
          prev = s
          k += 1
        }
        return PcmStats(n, sumSq, crossings, valid = true)
      }
      off += 8 + size.toInt
    }
    InvalidPcm
  }

  // -------------------------------------------------------------- sniff --

  /** Sniff the container by magic and dispatch. */
  def parse(b: Array[Byte]): AudioMeta = {
    if (b == null || b.length < 4) Invalid
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') parseWav(b)
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') parseFlac(b)
    else Invalid
  }
}
