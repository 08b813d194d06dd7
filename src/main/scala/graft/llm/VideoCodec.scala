package graft.llm

/** REAL byte-level video metadata codec — the third leg of the media
  * family (ImageCodec: PNG/JPEG/GIF; AudioCodec: WAV/FLAC): ISO BMFF/MP4
  * (big-endian box walk, `mvhd` timescale/duration + `tkhd` 16.16
  * fixed-point dimensions — what `ffprobe`/`mp4info` read before any
  * sample is touched) and AVI (RIFF little-endian `LIST hdrl` / `avih`
  * main header: frame period, frame count, dimensions). Pixel/codec
  * payload decode stays env-bounded (no media libs in this container);
  * the header logic verifies magic, declared-size consistency at every
  * nesting level, and field ranges, so genuinely corrupt bytes parse
  * invalid instead of producing garbage metadata.
  *
  * Encoders exist so tests and the oracle can plant corpora with known
  * geometry: `parse(encodeMp4(ts, d, w, h))` returns exactly
  * (w, h, d·1000/ts) — the construct∘parse identity `llm_video_meta`
  * hash-gates.
  */
object VideoCodec {

  final case class VideoMeta(
      format: String,
      width: Int,
      height: Int,
      durationMs: Long,
      valid: Boolean)

  val Invalid = VideoMeta("unknown", 0, 0, 0L, valid = false)

  // big-endian helpers (ISO BMFF) -----------------------------------------

  private def be32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8L) ++ fourcc(typ) ++ payload

  // little-endian helpers (RIFF/AVI) --------------------------------------

  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
    ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)

  private def readLe32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  // ---------------------------------------------------------------- MP4 --

  /** Minimal structurally-valid ISO BMFF: `ftyp` + `moov(mvhd, trak(tkhd))`
    * with version-0 full boxes; dimensions are stored 16.16 fixed-point in
    * `tkhd` exactly per the spec. */
  def encodeMp4(
      timescale: Int, durationTicks: Long, width: Int, height: Int): Array[Byte] = {
    require(timescale > 0, s"bad timescale $timescale")
    require(durationTicks >= 0 && durationTicks <= 0xffffffffL, s"bad duration $durationTicks")
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"bad dims ${width}x$height")
    val ftyp = box("ftyp", fourcc("isom") ++ be32(512L) ++ fourcc("isom"))
    val mvhd = box("mvhd",
      be32(0L) ++ be32(0L) ++ be32(0L) ++ // version/flags, ctime, mtime
        be32(timescale.toLong) ++ be32(durationTicks) ++
        be32(0x00010000L) ++ // rate 1.0
        Array.fill[Byte](2)(0) ++ // volume (video: 0)
        Array.fill[Byte](10)(0) ++ // reserved
        Array.fill[Byte](36)(0) ++ // matrix
        Array.fill[Byte](24)(0) ++ // pre_defined
        be32(2L)) // next_track_ID
    val tkhd = box("tkhd",
      be32(0L) ++ be32(0L) ++ be32(0L) ++ // version/flags, ctime, mtime
        be32(1L) ++ be32(0L) ++ // track_ID, reserved
        be32(durationTicks) ++
        Array.fill[Byte](8)(0) ++ // reserved
        Array.fill[Byte](8)(0) ++ // layer, alt_group, volume, reserved
        Array.fill[Byte](36)(0) ++ // matrix
        be32(width.toLong << 16) ++ be32(height.toLong << 16)) // 16.16 fixed
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  /** Box-walk an ISO BMFF file: every declared size must fit its enclosing
    * extent exactly (a size-lying box invalidates the file, the RIFF/PNG
    * discipline), `mvhd` supplies timescale+duration, `tkhd` the fixed-
    * point dimensions. */
  def parseMp4(b: Array[Byte]): VideoMeta = {
    if (b.length < 16) return Invalid
    if (new String(b, 4, 4, "US-ASCII") != "ftyp") return Invalid
    var timescale = 0L
    var duration = -1L
    var width = 0
    var height = 0
    def walk(from: Int, to: Int, depth: Int): Boolean = {
      var off = from
      while (off < to) {
        if (off + 8 > to) return false
        val size = readBe32(b, off)
        if (size < 8 || off + size > to) return false // size lies
        val typ = new String(b, off + 4, 4, "US-ASCII")
        typ match {
          case "moov" | "trak" =>
            if (depth > 4) return false
            if (!walk(off + 8, off + size.toInt, depth + 1)) return false
          case "mvhd" =>
            if (size < 8 + 100 || (b(off + 8) & 0xff) != 0) return false
            timescale = readBe32(b, off + 8 + 12)
            duration = readBe32(b, off + 8 + 16)
          case "tkhd" =>
            if (size < 8 + 84 || (b(off + 8) & 0xff) != 0) return false
            width = (readBe32(b, off + 8 + 76) >>> 16).toInt
            height = (readBe32(b, off + 8 + 80) >>> 16).toInt
          case _ => () // skip unknown boxes (spec-compliant)
        }
        off += size.toInt
      }
      off == to
    }
    if (!walk(0, b.length, 0)) Invalid
    else if (timescale <= 0 || duration < 0 || width <= 0 || height <= 0) Invalid
    else VideoMeta("mp4", width, height, duration * 1000L / timescale, valid = true)
  }

  // ---------------------------------------------------------------- AVI --

  /** Minimal structurally-valid AVI: RIFF/`AVI ` + `LIST hdrl` holding the
    * `avih` main header (frame period in µs, total frames, dims). */
  def encodeAvi(
      usPerFrame: Int, totalFrames: Long, width: Int, height: Int): Array[Byte] = {
    require(usPerFrame > 0, s"bad frame period $usPerFrame")
    require(totalFrames >= 0 && totalFrames <= 0xffffffffL, s"bad frames $totalFrames")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val avih = le32(usPerFrame.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(totalFrames) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(width.toLong) ++ le32(height.toLong) ++ Array.fill[Byte](16)(0)
    val hdrl = fourcc("hdrl") ++ fourcc("avih") ++ le32(avih.length.toLong) ++ avih
    val riffBody = fourcc("AVI ") ++
      fourcc("LIST") ++ le32(hdrl.length.toLong) ++ hdrl
    fourcc("RIFF") ++ le32(riffBody.length.toLong) ++ riffBody
  }

  /** Chunk-walk the RIFF container: declared RIFF size must match the byte
    * count, the `hdrl` LIST must carry a full `avih`. */
  def parseAvi(b: Array[Byte]): VideoMeta = {
    if (b.length < 12) return Invalid
    if (new String(b, 0, 4, "US-ASCII") != "RIFF") return Invalid
    if (readLe32(b, 4) != b.length - 8L) return Invalid
    if (new String(b, 8, 4, "US-ASCII") != "AVI ") return Invalid
    var off = 12
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = readLe32(b, off + 4)
      if (off + 8 + size > b.length) return Invalid
      if (id == "LIST" && size >= 4 &&
        new String(b, off + 8, 4, "US-ASCII") == "hdrl") {
        var in = off + 12
        val end = off + 8 + size.toInt
        while (in + 8 <= end) {
          val cid = new String(b, in, 4, "US-ASCII")
          val csize = readLe32(b, in + 4)
          if (in + 8 + csize > end) return Invalid
          if (cid == "avih") {
            if (csize < 56) return Invalid
            val usPerFrame = readLe32(b, in + 8)
            val frames = readLe32(b, in + 8 + 16)
            val width = readLe32(b, in + 8 + 32).toInt
            val height = readLe32(b, in + 8 + 36).toInt
            if (usPerFrame <= 0 || width <= 0 || height <= 0) return Invalid
            return VideoMeta("avi", width, height,
              usPerFrame * frames / 1000L, valid = true)
          }
          in += 8 + csize.toInt
        }
      }
      off += 8 + size.toInt
    }
    Invalid
  }

  // ------------------------------------------- MJPEG content decode ------
  //
  // REAL video CONTENT decode for the one codec family that is pure JVM
  // logic: Motion JPEG. An MJPEG AVI's `movi` chunks are each a complete
  // baseline JPEG, and ImageCodec.decodeJpegPixels is a full baseline
  // decoder — so frame decode + frame sampling + per-frame feature
  // extraction need no native library. Inter-frame codecs (H.264/VP9/AV1)
  // remain genuinely env-bounded: motion compensation needs a codec the
  // JVM does not ship.

  final case class FrameStats(
      nFrames: Long, nPixels: Long, sumLuma1000: Long,
      minLuma1000: Int, maxLuma1000: Int, valid: Boolean)

  val InvalidFrames = FrameStats(0L, 0L, 0L, 0, 0, valid = false)

  /** Structurally-honest MJPEG AVI: RIFF(AVI (LIST hdrl(avih, LIST
    * strl(strh 'vids'/'MJPG', strf BITMAPINFOHEADER)), LIST movi(00dc
    * JPEG frames))). Each frame is a COMPLETE baseline JPEG
    * (ImageCodec.encodeJpegPixels output or any other). */
  def encodeAviMjpeg(
      usPerFrame: Int, width: Int, height: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(usPerFrame > 0, s"bad frame period $usPerFrame")
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc(id) ++ le32(data.length.toLong) ++ data ++ pad // RIFF word align
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      fourcc("LIST") ++ le32(body.length + 4L) ++ fourcc(typ) ++ body
    val avih = le32(usPerFrame.toLong) ++ le32(0L) ++ le32(0L) ++ le32(0L) ++
      le32(frames.length.toLong) ++ le32(0L) ++ le32(1L) ++ le32(0L) ++
      le32(width.toLong) ++ le32(height.toLong) ++ Array.fill[Byte](16)(0)
    val strh = fourcc("vids") ++ fourcc("MJPG") ++ Array.fill[Byte](48)(0)
    val strf = le32(40L) ++ le32(width.toLong) ++ le32(height.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ fourcc("MJPG") ++ Array.fill[Byte](20)(0)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++
        list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi",
      frames.map(f => chunk("00dc", f)).reduce(_ ++ _))
    val riffBody = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(riffBody.length.toLong) ++ riffBody
  }

  /** REAL MJPEG frame decode with frame SAMPLING: walks the RIFF `movi`
    * list, takes every `stride`-th frame (the frame-sample op of a
    * multimodal pipeline — sampled frames are the only ones whose JPEG
    * payload is decoded at all), runs each through the full baseline JPEG
    * decoder, checks its dimensions against the `avih` header, and
    * aggregates the ×1000 BT.601 luma stats across sampled frames. Any
    * undecodable or dimension-lying frame — or a file with no decodable
    * stream — is valid=false, never a throw. */
  def decodeAviMjpegFrames(b: Array[Byte], stride: Int = 1): FrameStats = {
    try decodeAviMjpegFramesUnsafe(b, stride)
    catch { case _: Exception => InvalidFrames }
  }

  private def decodeAviMjpegFramesUnsafe(b: Array[Byte], stride: Int): FrameStats = {
    require(stride >= 1, s"bad stride $stride")
    val meta = parseAvi(b)
    if (!meta.valid) return InvalidFrames
    // find the movi list
    var off = 12
    var moviAt = -1
    var moviEnd = -1
    while (off + 8 <= b.length && moviAt < 0) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = readLe32(b, off + 4)
      if (off + 8 + size > b.length) return InvalidFrames
      if (id == "LIST" && size >= 4 &&
        new String(b, off + 8, 4, "US-ASCII") == "movi") {
        moviAt = off + 12
        moviEnd = off + 8 + size.toInt
      }
      off += 8 + size.toInt + (size.toInt % 2) // RIFF word alignment
    }
    if (moviAt < 0) return InvalidFrames
    var in = moviAt
    var idx = 0
    var n = 0L
    var px = 0L
    var sum = 0L
    var mn = Int.MaxValue
    var mx = Int.MinValue
    while (in + 8 <= moviEnd) {
      val cid = new String(b, in, 4, "US-ASCII")
      val csize = readLe32(b, in + 4)
      if (in + 8 + csize > moviEnd) return InvalidFrames
      if (cid == "00dc" || cid == "00db") {
        if (idx % stride == 0) { // frame sampling: skip without decoding
          val frame = java.util.Arrays.copyOfRange(b, in + 8, in + 8 + csize.toInt)
          val fm = ImageCodec.parseJpeg(frame)
          if (!fm.valid || fm.width != meta.width || fm.height != meta.height)
            return InvalidFrames
          val st = ImageCodec.decodeJpegPixels(frame)
          if (!st.valid) return InvalidFrames
          n += 1
          px += st.nPixels
          sum += st.sumLuma1000
          if (st.minLuma1000 < mn) mn = st.minLuma1000
          if (st.maxLuma1000 > mx) mx = st.maxLuma1000
        }
        idx += 1
      }
      in += 8 + csize.toInt + (csize.toInt % 2)
    }
    if (n == 0) InvalidFrames
    else FrameStats(n, px, sum, mn, mx, valid = true)
  }

  // -------------------------------------------------------------- sniff --

  /** Sniff the container and dispatch; anything unrecognized is Invalid,
    * never an exception (F18 discipline — corrupt rows flow to quarantine). */
  def parse(b: Array[Byte]): VideoMeta = {
    try {
      if (b == null || b.length < 12) Invalid
      else if (new String(b, 4, 4, "US-ASCII") == "ftyp") parseMp4(b)
      else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') parseAvi(b)
      else Invalid
    } catch { case _: IndexOutOfBoundsException => Invalid }
  }
}
