package graft.llm

import java.util.zip.CRC32

/** REAL byte-level image metadata codec — the part of "decode" that needs
  * no media library, done properly: PNG (signature + IHDR walk with CRC32
  * verification), JPEG (marker-segment walk to SOF0/1/2), GIF (fixed
  * header, little-endian dims). This is what PIL's `Image.size` does under
  * the hood, in ~100 lines of pure JVM byte logic — so the multimodal
  * pipeline's metadata stage is no longer a stub: it parses genuine
  * container headers and rejects genuinely corrupt ones (bad magic, bad
  * CRC, truncation) instead of pattern-matching fake bytes.
  *
  * Pixel CONTENT decode is real for all three formats, no library
  * anywhere: PNG via actual zlib (`java.util.zip.Inflater`) + all five
  * scanline filters (`decodePngPixels`), GIF via a general LZW decoder
  * (`decodeGifPixels`), and JPEG via a complete baseline sequential
  * decoder — DHT-built Huffman tables, MCU entropy decode with byte
  * unstuffing and restart handling, dequantization, IDCT, YCbCr→RGB
  * (`decodeJpegPixels`). All three produce the same ×1000 integer BT.601
  * luma stats, so one oracle shape gates every format.
  *
  * Encoders exist so tests and the oracle gate can plant corpora with
  * known dimensions: `parse(encode(w, h)) == (w, h)` is the
  * construct∘parse identity the `llm_image_meta` query hash-gates.
  */
object ImageCodec {

  final case class ImageMeta(format: String, width: Int, height: Int, valid: Boolean)
  val Invalid = ImageMeta("unknown", 0, 0, valid = false)

  // ---------------------------------------------------------------- PNG --

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def crc32(parts: Array[Byte]*): Long = {
    val c = new CRC32
    parts.foreach(p => c.update(p))
    c.getValue
  }

  /** Minimal structurally-valid PNG: signature, IHDR (8-bit RGB), one
    * IDAT-shaped chunk carrying `payload` verbatim, IEND. Chunk CRCs are
    * real CRC32s — any single-bit header corruption fails the parse. */
  def encodePng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val ihdrData = be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, color RGB, deflate, none, none
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      be32(data.length) ++ t ++ data ++ be32(crc32(t, data).toInt)
    }
    PngSig ++ chunk("IHDR", ihdrData) ++ chunk("IDAT", payload) ++
      chunk("IEND", Array.empty[Byte])
  }

  /** Parse PNG dimensions from the IHDR chunk, verifying signature, chunk
    * layout, and the IHDR CRC. */
  def parsePng(b: Array[Byte]): ImageMeta = {
    if (b.length < 33) return Invalid
    var i = 0
    while (i < 8) { if (b(i) != PngSig(i)) return Invalid; i += 1 }
    val len = readBe32(b, 8)
    if (len != 13L) return Invalid // IHDR is always 13 bytes, always first
    if (new String(b, 12, 4, "US-ASCII") != "IHDR") return Invalid
    val typeAndData = java.util.Arrays.copyOfRange(b, 12, 29)
    val storedCrc = readBe32(b, 29)
    if ((crc32(typeAndData) & 0xffffffffL) != storedCrc) return Invalid
    val w = readBe32(b, 16)
    val h = readBe32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) Invalid
    else ImageMeta("png", w.toInt, h.toInt, valid = true)
  }

  // ------------------------------------------------- PNG pixel decode ----

  final case class PixelStats(
      nPixels: Long, sumLuma1000: Long, minLuma1000: Int, maxLuma1000: Int,
      valid: Boolean)

  val InvalidPixels = PixelStats(0L, 0L, 0, 0, valid = false)

  /** REAL full PNG pixel encode: raw 8-bit RGB rows are run through a
    * genuine per-row scanline filter (types 0–4: None/Sub/Up/Average/
    * Paeth, exactly per the PNG spec) and zlib-DEFLATED with the JVM's
    * built-in `Deflater` — a structurally complete, decodable-by-anything
    * PNG, not a shell. `rowFilter(r)` picks each row's filter so tests can
    * exercise every reconstruction path. */
  def encodePngPixels(
      width: Int, height: Int, rgb: Array[Byte],
      rowFilter: Int => Int): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = rowFilter(y)
      require(ft >= 0 && ft <= 4, s"bad filter $ft")
      raw(y * (1 + stride)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = rgb(y * stride + i) & 0xff
        val left = if (i >= 3) rgb(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) rgb((y - 1) * stride + i - 3) & 0xff else 0
        val filtered = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - ((left + up) >> 1)
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + i) = (filtered & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw); d.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    encodePng(width, height, out.toByteArray)
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL full PNG pixel decode in pure JVM logic: chunk walk with CRC32
    * verification of EVERY chunk, all IDATs concatenated and INFLATED
    * (`java.util.zip.Inflater` — actual zlib, not a stub), scanlines
    * reconstructed through all five PNG filters, and integer luma stats
    * (r·299 + g·587 + b·114 per pixel — the ×1000 BT.601 weights, no
    * float anywhere) over the decoded pixels. 8-bit non-interlaced RGB
    * (the encoder's IHDR) only; anything else — and any CRC failure,
    * inflate error, or length mismatch — is valid=false, never a throw. */
  def decodePngPixels(b: Array[Byte]): PixelStats = {
    try decodePngPixelsUnsafe(b)
    catch { case _: Exception => InvalidPixels }
  }

  private def decodePngPixelsUnsafe(b: Array[Byte]): PixelStats =
    decodePngRgbUnsafe(b) match {
      case None => InvalidPixels
      case Some((width, height, px)) =>
        var sum = 0L
        var mn = Int.MaxValue
        var mx = Int.MinValue
        var j = 0
        val n = width * height
        while (j < n) {
          val luma = (px(3 * j) & 0xff) * 299 + (px(3 * j + 1) & 0xff) * 587 +
            (px(3 * j + 2) & 0xff) * 114
          sum += luma
          if (luma < mn) mn = luma
          if (luma > mx) mx = luma
          j += 1
        }
        PixelStats(n.toLong, sum, mn, mx, valid = true)
    }

  /** Average-hash (aHash) over the decoded pixel grid: one bit per pixel
    * in scan order, set when the pixel's ×1000 BT.601 luma exceeds the
    * image mean — compared as `luma·n > sum` so the threshold is exact
    * integer arithmetic (no division, no float). Returns None for any
    * image `decodePngPixels` would reject. CONTENT-derived: two PNGs with
    * different bytes (filter choices, compression levels) but identical
    * pixels hash identically — the whole point of perceptual dedup. A
    * uniform brightness shift +c is also invariant:
    * (luma+1000c)·n > sum+1000c·n ⟺ luma·n > sum. */
  def pngAHash(b: Array[Byte]): Option[String] =
    (try decodePngRgbUnsafe(b) catch { case _: Exception => None }).map {
      case (width, height, px) =>
        val n = width * height
        val lumas = new Array[Long](n)
        var sum = 0L
        var j = 0
        while (j < n) {
          val luma = (px(3 * j) & 0xff) * 299 + (px(3 * j + 1) & 0xff) * 587 +
            (px(3 * j + 2) & 0xff) * 114
          lumas(j) = luma.toLong
          sum += luma
          j += 1
        }
        val bits = new java.lang.StringBuilder(n)
        j = 0
        while (j < n) {
          bits.append(if (lumas(j) * n > sum) '1' else '0')
          j += 1
        }
        bits.toString
    }

  /** Position-weighted checksum over the decoded RGB byte stream:
    * Σ byte(j)·(j+1), with dims — an order-sensitive exact-integer
    * fingerprint of the full pixel CONTENT (a plain sum would not notice
    * two swapped pixels), cheap for an oracle to restate from planted
    * closed-form pixels. None for any image `decodePngPixels` rejects. */
  def pngWeightedChecksum(b: Array[Byte]): Option[(Int, Int, Long)] =
    (try decodePngRgbUnsafe(b) catch { case _: Exception => None }).map {
      case (w, h, px) =>
        var s = 0L
        var j = 0
        while (j < px.length) { s += (px(j) & 0xff).toLong * (j + 1); j += 1 }
        (w, h, s)
    }

  /** REAL nearest-neighbor resize of a PNG: full content decode (chunk
    * walk + CRC verify + inflate + filter reconstruction), integer
    * floor-mapped resample — source pixel (x·w div tw, y·h div th) for
    * every target pixel, the exact arithmetic an oracle can restate —
    * and a full re-encode (scanline filters + DEFLATE), so the output is
    * again a decodable-by-anything PNG. Up- and down-scaling both work
    * (floor mapping repeats source pixels on the way up). Returns None
    * for any input `decodePngPixels` would reject; never throws (F18
    * discipline). This is the real resample behind the normalize-before-
    * training pass — `Multimodal.resizeStub` remains only for the
    * synthetic-header corpus whose payloads are not real images. */
  def pngResizeNearest(b: Array[Byte], tw: Int, th: Int): Option[Array[Byte]] = {
    require(tw > 0 && th > 0, s"target dims must be positive; got ${tw}x$th")
    (try decodePngRgbUnsafe(b) catch { case _: Exception => None }).map {
      case (w, h, px) =>
        val out = new Array[Byte](tw * th * 3)
        var y = 0
        while (y < th) {
          val sy = (y.toLong * h / th).toInt
          var x = 0
          while (x < tw) {
            val sx = (x.toLong * w / tw).toInt
            val si = (sy * w + sx) * 3
            val di = (y * tw + x) * 3
            out(di) = px(si); out(di + 1) = px(si + 1); out(di + 2) = px(si + 2)
            x += 1
          }
          y += 1
        }
        encodePngPixels(tw, th, out, r => r % 5) // exercise every filter path
    }
  }

  /** Shared full decode to the raw RGB pixel array (scan order, 3 bytes
    * per pixel): chunk walk + CRC verify of EVERY chunk + IDAT inflate +
    * all-five-filter reconstruction. None on any structural defect. */
  private def decodePngRgbUnsafe(
      b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    val meta = parsePng(b)
    if (!meta.valid) return None
    // IHDR constraints: depth 8, color type 2 (RGB), no interlace
    if (b(24) != 8 || b(25) != 2 || b(28) != 0) return None
    val width = meta.width; val height = meta.height
    // chunk walk: verify every CRC, gather IDAT payloads in order
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var sawEnd = false
    while (off + 12 <= b.length && !sawEnd) {
      val len = readBe32(b, off)
      if (off + 12 + len > b.length) return None
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val typeAndData = java.util.Arrays.copyOfRange(b, off + 4, (off + 8 + len).toInt)
      if ((crc32(typeAndData) & 0xffffffffL) != readBe32(b, (off + 8 + len).toInt))
        return None
      if (typ == "IDAT") idat.write(b, off + 8, len.toInt)
      if (typ == "IEND") sawEnd = true
      off += 12 + len.toInt
    }
    if (!sawEnd) return None
    // inflate to exactly height * (1 + 3*width) scanline bytes
    val stride = width * 3
    val expected = height * (1 + stride)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](expected)
    var got = 0
    while (got < expected && !inf.finished()) {
      val n = inf.inflate(raw, got, expected - got)
      if (n == 0 && inf.needsInput()) return None // truncated stream
      got += n
    }
    val exact = got == expected && {
      // the stream must END here: a longer payload is a corrupt image
      val probe = new Array[Byte](1)
      inf.finished() || inf.inflate(probe) == 0
    }
    inf.end()
    if (!exact) return None
    // unfilter all five types
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val f = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
        val v = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case 4 => f + paeth(left, up, ul)
        }
        px(y * stride + i) = (v & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some((width, height, px))
  }

  // --------------------------------------------------------------- JPEG --

  /** Minimal structurally-valid JPEG shell: SOI, APP0/JFIF, a baseline
    * SOF0 frame header carrying the dimensions, EOI. */
  def encodeJpeg(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte, 0, 16) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte, 0, 11, 8,
      (height >>> 8).toByte, height.toByte,
      (width >>> 8).toByte, width.toByte,
      1, 1, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  /** Walk JPEG marker segments to the first SOF0/1/2 frame header and read
    * (height, width) — the same walk every EXIF/metadata tool performs.
    * Skips fill bytes and length-less markers; bails invalid on truncation
    * or a malformed segment length. */
  def parseJpeg(b: Array[Byte]): ImageMeta = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return Invalid
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return Invalid
      var marker = b(i + 1) & 0xff
      while (marker == 0xff && i + 2 < b.length) { i += 1; marker = b(i + 1) & 0xff } // fill bytes
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // length-less markers
      } else if (marker == 0xd9) {
        return Invalid // EOI before any SOF
      } else {
        if (i + 3 >= b.length) return Invalid
        val segLen = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (segLen < 2 || i + 2 + segLen > b.length) return Invalid
        if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
          if (segLen < 7) return Invalid
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return if (w > 0 && h > 0) ImageMeta("jpeg", w, h, valid = true)
          else Invalid
        }
        i += 2 + segLen
      }
    }
    Invalid
  }

  // ---------------------------------------------------------------- GIF --

  def encodeGif(width: Int, height: Int): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    "GIF89a".getBytes("US-ASCII") ++ Array[Byte](
      width.toByte, (width >>> 8).toByte,
      height.toByte, (height >>> 8).toByte,
      0, 0, 0, 0x3b) // flags, bg, aspect, trailer
  }

  def parseGif(b: Array[Byte]): ImageMeta = {
    if (b.length < 10) return Invalid
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return Invalid
    val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    if (w > 0 && h > 0) ImageMeta("gif", w, h, valid = true) else Invalid
  }

  // ------------------------------------------------- GIF pixel decode ----

  /** REAL full GIF encode: 256-entry global palette, image descriptor,
    * and the indexed pixel stream compressed with a genuine GIF-variant
    * LZW encoder (dictionary building, LSB-first bit packing, code width
    * growing 9→12 bits as entries accumulate) split into ≤255-byte
    * sub-blocks. Dictionary reset (deferred clear) is not emitted, so
    * inputs are bounded to what 12-bit codes can hold without one. */
  def encodeGifPixels(
      width: Int, height: Int, indices: Array[Byte],
      palette: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(indices.length == width * height, "one palette index per pixel")
    require(palette.length == 768, "256-entry RGB palette required")
    require(indices.length <= 3000,
      "LZW clear-code reset not emitted; bounded inputs only")
    // --- LZW encode (min code size 8, 256-color) ---
    val clear = 256; val end = 257
    var next = 258
    var widthBits = 9
    val dict = new java.util.HashMap[Long, Integer]()
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += widthBits
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    emit(clear)
    var cur = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = (cur.toLong << 12) | k
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        dict.put(key, Integer.valueOf(next)); next += 1
        // encoder bumps one entry EARLIER than the decoder: its dictionary
        // runs one ahead (it registers on emit, the decoder on read)
        if (next == (1 << widthBits) + 1 && widthBits < 12) widthBits += 1
        cur = k
      }
      i += 1
    }
    emit(cur)
    // The END code is read by the decoder AFTER it registers its entry for
    // the final data code, which equalizes the two dictionaries — so if the
    // counter sits exactly on a width boundary here, the decoder bumps
    // before reading END and the encoder must match (the one place the
    // one-entry lag between the two sides closes).
    if (next == (1 << widthBits) && widthBits < 12) widthBits += 1
    emit(end)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    val lzw = out.toByteArray
    // --- container ---
    val head = new java.io.ByteArrayOutputStream()
    head.write("GIF89a".getBytes("US-ASCII"))
    head.write(width & 0xff); head.write(width >>> 8)
    head.write(height & 0xff); head.write(height >>> 8)
    head.write(0xf7) // global table, 8-bit, 256 entries
    head.write(0); head.write(0) // bg index, aspect
    head.write(palette, 0, 768)
    head.write(0x2c) // image descriptor
    head.write(0); head.write(0); head.write(0); head.write(0) // left, top
    head.write(width & 0xff); head.write(width >>> 8)
    head.write(height & 0xff); head.write(height >>> 8)
    head.write(0) // no local table, no interlace
    head.write(8) // LZW min code size
    var p = 0
    while (p < lzw.length) {
      val n = math.min(255, lzw.length - p)
      head.write(n); head.write(lzw, p, n); p += n
    }
    head.write(0) // block terminator
    head.write(0x3b) // trailer
    head.toByteArray
  }

  /** REAL full GIF pixel decode in pure JVM logic: header + logical screen
    * descriptor, global palette, extension-block skipping, and a general
    * GIF-LZW decoder (clear/end codes, the `code == next` self-reference
    * case, LSB-first unpacking, 9→12-bit width growth), with the decoded
    * index count required to equal w·h exactly. Luma stats run the indices
    * through the palette. Any structural inconsistency or invalid code is
    * valid=false, never a throw. */
  def decodeGifPixels(b: Array[Byte]): PixelStats = {
    try decodeGifPixelsUnsafe(b)
    catch { case _: Exception => InvalidPixels }
  }

  private def decodeGifPixelsUnsafe(b: Array[Byte]): PixelStats = {
    if (b.length < 13) return InvalidPixels
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return InvalidPixels
    val width = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
    val height = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
    val packed = b(10) & 0xff
    if ((packed & 0x80) == 0) return InvalidPixels // need a global table
    val tableSize = 2 << (packed & 0x07)
    var off = 13
    if (off + 3 * tableSize > b.length) return InvalidPixels
    val palOff = off
    off += 3 * tableSize
    // skip extension blocks, find the image descriptor
    while (off < b.length && (b(off) & 0xff) == 0x21) {
      off += 2 // introducer + label
      while (off < b.length && (b(off) & 0xff) != 0) off += 1 + (b(off) & 0xff)
      off += 1
    }
    if (off + 10 > b.length || (b(off) & 0xff) != 0x2c) return InvalidPixels
    val iw = (b(off + 5) & 0xff) | ((b(off + 6) & 0xff) << 8)
    val ih = (b(off + 7) & 0xff) | ((b(off + 8) & 0xff) << 8)
    if (iw != width || ih != height) return InvalidPixels
    if ((b(off + 9) & 0x80) != 0) return InvalidPixels // no local tables
    off += 10
    if (off >= b.length) return InvalidPixels
    val minCode = b(off) & 0xff
    if (minCode < 2 || minCode > 8) return InvalidPixels
    off += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (off < b.length && (b(off) & 0xff) != 0) {
      val n = b(off) & 0xff
      if (off + 1 + n > b.length) return InvalidPixels
      data.write(b, off + 1, n); off += 1 + n
    }
    if (off >= b.length) return InvalidPixels // missing terminator
    val lzw = data.toByteArray
    // --- general GIF-LZW decode ---
    val clear = 1 << minCode
    val end = clear + 1
    val nPixels = width * height
    val out = new Array[Byte](nPixels)
    var outLen = 0
    // dictionary as (prefix code, appended byte); roots are implicit
    val prefix = new Array[Int](4096)
    val append = new Array[Byte](4096)
    var next = end + 1
    var widthBits = minCode + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    def emitStr(code: Int): Int = { // writes the string, returns first byte
      var stack = List.empty[Byte]
      var c = code
      while (c >= clear + 2) { stack = append(c) :: stack; c = prefix(c) }
      val first = c.toByte
      stack = first :: stack
      stack.foreach { v =>
        if (outLen >= nPixels) throw new IllegalStateException("overflow")
        out(outLen) = v; outLen += 1
      }
      first & 0xff
    }
    var done = false
    while (!done) {
      while (bitCnt < widthBits && pos < lzw.length) {
        bitBuf |= (lzw(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      if (bitCnt < widthBits) return InvalidPixels // ran out of codes
      val code = (bitBuf & ((1L << widthBits) - 1)).toInt
      bitBuf >>>= widthBits; bitCnt -= widthBits
      if (code == clear) {
        next = end + 1; widthBits = minCode + 1; prev = -1
      } else if (code == end) {
        done = true
      } else if (prev == -1) {
        if (code >= clear) return InvalidPixels
        emitStr(code); prev = code
      } else {
        if (code > next) return InvalidPixels
        val first =
          if (code == next) { // the KwKwK self-reference case
            val f = emitStr(prev)
            if (outLen >= nPixels) return InvalidPixels
            out(outLen) = f.toByte; outLen += 1
            f
          } else emitStr(code)
        if (next < 4096) {
          prefix(next) = prev; append(next) = first.toByte; next += 1
          if (next == (1 << widthBits) && widthBits < 12) widthBits += 1
        }
        prev = code
      }
    }
    if (outLen != nPixels) return InvalidPixels
    // luma through the palette
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var j = 0
    while (j < nPixels) {
      val idx = out(j) & 0xff
      if (idx >= tableSize) return InvalidPixels
      val p0 = palOff + 3 * idx
      val luma = (b(p0) & 0xff) * 299 + (b(p0 + 1) & 0xff) * 587 +
        (b(p0 + 2) & 0xff) * 114
      sum += luma
      if (luma < mn) mn = luma
      if (luma > mx) mx = luma
      j += 1
    }
    PixelStats(nPixels.toLong, sum, mn, mx, valid = true)
  }

  // ------------------------------------------------ JPEG pixel codec ----
  //
  // REAL baseline sequential JPEG (ITU-T T.81): the encoder runs a genuine
  // forward DCT + quantization + zigzag + differential-DC / run-length-AC
  // Huffman entropy coding with byte stuffing; the decoder is GENERAL — it
  // builds its Huffman tables from the stream's own DHT segments, reads
  // quant tables from DQT, walks SOF0/SOS, entropy-decodes every MCU
  // (including restart-interval resets), dequantizes, runs the IDCT, and
  // converts YCbCr→RGB. Pure JVM double/int math, no codec library —
  // the same discipline as the PNG (zlib+filters) and GIF (LZW) decoders.
  //
  // The direct O(64²)-per-block DCT keeps the code auditable; a production
  // path would swap in the AAN factorization (same interface, ~10×).
  // StrictMath keeps the cosine table bit-identical across JVMs.

  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** Quant tables in NATURAL order. DC step 8 makes constant 8×8 blocks
    * round-trip bit-exactly (F00 = 8·(v−128); round(F00/8) = v−128), the
    * property the oracle gate builds on; AC step 16 is a mild real
    * quantizer. */
  private val QuantLuma: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 16)
  private val QuantChroma: Array[Int] = QuantLuma

  // Huffman table SPECS (bits-per-length + symbol order, the DHT wire
  // form). Self-consistent canonical codes: 12 DC size categories at 4
  // bits, all 162 AC (run,size) symbols at 8 bits — legal JPEG (tables
  // always travel in DHT; the decoder never assumes these).
  private val DcBits: Array[Int] = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray
  private val AcBits: Array[Int] = Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals: Array[Int] =
    (0x00 +: 0xF0 +: (for (run <- 0 to 15; size <- 1 to 10) yield (run << 4) | size)).toArray

  /** Canonical Huffman code assignment: symbol → (code, length). */
  private def canonCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> ((code, len)); code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private val cosT: Array[Double] =
    Array.tabulate(8 * 8)(i => StrictMath.cos((2 * (i % 8) + 1) * (i / 8) * StrictMath.PI / 16))
  private val c0 = 1.0 / StrictMath.sqrt(2.0)
  @inline private def cf(u: Int): Double = if (u == 0) c0 else 1.0

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var buf = 0
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        buf = (buf << 1) | ((code >>> i) & 1); n += 1
        if (n == 8) {
          out.write(buf)
          if (buf == 0xff) out.write(0x00) // byte stuffing
          buf = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n); () } // pad with 1s
  }

  /** Encode one block: returns new DC predictor. `coefQ` is scratch. */
  private def encodeBlock(
      bw: BitWriter, samples: Array[Int], prevDc: Int,
      quant: Array[Int], dcC: Map[Int, (Int, Int)], acC: Map[Int, (Int, Int)]): Int = {
    // forward DCT (level-shifted input), quantize, zigzag
    val zz = new Array[Int](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            s += (samples(y * 8 + x) - 128) * cosT(u * 8 + x) * cosT(v * 8 + y)
            y += 1
          }
          x += 1
        }
        val f = 0.25 * cf(u) * cf(v) * s
        val nat = v * 8 + u
        val q = Math.round(f / quant(nat)).toInt
        var zi = 0
        while (Zigzag(zi) != nat) zi += 1
        zz(zi) = q
        v += 1
      }
      u += 1
    }
    def sizeOf(x: Int): Int = { var a = math.abs(x); var s = 0; while (a != 0) { a >>= 1; s += 1 }; s }
    def bitsOf(x: Int, s: Int): Int = if (x >= 0) x else x + (1 << s) - 1
    // DC: differential
    val diff = zz(0) - prevDc
    val ds = sizeOf(diff)
    val (dc, dl) = dcC(ds)
    bw.put(dc, dl)
    if (ds > 0) bw.put(bitsOf(diff, ds), ds)
    // AC: run-length
    var run = 0
    var zi = 1
    while (zi < 64) {
      if (zz(zi) == 0) run += 1
      else {
        while (run >= 16) { val (c, l) = acC(0xF0); bw.put(c, l); run -= 16 }
        val s = sizeOf(zz(zi))
        val (c, l) = acC((run << 4) | s)
        bw.put(c, l); bw.put(bitsOf(zz(zi), s), s)
        run = 0
      }
      zi += 1
    }
    if (run > 0) { val (c, l) = acC(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  /** REAL full baseline JPEG encode: 1 plane (grayscale) or 3 planes
    * (YCbCr 4:4:4, each w·h samples). Partial edge blocks are
    * edge-replicated. `restartInterval` > 0 emits DRI + RSTn markers
    * every that many MCUs (predictor reset + byte alignment) so the
    * decoder's restart path is exercisable. */
  def encodeJpegPixels(
      width: Int, height: Int, planes: Array[Array[Byte]],
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xffff && height <= 0xffff,
      s"bad dims ${width}x$height")
    require(planes.length == 1 || planes.length == 3, "1 (gray) or 3 (YCbCr) planes")
    planes.foreach(p => require(p.length == width * height, "plane must be w*h samples"))
    val nc = planes.length
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m); val len = body.length + 2
      out.write(len >>> 8); out.write(len & 0xff); body.foreach(out.write)
    }
    marker(0xd8) // SOI
    // DQT: table 0 (luma) and, for color, table 1 (chroma) — zigzag order
    seg(0xdb, 0 +: Zigzag.map(QuantLuma))
    if (nc == 3) seg(0xdb, 1 +: Zigzag.map(QuantChroma))
    // SOF0: 8-bit, h, w, components all 1x1 sampling (4:4:4)
    val comps = (0 until nc).flatMap(c =>
      Seq(c + 1, 0x11, if (c == 0) 0 else 1)).toArray
    seg(0xc0, Array(8, height >>> 8, height & 0xff, width >>> 8, width & 0xff, nc) ++ comps)
    // DHT: DC/AC tables 0; color also uses them (Td=Ta=0 for every comp)
    seg(0xc4, (0x00 +: DcBits) ++ DcVals)
    seg(0xc4, (0x10 +: AcBits) ++ AcVals)
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >>> 8, restartInterval & 0xff))
    // SOS
    seg(0xda, Array(nc) ++ (0 until nc).flatMap(c => Seq(c + 1, 0x00)) ++ Array(0, 63, 0))
    // entropy-coded data: interleaved MCUs (one block/comp at 4:4:4)
    val dcCodes = canonCodes(DcBits, DcVals)
    val acCodes = canonCodes(AcBits, AcVals)
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    var bw = new BitWriter(out)
    val prevDc = new Array[Int](nc)
    val block = new Array[Int](64)
    var mcu = 0
    var rst = 0
    var myi = 0
    while (myi < by) {
      var mxi = 0
      while (mxi < bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rst); rst = (rst + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
          bw = new BitWriter(out)
        }
        var c = 0
        while (c < nc) {
          val p = planes(c)
          var y = 0
          while (y < 8) {
            val sy = math.min(myi * 8 + y, height - 1) // edge replicate
            var x = 0
            while (x < 8) {
              val sx = math.min(mxi * 8 + x, width - 1)
              block(y * 8 + x) = p(sy * width + sx) & 0xff
              x += 1
            }
            y += 1
          }
          prevDc(c) = encodeBlock(bw, block, prevDc(c),
            if (c == 0) QuantLuma else QuantChroma, dcCodes, acCodes)
          c += 1
        }
        mcu += 1
        mxi += 1
      }
      myi += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman DECODE tables (the T.81 mincode/maxcode/valptr
    * walk). */
  private final class HuffDecoder(bits: Array[Int], vals: Array[Int]) {
    private val minC = new Array[Int](17)
    private val maxC = Array.fill(17)(-1)
    private val valP = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valP(len) = k; minC(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxC(len) = code - 1
        }
        code <<= 1
      }
    }
    /** Reads one symbol; -1 on invalid code. */
    def next(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit()
        len += 1
        if (maxC(len) >= 0 && code <= maxC(len) && code >= minC(len))
          return vals(valP(len) + code - minC(len))
      }
      -1
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var n = 0
    var bad = false
    /** Next bit MSB-first, unstuffing 0xFF00; a real marker mid-scan sets
      * `bad` (baseline data may not contain one except RSTn, handled by
      * [[align]]). */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) { bad = true; return 0 }
        var v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else -1
          if (m == 0x00) pos += 1
          else { bad = true; v = 0 } // marker reached
        }
        buf = v; n = 8
      }
      n -= 1
      (buf >>> n) & 1
    }
    /** Byte-align and consume an expected RSTn marker; false if absent. */
    def restart(expected: Int): Boolean = {
      n = 0
      if (pos + 1 >= b.length || (b(pos) & 0xff) != 0xff ||
        (b(pos + 1) & 0xff) != 0xd0 + expected) false
      else { pos += 2; true }
    }
    def receive(size: Int): Int = {
      var v = 0
      var i = 0
      while (i < size) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  @inline private def extend(v: Int, size: Int): Int =
    if (size == 0) 0 else if (v < (1 << (size - 1))) v - (1 << size) + 1 else v

  /** REAL full baseline JPEG decode in pure JVM logic: DQT/DHT/SOF0/SOS
    * marker walk (tables built FROM THE STREAM, nothing assumed), MCU
    * entropy decode with byte unstuffing and restart-interval resets,
    * dequantization, IDCT, YCbCr→RGB (ITU BT.601 JFIF full-range), and
    * the same ×1000 integer luma stats as the PNG/GIF decoders. Baseline
    * sequential, 8-bit, 4:4:4 or grayscale; progressive/subsampled/
    * arithmetic streams — and any malformed structure — return
    * valid=false, never a throw. */
  def decodeJpegPixels(b: Array[Byte]): PixelStats = {
    decodeJpegToRgb(b) match {
      case None => InvalidPixels
      case Some((w, h, rgb)) =>
        var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
        var j = 0
        val n = w * h
        while (j < n) {
          val luma = (rgb(3 * j) & 0xff) * 299 + (rgb(3 * j + 1) & 0xff) * 587 +
            (rgb(3 * j + 2) & 0xff) * 114
          sum += luma
          if (luma < mn) mn = luma
          if (luma > mx) mx = luma
          j += 1
        }
        PixelStats(n.toLong, sum, mn, mx, valid = true)
    }
  }

  /** Full decode to an RGB byte array (3 bytes/pixel; grayscale
    * replicated) — exposed for round-trip tolerance tests. */
  private[graft] def decodeJpegToRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try decodeJpegToRgbUnsafe(b)
    catch { case _: Exception => None }
  }

  private def decodeJpegToRgbUnsafe(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    val quant = new Array[Array[Int]](4)
    val dcTab = new Array[HuffDecoder](4)
    val acTab = new Array[HuffDecoder](4)
    var width = 0; var height = 0
    var nc = 0
    val compQ = new Array[Int](4) // quant table per component
    val compDc = new Array[Int](4)
    val compAc = new Array[Int](4)
    var restartInterval = 0
    var i = 2
    var scanAt = -1
    while (scanAt < 0) {
      if (i + 3 >= b.length) return None
      if ((b(i) & 0xff) != 0xff) return None
      var m = b(i + 1) & 0xff
      while (m == 0xff && i + 2 < b.length) { i += 1; m = b(i + 1) & 0xff }
      if (m == 0xd9) return None // EOI before SOS
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return None
      val body = i + 4
      val bodyLen = len - 2
      m match {
        case 0xdb => // DQT: one or more (Pq/Tq, 64 zigzag bytes) entries
          var o = body
          while (o < body + bodyLen) {
            val pq = (b(o) >> 4) & 0x0f
            val tq = b(o) & 0x0f
            if (pq != 0 || tq > 3 || o + 65 > body + bodyLen) return None
            val t = new Array[Int](64)
            var z = 0
            while (z < 64) { t(Zigzag(z)) = b(o + 1 + z) & 0xff; z += 1 }
            quant(tq) = t
            o += 65
          }
        case 0xc4 => // DHT: one or more (Tc/Th, 16 counts, vals) entries
          var o = body
          while (o < body + bodyLen) {
            val tc = (b(o) >> 4) & 0x0f
            val th = b(o) & 0x0f
            if (tc > 1 || th > 3 || o + 17 > body + bodyLen) return None
            val bits = Array.tabulate(16)(j => b(o + 1 + j) & 0xff)
            val total = bits.sum
            if (o + 17 + total > body + bodyLen) return None
            val vals = Array.tabulate(total)(j => b(o + 17 + j) & 0xff)
            val d = new HuffDecoder(bits, vals)
            if (tc == 0) dcTab(th) = d else acTab(th) = d
            o += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if (bodyLen < 6 || (b(body) & 0xff) != 8) return None
          height = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
          width = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
          nc = b(body + 5) & 0xff
          if (width == 0 || height == 0 || (nc != 1 && nc != 3)) return None
          if (bodyLen < 6 + 3 * nc) return None
          var c = 0
          while (c < nc) {
            val o = body + 6 + 3 * c
            if ((b(o + 1) & 0xff) != 0x11) return None // 4:4:4 only
            compQ(c) = b(o + 2) & 0x0f
            c += 1
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // progressive / extended / arithmetic: not baseline
        case 0xdd =>
          if (bodyLen < 2) return None
          restartInterval = ((b(body) & 0xff) << 8) | (b(body + 1) & 0xff)
        case 0xda => // SOS
          if (nc == 0) return None
          val ns = b(body) & 0xff
          if (ns != nc || bodyLen < 1 + 2 * ns + 3) return None
          var c = 0
          while (c < ns) {
            compDc(c) = (b(body + 1 + 2 * c + 1) >> 4) & 0x0f
            compAc(c) = b(body + 1 + 2 * c + 1) & 0x0f
            c += 1
          }
          scanAt = i + 2 + len
        case _ => () // APPn/COM/etc: skip
      }
      i += 2 + len
    }
    var c = 0
    while (c < nc) {
      if (quant(compQ(c)) == null || dcTab(compDc(c)) == null ||
        acTab(compAc(c)) == null) return None
      c += 1
    }
    // entropy decode all MCUs (4:4:4 ⇒ one block per component per MCU)
    val bx = (width + 7) / 8
    val by = (height + 7) / 8
    val planes = Array.fill(nc)(new Array[Byte](bx * by * 64))
    val br = new BitReader(b, scanAt)
    val prevDc = new Array[Int](nc)
    val zz = new Array[Int](64)
    val blk = new Array[Double](64)
    var mcu = 0
    var rst = 0
    var myi = 0
    while (myi < by) {
      var mxi = 0
      while (mxi < bx) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!br.restart(rst)) return None
          rst = (rst + 1) % 8
          java.util.Arrays.fill(prevDc, 0)
        }
        var c = 0
        while (c < nc) {
          java.util.Arrays.fill(zz, 0)
          val ds = dcTab(compDc(c)).next(br)
          if (ds < 0 || ds > 11 || br.bad) return None
          prevDc(c) += extend(br.receive(ds), ds)
          zz(0) = prevDc(c)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acTab(compAc(c)).next(br)
            if (rs < 0 || br.bad) return None
            val run = rs >>> 4
            val size = rs & 0x0f
            if (size == 0) {
              if (run == 15) k += 16 // ZRL
              else eob = true // EOB
            } else {
              k += run
              if (k > 63) return None
              zz(k) = extend(br.receive(size), size)
              k += 1
            }
          }
          if (br.bad) return None
          // dequantize (zigzag → natural) + IDCT + level shift
          val q = quant(compQ(c))
          var z = 0
          while (z < 64) { blk(Zigzag(z)) = zz(z).toDouble * q(Zigzag(z)); z += 1 }
          val plane = planes(c)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              var s = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  s += cf(u) * cf(v) * blk(v * 8 + u) * cosT(u * 8 + x) * cosT(v * 8 + y)
                  v += 1
                }
                u += 1
              }
              val px = Math.round(0.25 * s).toInt + 128
              plane((myi * 8 + y) * (bx * 8) + mxi * 8 + x) =
                math.max(0, math.min(255, px)).toByte
              x += 1
            }
            y += 1
          }
          c += 1
        }
        mcu += 1
        mxi += 1
      }
      myi += 1
    }
    // crop to (width, height) and convert to RGB
    val rgb = new Array[Byte](width * height * 3)
    val stride = bx * 8
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val o = 3 * (y * width + x)
        if (nc == 1) {
          val g = planes(0)(y * stride + x)
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
        } else {
          val yy = planes(0)(y * stride + x) & 0xff
          val cb = (planes(1)(y * stride + x) & 0xff) - 128
          val cr = (planes(2)(y * stride + x) & 0xff) - 128
          def cl(d: Double): Byte =
            math.max(0, math.min(255, Math.round(d).toInt)).toByte
          rgb(o) = cl(yy + 1.402 * cr)
          rgb(o + 1) = cl(yy - 0.344136 * cb - 0.714136 * cr)
          rgb(o + 2) = cl(yy + 1.772 * cb)
        }
        x += 1
      }
      y += 1
    }
    Some((width, height, rgb))
  }

  // -------------------------------------------------------------- sniff --

  /** Format sniffing + parse: dispatch on magic bytes, like `file(1)`. */
  def parse(b: Array[Byte]): ImageMeta = {
    if (b == null || b.length < 4) Invalid
    else if ((b(0) & 0xff) == 0x89 && b(1) == 'P') parsePng(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) parseJpeg(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') parseGif(b)
    else Invalid
  }
}
