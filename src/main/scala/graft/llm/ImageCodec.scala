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
  * PNG pixel decode is ALSO real now — the JVM ships actual zlib
  * (`java.util.zip.Inflater`), so `decodePngPixels` does the complete
  * reconstruction: per-chunk CRC32 verification, IDAT concatenation +
  * inflate, all five scanline filters (None/Sub/Up/Average/Paeth), and
  * integer BT.601 luma stats over the decoded pixels. Only JPEG entropy
  * decode / GIF LZW remain env-bounded (they need no stub either — the
  * pipeline routes on metadata for those formats).
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

  private def decodePngPixelsUnsafe(b: Array[Byte]): PixelStats = {
    val meta = parsePng(b)
    if (!meta.valid) return InvalidPixels
    // IHDR constraints: depth 8, color type 2 (RGB), no interlace
    if (b(24) != 8 || b(25) != 2 || b(28) != 0) return InvalidPixels
    val width = meta.width; val height = meta.height
    // chunk walk: verify every CRC, gather IDAT payloads in order
    val idat = new java.io.ByteArrayOutputStream()
    var off = 8
    var sawEnd = false
    while (off + 12 <= b.length && !sawEnd) {
      val len = readBe32(b, off)
      if (off + 12 + len > b.length) return InvalidPixels
      val typ = new String(b, off + 4, 4, "US-ASCII")
      val typeAndData = java.util.Arrays.copyOfRange(b, off + 4, (off + 8 + len).toInt)
      if ((crc32(typeAndData) & 0xffffffffL) != readBe32(b, (off + 8 + len).toInt))
        return InvalidPixels
      if (typ == "IDAT") idat.write(b, off + 8, len.toInt)
      if (typ == "IEND") sawEnd = true
      off += 12 + len.toInt
    }
    if (!sawEnd) return InvalidPixels
    // inflate to exactly height * (1 + 3*width) scanline bytes
    val stride = width * 3
    val expected = height * (1 + stride)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](expected)
    var got = 0
    while (got < expected && !inf.finished()) {
      val n = inf.inflate(raw, got, expected - got)
      if (n == 0 && inf.needsInput()) return InvalidPixels // truncated stream
      got += n
    }
    val exact = got == expected && {
      // the stream must END here: a longer payload is a corrupt image
      val probe = new Array[Byte](1)
      inf.finished() || inf.inflate(probe) == 0
    }
    inf.end()
    if (!exact) return InvalidPixels
    // unfilter all five types, then integer luma stats
    val px = new Array[Byte](height * stride)
    var y = 0
    while (y < height) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return InvalidPixels
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
