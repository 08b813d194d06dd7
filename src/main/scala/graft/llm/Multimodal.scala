package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed per-partition in bounded batches.
  *
  * The Spark-side mechanics here — schema, partition-parallel batch
  * processing, typed output rows — are real and tested. The metadata
  * half of decode is ALSO real now for all three modalities:
  * `graft.llm.ImageCodec` parses genuine PNG/JPEG/GIF container headers
  * (signature sniffing, IHDR + CRC32 verification, JPEG marker walk),
  * `AudioCodec` walks RIFF/WAVE chunks and unpacks FLAC STREAMINFO bit
  * fields, and `VideoCodec` walks ISO BMFF/MP4 boxes (mvhd, tkhd 16.16
  * dims) and AVI `avih` headers — see `decodeImage` / `decodeAudio` /
  * `decodeVideo` and the `llm_image_meta` / `llm_audio_meta` /
  * `llm_video_meta` gates. CONTENT decode is real where the JVM suffices:
  * full PNG pixel reconstruction (CRC walk + zlib inflate + all five
  * scanline filters — `ImageCodec.decodePngPixels`, `llm_png_pixels`),
  * full GIF decode (general LZW + palette —
  * `ImageCodec.decodeGifPixels`, `llm_gif_pixels`), and 16-bit PCM sample
  * decode with energy/zero-crossing features (`AudioCodec.pcmStats`,
  * `llm_pcm_features`). Only payloads needing a native codec
  * (JPEG entropy decode, video codecs) remain stubbed
  * with a deterministic fake
  * (this container has no image/audio libraries). Swapping `decodeStub`
  * for a JNI/FFI decoder (or porting the shape to `mapInPandas` with
  * PIL/ffmpeg on a PySpark cluster) changes ONE function; the
  * distribution story stays identical: mapPartitions → one task per
  * partition, media bytes never shuffled until reduced to fixed-size
  * features.
  */
object Multimodal {

  /** An ingested media asset (content stays opaque bytes end to end). */
  final case class Asset(
      assetId: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      format: String)

  /** Typed metadata "decoded" from the bytes. */
  final case class AssetMeta(
      assetId: Long,
      modality: String,
      sizeBytes: Int,
      width: Int,      // image/video
      height: Int,
      durationMs: Long, // audio/video
      valid: Boolean)

  /** Fixed-dim feature row (what a real encoder would emit). */
  final case class AssetFeatures(
      assetId: Long,
      modality: String,
      features: Array[Float])

  val FeatureDim = 16

  /** STUB decode: deterministic pseudo-metadata from the byte content.
    * ??? in spirit — replace with a real decoder; the plumbing around it is
    * the deliverable. Residual scope is INTER-FRAME VIDEO CODECS ONLY
    * (H.264/VP9/AV1 motion compensation): image decode is real for
    * PNG+GIF+JPEG (ImageCodec.decode{Png,Gif,Jpeg}Pixels), audio PCM is
    * real (AudioCodec.pcmStats), container walks (MP4 boxes, AVI headers)
    * are real, and MJPEG video CONTENT decode incl. frame sampling is real
    * (VideoCodec.decodeAviMjpegFrames — each frame a full baseline JPEG
    * decode). */
  private[llm] def decodeStub(a: Asset): AssetMeta = {
    val n = a.content.length
    if (n < 4) AssetMeta(a.assetId, a.modality, n, 0, 0, 0L, valid = false)
    else {
      // Fake header parse: first bytes drive dimensions, deterministically.
      val w = 16 * (1 + (a.content(0) & 0x3f))
      val h = 16 * (1 + (a.content(1) & 0x3f))
      val dur = a.modality match {
        case "audio" | "video" => 1000L * (1 + (a.content(2) & 0x7f))
        case _                 => 0L
      }
      AssetMeta(a.assetId, a.modality, n, w, h, dur, valid = true)
    }
  }

  /** STUB feature extraction: 16 floats derived from a rolling byte hash —
    * stands in for a CLIP/mel-spectrogram embedding, deterministic. */
  private[llm] def featuresStub(a: Asset): AssetFeatures = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < a.content.length) {
      h = 31 * h + (a.content(i) & 0xff)
      out(i % FeatureDim) += ((h % 1000L) / 1000.0f)
      i += 1
    }
    AssetFeatures(a.assetId, a.modality, out.map(v => v % 1.0f))
  }

  /** Decode metadata for every asset — partition-parallel, batch-shaped.
    * (Synthetic-corpus path: uses the stub header convention.) */
  def decodeAll(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.mapPartitions(_.map(decodeStub))
  }

  /** REAL image-metadata decode: parse actual PNG/JPEG/GIF container
    * headers from the binary column (`ImageCodec` — CRC-verified IHDR,
    * JPEG SOF marker walk, magic sniffing). Corrupt or non-image bytes
    * yield valid=false rows, never a task failure (F18 discipline). */
  def decodeImage(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val m = ImageCodec.parse(a.content)
      AssetMeta(a.assetId, a.modality, a.content.length,
        m.width, m.height, durationMs = 0L, valid = m.valid)
    })
  }

  /** REAL audio-metadata decode: RIFF/WAVE chunk walk + FLAC STREAMINFO
    * bit-field unpack (`AudioCodec`). Corrupt or non-audio bytes yield
    * valid=false rows, never a task failure (F18 discipline). */
  def decodeAudio(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val m = AudioCodec.parse(a.content)
      AssetMeta(a.assetId, a.modality, a.content.length,
        width = 0, height = 0, m.durationMs, valid = m.valid)
    })
  }

  /** REAL video-metadata decode: ISO BMFF/MP4 box walk (mvhd timescale +
    * duration, tkhd 16.16 fixed-point dims) and AVI RIFF `avih` header
    * (`VideoCodec`). Corrupt or non-video bytes yield valid=false rows,
    * never a task failure (F18 discipline). */
  def decodeVideo(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetMeta] = {
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      val m = VideoCodec.parse(a.content)
      AssetMeta(a.assetId, a.modality, a.content.length,
        m.width, m.height, m.durationMs, valid = m.valid)
    })
  }

  /** Feature-extract every valid asset. */
  def extractFeatures(spark: SparkSession, assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.mapPartitions(_.filter(a => decodeStub(a).valid).map(featuresStub))
  }

  /** STUB resample for the synthetic-header corpus ONLY — real image
    * content goes through [[ImageCodec.pngResizeNearest]] (full decode →
    * exact floor-mapped nearest-neighbor resample → full re-encode; the
    * `llm_image_resize` gate oracles the whole round trip). This stub
    * emits a w×h-proportional payload by striding the source bytes for
    * assets whose payloads are not real images. The contract both keep:
    * output size scales with the TARGET dims (not the source), invalid
    * assets pass through unchanged with valid=false. */
  private[llm] def resizeStub(a: Asset, targetW: Int, targetH: Int): Asset = {
    val n = a.content.length
    if (n < 4) a
    else {
      // One "pixel byte" per 256 target pixels keeps the fake payload
      // proportional to the target dims, like a real resample.
      val outLen = math.max(4, targetW * targetH / 256)
      val out = Array.tabulate(outLen)(i => a.content((i.toLong * n / outLen).toInt))
      out(0) = ((targetW / 16 - 1) & 0x3f).toByte // keep the fake header
      out(1) = ((targetH / 16 - 1) & 0x3f).toByte // parseable by decodeStub
      a.copy(content = out)
    }
  }

  /** Resize every image/video asset to the target dims — the normalize-
    * before-training pass. Same plumbing contract as decode: partition-
    * parallel, bytes never shuffled, 1→1 rows. */
  def resizeAll(
      spark: SparkSession, assets: Dataset[Asset],
      targetW: Int, targetH: Int): Dataset[Asset] = {
    // The stub's fake 6-bit header can only express multiples of 16 up to
    // 1024 — out-of-range targets would silently decode to WRONG dimensions
    // downstream, so fail loudly at the driver instead (a real decoder
    // replacing the stub lifts this).
    def valid(d: Int) = d >= 16 && d <= 1024 && d % 16 == 0
    require(valid(targetW) && valid(targetH),
      s"resizeAll stub supports multiples of 16 in [16, 1024]; got ${targetW}x$targetH")
    import spark.implicits._
    assets.mapPartitions(_.map { a =>
      if (a.modality == "image" || a.modality == "video")
        resizeStub(a, targetW, targetH)
      else a
    })
  }

  /** Frame sampling: split a video payload into `every`-th fixed-size chunk
    * ("frames") — shows the 1→N batch shape without shuffling raw bytes. */
  def sampleFrames(
      spark: SparkSession, assets: Dataset[Asset],
      frameBytes: Int, every: Int): DataFrame = {
    import spark.implicits._
    assets.filter(_.modality == "video")
      .mapPartitions(_.flatMap { a =>
        a.content.grouped(frameBytes).zipWithIndex
          .filter { case (_, i) => i % every == 0 }
          .map { case (chunk, i) => (a.assetId, i, chunk) }
      })
      .toDF("asset_id", "frame_idx", "frame")
  }

  /** Deterministic synthetic asset corpus (for tests/bench — stands in for
    * a real binary-column source). */
  def syntheticAssets(spark: SparkSession, n: Int): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val modality = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (i % 192).toInt
      val bytes = Array.tabulate(len)(j => ((i * 131 + j * 17) % 251).toByte)
      Asset(i, modality, bytes, if (modality == "image") "png" else "bin")
    }
  }
}
