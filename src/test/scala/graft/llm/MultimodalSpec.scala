package graft.llm

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The multimodal plumbing is real even though decode is stubbed: schema,
  * partition-parallel batches, deterministic outputs, 1→N frame fan-out. */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkSuite {

  private lazy val assets = Multimodal.syntheticAssets(spark, 90).cache()

  test("decodeAll: typed metadata for every asset, deterministic across runs") {
    val a = Multimodal.decodeAll(spark, assets).collect().sortBy(_.assetId)
    val b = Multimodal.decodeAll(spark, assets).collect().sortBy(_.assetId)
    a.length shouldBe 90
    a.map(_.width) shouldBe b.map(_.width)
    a.foreach { m =>
      m.valid shouldBe true
      if (m.modality == "image") m.durationMs shouldBe 0L else m.durationMs should be > 0L
    }
  }

  test("extractFeatures: fixed-dim vectors, bounded values") {
    val f = Multimodal.extractFeatures(spark, assets).collect()
    f.length shouldBe 90
    all(f.map(_.features.length)) shouldBe Multimodal.FeatureDim
    f.foreach(_.features.foreach(v => math.abs(v) should be <= 1.0f))
  }

  test("sampleFrames: every 2nd 32-byte chunk of video assets only") {
    val frames = Multimodal.sampleFrames(spark, assets, frameBytes = 32, every = 2)
    val videoCount = assets.filter(_.modality == "video").count()
    frames.select("asset_id").distinct().count() shouldBe videoCount
    frames.groupBy("asset_id").count().collect()
      .foreach(r => r.getLong(1) should be >= 1L)
  }

  test("resizeAll: target-dim payloads, decodable headers, audio untouched") {
    val resized = Multimodal.resizeAll(spark, assets, targetW = 256, targetH = 128)
    val metas = Multimodal.decodeAll(spark, resized).collect()
    metas.filter(m => m.modality == "image" || m.modality == "video").foreach { m =>
      m.width shouldBe 256
      m.height shouldBe 128
      m.sizeBytes shouldBe 256 * 128 / 256 // scales with TARGET dims
    }
    // Audio passes through byte-identical.
    val origAudio = assets.filter(_.modality == "audio").collect()
      .map(a => a.assetId -> a.content.toSeq).toMap
    resized.filter(_.modality == "audio").collect().foreach { a =>
      a.content.toSeq shouldBe origAudio(a.assetId)
    }
    // Deterministic: same inputs, same bytes.
    val again = Multimodal.resizeAll(spark, assets, 256, 128).collect()
      .sortBy(_.assetId).map(_.content.toSeq)
    resized.collect().sortBy(_.assetId).map(_.content.toSeq) shouldBe again
  }
}
