package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.mutation.MergeOps

/** The sum-monoid count-delta log behind s21/s22: per-batch O(batch)
  * writes, threshold-gated ATOMIC-SWAP compaction, and — the part the
  * min-monoid bucket log never needed — crash states driven explicitly.
  * A sum log that half-deletes (or half-keeps) its deltas around a
  * compacted base double-counts; the whole-directory swap makes every
  * crash window either the intact old store, the intact new store, or
  * the backup that recovery restores. */
class SumDeltaLogSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_sumlog").toString

  private def batchDf(rows: Seq[(String, Long, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v", "c")
  }

  private def asMap(df: DataFrame): Map[(String, Long), Long] =
    df.collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap

  private val keys = Seq("k", "v")

  test("collapsed view equals the eager merge, across appends and compactions") {
    val root = tmpRoot()
    val expected = scala.collection.mutable.Map.empty[(String, Long), Long]
    (0 until 10).foreach { id =>
      val rows = (0 until 6).map { j =>
        val k = s"k${(id + j) % 3}"; val v = (j % 4).toLong
        ((k, v), 1L + id % 2)
      }
      rows.foreach { case (kv, c) =>
        expected(kv) = expected.getOrElse(kv, 0L) + c
      }
      SumDeltaLog.append(
        batchDf(rows.map { case ((k, v), c) => (k, v, c) })
          .groupBy("k", "v").agg(sum("c").as("c")),
        root, id, keys)
      SumDeltaLog.maybeCompact(spark, root, id, keys, "c", maxDeltas = 3)
    }
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe expected.toMap
  }

  test("segment count stays bounded across 3x the threshold's worth of batches") {
    val root = tmpRoot()
    val maxDeltas = 4
    (0 until 3 * (maxDeltas + 1)).foreach { id =>
      SumDeltaLog.append(batchDf(Seq(("a", id.toLong % 5, 1L))), root, id, keys)
      SumDeltaLog.maybeCompact(spark, root, id, keys, "c", maxDeltas)
      SumDeltaLog.segments(spark, root).length should be <= (maxDeltas + 1)
    }
    // total counts survived every compaction
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get)
      .values.sum shouldBe (3 * (maxDeltas + 1)).toLong
  }

  test("a replayed batch overwrites its segment — counts never double") {
    val root = tmpRoot()
    SumDeltaLog.append(batchDf(Seq(("a", 1L, 5L))), root, 0, keys)
    SumDeltaLog.append(batchDf(Seq(("a", 1L, 7L))), root, 1, keys)
    // failure replay of batch 1
    SumDeltaLog.append(batchDf(Seq(("a", 1L, 7L))), root, 1, keys)
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe
      Map(("a", 1L) -> 12L)
  }

  test("replay AFTER compaction is a no-op — the base's watermark fences it") {
    val root = tmpRoot()
    // three batches, then compaction folds all of them into base c2
    (0 until 3).foreach { id =>
      SumDeltaLog.append(batchDf(Seq(("a", 1L, 10L))), root, id, keys)
    }
    SumDeltaLog.maybeCompact(spark, root, 2, keys, "c", maxDeltas = 1) shouldBe true
    SumDeltaLog.compactionWatermark(spark, root) shouldBe 2L
    // crash before the streaming checkpoint committed batch 2: the replayed
    // foreachBatch re-appends d2 — which c2 ALREADY contains. The watermark
    // makes the append a no-op instead of a double-count.
    SumDeltaLog.append(batchDf(Seq(("a", 1L, 10L))), root, 2, keys)
    SumDeltaLog.segments(spark, root).length shouldBe 1
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe
      Map(("a", 1L) -> 30L)
    // a genuinely NEW batch above the watermark still lands
    SumDeltaLog.append(batchDf(Seq(("a", 1L, 4L))), root, 3, keys)
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe
      Map(("a", 1L) -> 34L)
  }

  test("crash between the two renames: store lives at .tmp_old, reads recover it") {
    val root = tmpRoot()
    (0 until 4).foreach { id =>
      SumDeltaLog.append(batchDf(Seq(("a", id.toLong, 2L))), root, id, keys)
    }
    val before = asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get)
    // simulate the compactor dying AFTER target→backup, BEFORE tmp→target:
    // perform exactly the first rename by hand
    val seg = new Path(s"$root/seg")
    val fs = seg.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new Path(MergeOps.swapArtifact(s"$root/seg", ".tmp_old"))
    fs.rename(seg, backup) shouldBe true
    fs.exists(seg) shouldBe false
    // every read path recovers first — data intact, nothing double-counted
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe before
    fs.exists(seg) shouldBe true
    fs.exists(backup) shouldBe false
  }

  test("stale staging from a crashed compaction never pollutes the store") {
    val root = tmpRoot()
    (0 until 5).foreach { id =>
      SumDeltaLog.append(batchDf(Seq(("a", 1L, 1L))), root, id, keys)
    }
    // a previous compactor died mid-prepare, leaving hidden staging with
    // counts that MUST NOT be read or merged
    val staleTmp = MergeOps.swapArtifact(s"$root/seg", ".tmp_rewrite")
    batchDf(Seq(("a", 1L, 999L))).groupBy("k", "v").agg(sum("c").as("c"))
      .write.parquet(s"$staleTmp/c99")
    // hidden dot-path: plain reads skip it
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe
      Map(("a", 1L) -> 5L)
    // and the next compaction clears it before staging its own output
    SumDeltaLog.maybeCompact(spark, root, 5, keys, "c", maxDeltas = 2) shouldBe true
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe
      Map(("a", 1L) -> 5L)
    SumDeltaLog.segments(spark, root).length shouldBe 1
  }

  test("interrupt mid-compaction leaves state correct after recovery (thread kill)") {
    val root = tmpRoot()
    (0 until 6).foreach { id =>
      SumDeltaLog.append(batchDf(Seq(("a", id.toLong % 2, 3L))), root, id, keys)
    }
    val before = asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get)
    // run the compactor on a thread and interrupt it immediately: whatever
    // window the interrupt lands in, the store must read back unchanged
    val t = new Thread(() => {
      try SumDeltaLog.maybeCompact(spark, root, 6, keys, "c", maxDeltas = 2)
      catch { case _: Throwable => () }
      ()
    })
    t.start()
    t.interrupt()
    t.join(60000)
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe before
    // and a clean compaction afterwards still succeeds
    SumDeltaLog.maybeCompact(spark, root, 7, keys, "c", maxDeltas = 2)
    asMap(SumDeltaLog.collapsed(spark, root, keys, "c").get) shouldBe before
  }

  test("per-batch write volume scales with the batch, not the accumulated store") {
    val root = tmpRoot()
    var prevTotal = 0L
    val perBatch = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until 8).foreach { id =>
      SumDeltaLog.append(
        batchDf((0 until 20).map(j => ("k" + j % 4, j.toLong % 6, 1L)))
          .groupBy("k", "v").agg(sum("c").as("c")),
        root, id, keys)
      val total = SumDeltaLog.bytesUnder(spark, root)
      perBatch += (total - prevTotal)
      prevTotal = total
    }
    // every append writes about the same number of bytes (one batch's
    // counts) — no batch pays for history
    val head = perBatch.head.toDouble
    perBatch.foreach(b => b.toDouble should be < head * 2.0)
  }
}
