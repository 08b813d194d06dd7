package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.functions.Codec
import graft.ingest.ScanIngest

/** Streaming ingest: file source → F1–F17 → watermark dedup → idempotent
  * foreachBatch merge. Replayed input must not double-write (the
  * at-least-once + event_id-dedup contract, §2.9). */
class IngestStreamSpec extends AnyFunSuite with Matchers with SparkSuite {

  private val NowMs = 1700000000000L
  private val cfg = ScanIngest.Config(nowMillis = Some(NowMs))

  private def scanJson(bssid: String, ts: Long): String =
    s"""{"osVersion":"14","model":"m","device":"d","manufacturer":"acme",
       |"appNameVersion":"v","dataVersion":"1.0","wifiConnectedEvents":[],
       |"scanResults":[{"timestamp":$ts,"mode":"active",
       |"location":{"source":"fused","provider":"gps","latitude":40.0,"longitude":-75.0,
       |"altitude":5.0,"accuracy":20.0,"speed":0.0,"bearing":0.0,"time":$ts},
       |"results":[{"ssid":"s","bssid":"$bssid","scantime":$ts,"rssi":-60,"level":2}]}]}"""
      .stripMargin.replaceAll("\n", "")

  test("end-to-end: files stream in, duplicates collapse, replays stay idempotent") {
    val root = Files.createTempDirectory("graft_stream")
    val in = Files.createDirectory(root.resolve("in")).toString
    val table = root.resolve("table").toString
    val ckpt1 = root.resolve("ckpt1").toString

    // Batch 1: two distinct records + one in-file duplicate.
    Files.write(java.nio.file.Paths.get(in, "b1.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:01", NowMs - 1000)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:02", NowMs - 2000)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:01", NowMs - 1000))))

    val q1 = IngestStream.writer(
      IngestStream.fromFiles(spark, in, cfg = cfg), table, ckpt1).start()
    q1.awaitTermination()
    spark.read.parquet(table).count() shouldBe 2 // dedup within the batch

    // Batch 2: one new record + a REPLAY of record 1 (fresh checkpoint to
    // simulate at-least-once redelivery) → merge stays idempotent.
    Files.write(java.nio.file.Paths.get(in, "b2.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:03", NowMs - 3000)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:01", NowMs - 1000))))
    val q2 = IngestStream.writer(
      IngestStream.fromFiles(spark, in, cfg = cfg), table,
      root.resolve("ckpt2").toString).start()
    q2.awaitTermination()

    val t = spark.read.parquet(table)
    t.count() shouldBe 3 // e01 replay merged, not duplicated
    t.select("event_id").distinct().count() shouldBe 3
  }

  test("replay after a mid-rename crash restores the table instead of re-creating it") {
    val root = Files.createTempDirectory("graft_stream_crash")
    val in = Files.createDirectory(root.resolve("in")).toString
    val table = root.resolve("table").toString

    Files.write(java.nio.file.Paths.get(in, "b1.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:01", NowMs - 1000)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:02", NowMs - 2000))))
    val q1 = IngestStream.writer(
      IngestStream.fromFiles(spark, in, cfg = cfg), table,
      root.resolve("ckpt1").toString).start()
    q1.awaitTermination()
    spark.read.parquet(table).count() shouldBe 2

    // Simulate a mergeByKey that died between its two renames: the table
    // directory has been moved aside to the hidden backup and nothing
    // swapped in.
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(table),
      new org.apache.hadoop.fs.Path(
        graft.mutation.MergeOps.swapArtifact(table, ".tmp_old"))))

    // Redelivered batch (fresh checkpoint): must recover the 2 prior rows,
    // then merge — NOT re-create the table containing only the new record.
    Files.write(java.nio.file.Paths.get(in, "b2.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:03", NowMs - 3000))))
    val q2 = IngestStream.writer(
      IngestStream.fromFiles(spark, in, cfg = cfg), table,
      root.resolve("ckpt2").toString).start()
    q2.awaitTermination()

    spark.read.parquet(table).count() shouldBe 3
  }
}
