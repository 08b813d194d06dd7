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

  private val DayMs = 86400000L

  private def dateOf(tsMillis: Long): String =
    java.time.Instant.ofEpochMilli(tsMillis)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString

  /** (name, length, mtime, checksum) of every data file in a partition dir. */
  private def fileSignatures(dir: String): Seq[(String, Long, Long, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq.filter(_.isFile).map { st =>
      (st.getPath.getName, st.getLen, st.getModificationTime,
        String.valueOf(fs.getFileChecksum(st.getPath)))
    }.sortBy(_._1)
  }

  test("micro-batch merge rewrites only its own date partitions") {
    val root = Files.createTempDirectory("graft_stream_part")
    // Two input dirs = two micro-batch deliveries (one dir + a fresh
    // checkpoint would re-deliver batch 1's files too, touching yesterday).
    val in1 = Files.createDirectory(root.resolve("in1")).toString
    val in2 = Files.createDirectory(root.resolve("in2")).toString
    val table = root.resolve("table").toString

    // Batch 1: one record yesterday, one today → two date partitions.
    val yesterday = NowMs - DayMs
    Files.write(java.nio.file.Paths.get(in1, "b1.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:01", yesterday)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:02", NowMs - 2000))))
    val q1 = IngestStream.writer(
      IngestStream.fromFiles(spark, in1, cfg = cfg), table,
      root.resolve("ckpt1").toString).start()
    q1.awaitTermination()

    val yesterdayDir = s"$table/${IngestStream.PartitionCol}=${dateOf(yesterday)}"
    val before = fileSignatures(yesterdayDir)
    before should not be empty

    // Batch 2: today-only records (one new + one replay) → today's partition
    // merges, yesterday's files must stay BYTE-IDENTICAL (not even rewritten
    // with equal content — same files, same mtimes).
    Files.write(java.nio.file.Paths.get(in2, "b2.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:03", NowMs - 3000)),
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:02", NowMs - 2000))))
    val q2 = IngestStream.writer(
      IngestStream.fromFiles(spark, in2, cfg = cfg), table,
      root.resolve("ckpt2").toString).start()
    q2.awaitTermination()

    fileSignatures(yesterdayDir) shouldBe before
    val t = spark.read.parquet(table)
    t.count() shouldBe 3
    t.select("event_id").distinct().count() shouldBe 3
  }

  test("replay after a mid-rename partition crash restores it instead of dropping it") {
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

    // Simulate a partition rewrite that died between its two renames: the
    // date directory has been moved aside to its hidden backup and nothing
    // swapped in — a normal read now silently skips those rows.
    val day = dateOf(NowMs - 1000)
    val partDir = s"$table/${IngestStream.PartitionCol}=$day"
    val fs = new org.apache.hadoop.fs.Path(table)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(partDir),
      new org.apache.hadoop.fs.Path(
        graft.mutation.MergeOps.swapArtifact(partDir, ".tmp_old"))))

    // Redelivered batch (fresh checkpoint) on the same date: must recover
    // the partition, then merge — NOT re-create it from the batch alone.
    Files.write(java.nio.file.Paths.get(in, "b2.txt"), java.util.Arrays.asList(
      Codec.encodeLine(scanJson("aa:bb:cc:dd:ee:03", NowMs - 3000))))
    val q2 = IngestStream.writer(
      IngestStream.fromFiles(spark, in, cfg = cfg), table,
      root.resolve("ckpt2").toString).start()
    q2.awaitTermination()

    spark.read.parquet(table).count() shouldBe 3
  }
}
