package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.ingest.ScanIngest

/** §2.9 — streaming ingest wrapper: micro-batch at-least-once with
  * idempotent delivery, the Structured-Streaming rendering of the
  * reference's SQS → transform → Firehose loop
  * (`SqsMessageReceiver.java`; config `application.yml:112-118`;
  * dedup window `application.yml:171`).
  *
  * Shape: file/text source (one line = one wire record) → F1–F17 chain →
  * event-time watermark + dropDuplicates(event_id) → sink. At-least-once +
  * keyed dedup = effectively-once on event_id, matching the reference's
  * manual-ack + 5 s dedup design. Rate limiting (75 msg/s etc.) maps to
  * `maxFilesPerTrigger` on the source.
  *
  * State stays bounded: the watermark evicts dedup state older than
  * `dedupWindow` — the policy decision the reference never had to make
  * (SURVEY §7.5.5).
  */
object IngestStream {

  /** Wire lines stream → deduplicated measurement stream. */
  def measurements(
      lines: DataFrame,
      cfg: ScanIngest.Config = ScanIngest.Config(),
      dedupWindow: String = "10 minutes"): DataFrame = {
    val enriched = ScanIngest.ingest(lines, cfg)
      .withColumn("event_time", timestamp_millis(col("measurement_timestamp")))
      .withWatermark("event_time", dedupWindow)
    // dropDuplicatesWithinWatermark lets the watermark actually EVICT dedup
    // state; plain dropDuplicates("event_id") would keep every key forever
    // (the watermark only bounds state when an event-time column is part of
    // the dedup keys). Batch plans have no watermark semantics — plain
    // dedup there.
    if (enriched.isStreaming) enriched.dropDuplicatesWithinWatermark("event_id")
    else enriched.dropDuplicates("event_id")
  }

  /** File-source convenience: watch `inputDir` for wire files. */
  def fromFiles(
      spark: SparkSession,
      inputDir: String,
      maxFilesPerTrigger: Int = 10,
      cfg: ScanIngest.Config = ScanIngest.Config()): DataFrame =
    measurements(
      spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .text(inputDir),
      cfg)

  /** Sink via foreachBatch upsert into the ingestion-date layout —
    * idempotent on event_id, so replayed micro-batches (at-least-once
    * source) cannot double-write.
    *
    * The merge is PARTITION-SCOPED (`MergeOps.mergeByKeyPartitioned`): a
    * micro-batch only rewrites the `ingest_date=` directories its records
    * fall in — at 100 TB a batch touches today's partition, never the
    * table. The partition value derives from the record's measurement
    * timestamp, NOT wall clock: a replayed record must land in the SAME
    * partition it originally went to or the dedup merge can't see the
    * earlier copy (the schema doc's ingestion-date layout with the
    * replay-stable date choice). Brand-new dates are created by the merge
    * (`insertUnmatched`); partition-level crash recovery runs inside it. */
  val PartitionCol = "ingest_date"

  def writer(
      stream: DataFrame,
      tablePath: String,
      checkpointDir: String): DataStreamWriter[Row] =
    stream
      .drop("event_time")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val withDate = batch.withColumn(
          PartitionCol, to_date(timestamp_millis(col("measurement_timestamp"))))
        graft.mutation.MergeOps.mergeByKeyPartitioned(
          spark, tablePath, PartitionCol, withDate, "event_id",
          insertUnmatched = true)
        ()
      }
}
