package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.algo.AccessPoint

/** S-layer: sources, sinks and lookups (SURVEY §2.1) re-expressed Spark-first.
  */
object Sources {

  /** S1 — Kafka batch consume: the reference polls ≤150 msgs with manual ack
    * (`wifi-scan-ingestion/.../WifiScanBatchMessageListener.java`;
    * `application.yml:96-101`). Structured Streaming equivalent: offsets are
    * the ack (checkpointed after sink success), `maxOffsetsPerTrigger` is
    * the poll cap. No broker exists in this environment — this constructor
    * is exercised for plan construction only. */
  def kafkaLines(
      spark: SparkSession,
      bootstrapServers: String,
      topic: String,
      maxOffsetsPerTrigger: Long = 150): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("maxOffsetsPerTrigger", maxOffsetsPerTrigger)
      .load()
      .select(col("value").cast("string").as("value"))

  /** S4 — S3 ObjectCreated event parse (`FeedEventParser.java:78-84,130-181`):
    * SQS body JSON → (bucket, key, size, etag, event_time), validating
    * eventSource and the bucket name shape. Invalid events → null fields,
    * filtered — same drop-not-fail stance as the ingest chain. */
  val s3EventSchema: StructType = StructType(Seq(
    StructField("Records", ArrayType(StructType(Seq(
      StructField("eventSource", StringType),
      StructField("eventTime", StringType),
      StructField("s3", StructType(Seq(
        StructField("bucket", StructType(Seq(StructField("name", StringType)))),
        StructField("object", StructType(Seq(
          StructField("key", StringType),
          StructField("size", LongType),
          StructField("eTag", StringType)))))))))))))

  def parseS3Events(events: DataFrame, bodyCol: String = "body"): DataFrame =
    events
      .select(from_json(col(bodyCol), s3EventSchema).as("e"))
      .select(explode(col("e.Records")).as("r"))
      .where(col("r.eventSource") === "aws:s3")
      .select(
        col("r.s3.bucket.name").as("bucket"),
        col("r.s3.object.key").as("key"),
        col("r.s3.object.size").as("size"),
        col("r.s3.object.eTag").as("etag"),
        to_timestamp(col("r.eventTime")).as("event_time"))
      .where(col("bucket").rlike("^[a-z0-9][a-z0-9.-]{1,61}[a-z0-9]$") &&
        col("etag").rlike("^[a-fA-F0-9]{32}$"))

  /** S6 — feed-type dispatch (`FeedProcessorFactory.java`): route rows by a
    * feed-type column derived from the object key prefix; unknown types go
    * to the default processor (reference's DefaultFeedProcessor accepts all). */
  def feedType(key: Column): Column =
    when(key.startsWith("wifi-scan/"), "wifi_scan")
      .when(key.startsWith("connected-events/"), "connected_events")
      .otherwise("default")

  /** S8 — AP point lookup ≙ predicate-pushdown scan of the dimension table. */
  def apLookup(apTable: DataFrame, mac: String): DataFrame =
    apTable.where(col("mac_addr") === lit(mac))

  /** S9 — batch get ≙ broadcast semi-join of the requested MAC set against
    * the dimension (`WifiAccessPointRepositoryImpl.java:150-225`; the 100-key
    * chunking is obsolete — broadcast handles any request size in one join). */
  def apBatchGet(spark: SparkSession, apTable: DataFrame, macs: Seq[String]): DataFrame = {
    import spark.implicits._
    apTable.join(broadcast(macs.toDF("mac_addr")), Seq("mac_addr"), "left_semi")
  }

  /** S9 driver-side variant for request scoring: collect the (small) matched
    * subset to AccessPoint objects for the pure-Scala Positioner. */
  def apBatchGetLocal(
      spark: SparkSession, apTable: DataFrame, macs: Seq[String]): Seq[AccessPoint] =
    apBatchGet(spark, apTable, macs).collect().toSeq.map { r =>
      def optD(n: String) = if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
      def optS(n: String) = Option(r.getAs[String](n)).filter(_.nonEmpty)
      AccessPoint(
        mac = r.getAs[String]("mac_addr"),
        lat = r.getAs[Double]("latitude"),
        lon = r.getAs[Double]("longitude"),
        altitude = optD("altitude"),
        horizontalAccuracy = optD("horizontal_accuracy"),
        confidence = optD("confidence"),
        vendor = optS("vendor"),
        status = Option(r.getAs[String]("status")).getOrElse(AccessPoint.StatusActive))
    }

  /** S10 — AP state write: refined locations back to the dimension as a
    * [[graft.mutation.VersionedTable]] merge-on-read upsert keyed on
    * mac_addr — O(changed keys) bytes per write, never a dimension
    * rewrite (the reference golden-record store is per-key upserts,
    * `WifiAccessPointLocationRepositoryImpl.java`). Read back with
    * [[readApState]]; delete debt is retired out-of-band by
    * `VersionedTable.morMaterialize`. */
  def writeApState(spark: SparkSession, path: String, updates: DataFrame): Unit = {
    import graft.mutation.VersionedTable
    if (VersionedTable.currentVersion(spark, path).isEmpty)
      VersionedTable.create(spark, path, updates)
    else
      VersionedTable.morUpsert(spark, path, updates, Seq("mac_addr"))
    ()
  }

  /** Current AP state dimension at head (deletes applied). */
  def readApState(spark: SparkSession, path: String): DataFrame =
    graft.mutation.VersionedTable.read(spark, path)

  /** S3-sink parity — the Firehose limits become writer options: bound file
    * sizes via records-per-file (500-record batches,
    * `application.yml:139-142`); at 100 TB you set
    * `spark.sql.files.maxRecordsPerFile` / target file size instead of
    * hand-rolled buffering (F20 falls away entirely). */
  def batchedSink(df: DataFrame, path: String, maxRecordsPerFile: Int = 500): Unit =
    df.write.option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .mode("append").parquet(path)
}
