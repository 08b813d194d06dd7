package graft.serve

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.algo.{AccessPoint, Positioner, WifiScan}

/** Batch request scoring — the REST positioning flow (§3.2) as a Spark job:
  * `Dataset[Request]` → broadcast AP join → per-request pure-Scala
  * `Positioner` → `Dataset[Response]`.
  *
  * Distribution shape: scans explode, hit the AP dimension with a broadcast
  * hash join (J1/J2 — the fact side never shuffles for the lookup), then
  * regroup by request id; each group runs the R1–R6 flow as a plain
  * function. The reference's thread pool + 5 s timeouts (R5) are replaced by
  * partition parallelism over requests — a million requests score in one
  * job, which is the batch-A/B-testing use the comparison layer (C1–C5)
  * consumes.
  */
object RequestScoring {

  final case class ScanInput(mac: String, rssi: Double, frequencyMhz: Int)
  final case class Request(requestId: String, scans: Seq[ScanInput])

  final case class Response(
      requestId: String,
      ok: Boolean,
      error: String,
      latitude: Double,
      longitude: Double,
      altitude: Double,
      accuracy: Double,
      confidence: Double,
      methodsUsed: Seq[String],
      apCount: Int)

  /** Score every request against the AP dimension table (columns: mac_addr,
    * latitude, longitude, altitude?, horizontal_accuracy?, confidence?,
    * vendor?, status). */
  def score(spark: SparkSession, requests: Dataset[Request], apDim: DataFrame): Dataset[Response] = {
    import spark.implicits._

    val exploded = requests.toDF()
      .select(col("requestId"), explode(col("scans")).as("scan"))
      .select(col("requestId"),
        graft.ingest.ScanIngest.normalizeBssid(col("scan.mac")).as("mac"),
        col("scan.rssi"), col("scan.frequencyMhz"))

    val dim = apDim.select(
      graft.ingest.ScanIngest.normalizeBssid(col("mac_addr")).as("ap_mac"),
      col("latitude"), col("longitude"),
      col("altitude"), col("horizontal_accuracy"), col("confidence"),
      col("vendor"), col("status"))

    // Broadcast hash join: each scan row picks up its AP (or nulls).
    val joined = exploded.join(broadcast(dim), col("mac") === col("ap_mac"), "left")

    joined
      .groupByKey(_.getAs[String]("requestId"))
      .mapGroups { (requestId, rows) =>
        // Sort for determinism: shuffle fetch order is arbitrary, and scan
        // order feeds pair enumeration (P3) and the LSQ reference row (P4).
        val buf = rows.toSeq.sortBy(r => (r.getAs[String]("mac"), r.getAs[Double]("rssi")))
        val scans = buf.map(r =>
          WifiScan(r.getAs[String]("mac"), r.getAs[Double]("rssi"),
            r.getAs[Int]("frequencyMhz")))
        val aps = buf.filter(r => !r.isNullAt(r.fieldIndex("ap_mac"))).map { r =>
          def optD(n: String) =
            if (r.isNullAt(r.fieldIndex(n))) None else Some(r.getAs[Double](n))
          AccessPoint(
            mac = r.getAs[String]("ap_mac"),
            lat = r.getAs[Double]("latitude"),
            lon = r.getAs[Double]("longitude"),
            altitude = optD("altitude"),
            horizontalAccuracy = optD("horizontal_accuracy"),
            confidence = optD("confidence"),
            vendor = Option(r.getAs[String]("vendor")).filter(_.nonEmpty),
            status = Option(r.getAs[String]("status")).getOrElse(AccessPoint.StatusActive))
        }.distinct
        Positioner.calculatePosition(scans, aps) match {
          case Right(res) =>
            Response(requestId, ok = true, error = "",
              res.position.lat, res.position.lon, res.position.alt,
              res.position.accuracy, res.position.confidence,
              res.algorithmsUsed, aps.size)
          case Left(err) =>
            Response(requestId, ok = false, error = err,
              0.0, 0.0, 0.0, 0.0, 0.0, Nil, aps.size)
        }
      }
  }
}
