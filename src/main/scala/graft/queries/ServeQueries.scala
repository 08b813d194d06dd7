package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.serve.RequestScoring
import graft.serve.RequestScoring.{Request, ScanInput}

/** R5 batch request scoring end to end on synthetic data: the AP dimension
  * derives from supplier, requests from events (user ≙ device, scans pick
  * APs by event id). Rows-only — the per-request algorithm flow is the
  * pure-Scala R1–R6 engine pinned by SelectionSpec/AlgorithmsSpec. */
object ServeQueries {

  val batchScoring: Reg = Reg.rowsOnly("r5_batch_scoring") { (s, dir) =>
    import s.implicits._

    // AP dimension: one AP per supplier, clustered positions, mixed vendors
    // and statuses (every 10th AP expired → J3 must drop it).
    val apDim = Tables.supplier(s, dir).select(
      concat(lit("aa:bb:cc:dd:"),
        format_string("%02x", col("s_suppkey") % 250), lit(":"),
        format_string("%02x", (col("s_suppkey") * 7) % 250)).as("mac_addr"),
      ((col("s_suppkey") % 120) - 60 + (col("s_suppkey") % 10) * 0.0005).as("latitude"),
      ((col("s_suppkey") % 300) - 150 + (col("s_suppkey") % 7) * 0.0005).as("longitude"),
      when(col("s_suppkey") % 3 === 0, col("s_acctbal") / 1000).as("altitude"),
      (lit(5.0) + col("s_suppkey") % 10).as("horizontal_accuracy"),
      (lit(0.7) + (col("s_suppkey") % 3) * 0.1).as("confidence"),
      when(col("s_suppkey") % 4 === 0, "cisco")
        .when(col("s_suppkey") % 4 === 1, "aruba").otherwise("").as("vendor"),
      when(col("s_suppkey") % 10 === 0, "expired").otherwise("active").as("status"))

    // Requests: per user, up to 6 scans of APs near the user's own cluster
    // so geometry is realistic (RSSI from the event value).
    val nAps = 100
    val requests = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"))
      .withColumn("supp", (col("user_id") * 3 + col("event_id") % 5) % nAps)
      .select(col("user_id").cast("string").as("requestId"),
        concat(lit("aa:bb:cc:dd:"),
          format_string("%02x", col("supp") % 250), lit(":"),
          format_string("%02x", (col("supp") * 7) % 250)).as("mac"),
        (-lit(45) - (col("value") % 50)).cast("double").as("rssi"),
        when(col("event_id") % 2 === 0, 2437).otherwise(5180).as("frequencyMhz"))
      // one scan per (request, AP): strongest observation wins — otherwise
      // the kept subset collapses onto one MAC and every request becomes a
      // single-AP proximity case
      .groupBy("requestId", "mac")
      .agg(max(struct(col("rssi"), col("frequencyMhz"))).as("m"))
      .select(col("requestId"),
        struct(col("mac"), col("m.rssi").as("rssi"),
          col("m.frequencyMhz").as("frequencyMhz")).as("scan"))
      .groupBy("requestId")
      // sort_array makes the kept subset deterministic (collect_list order
      // follows arbitrary shuffle fetch order)
      .agg(slice(sort_array(collect_list(col("scan"))), 1, 6).as("scans"))
      .as[Request]

    RequestScoring.score(s, requests, apDim)
      .toDF()
      .select(
        when(col("ok"), "scored").otherwise(col("error")).as("outcome"),
        col("confidence"), col("apCount"))
      .groupBy("outcome")
      .agg(count(lit(1)).as("cnt"),
        round(avg("confidence"), 3).as("avg_confidence"),
        round(avg("apCount"), 2).as("avg_aps"))
      .orderBy("outcome")
  }

  val all: Seq[Reg] = Seq(batchScoring)
}
