package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Quality
import graft.localize.BatchLocalizer

/** Batch-localization queries exercising the R7 flatMapGroups path end to
  * end on the synthetic tables (user_id ≙ bssid; coordinates/RSSI/quality
  * synthesized deterministically from numeric columns with the engine's own
  * scalar functions).
  *
  * The per-group algorithm work (MLE gradient ascent) is not SQL-expressible,
  * so these register as rows-only checks; the numeric semantics are pinned by
  * `LocalizerSpec` instead. The tier COUNTS, however, are SQL-checkable and
  * oracled in `r7_tier_dispatch`.
  */
object LocalizeQueries {

  /** Full localizer over events: one shuffle localizes every key. */
  val batchLocalize: Reg = Reg.rowsOnly("r7_batch_localize") { (s, dir) =>
    implicit val spark = s
    val ev = Tables.events(s, dir)
    // Cluster each key's measurements within ~±150 m of a per-key anchor, the
    // shape real per-AP crowdsourced fixes have.
    val synth = ev.select(
      col("user_id").cast("string").as("bssid"),
      ((col("user_id") % 120) - 60 + (col("event_id") % 30) * 0.0001).as("lat"),
      ((col("user_id") % 300) - 150 + (col("event_id") % 37) * 0.0001).as("lon"),
      (-lit(30) - (col("event_id") % 70)).cast("double").as("rssi"),
      Quality.qualityWeight(
        when(col("event_type") === "purchase", "CONNECTED").otherwise("SCAN"),
        col("value"), -(col("user_id") % 100)).as("w"))
    val measurements = BatchLocalizer.fromColumns(synth, "bssid", "lat", "lon", "rssi", "w")
    BatchLocalizer.localizeAll(s, measurements)
      .toDF()
      .select(col("bssid"), round(col("lat"), 4).as("lat"), round(col("lon"), 4).as("lon"),
        col("n"), col("method"), round(col("confidence"), 3).as("confidence"))
      .orderBy("bssid")
  }

  val all: Seq[Reg] = Seq(batchLocalize)
}
