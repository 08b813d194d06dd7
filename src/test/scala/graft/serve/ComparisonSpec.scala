package graft.serve

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** C1–C5 comparison layer semantics (`ComparisonScenario.java:99-165`,
  * `ComparisonService.java:288-299`). */
class ComparisonSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("C3 scenario classification covers every branch") {
    import spark.implicits._
    val cases = Seq(
      // (vlssSuccess, friscoSuccess, friscoError, vlssAccuracy, expected)
      (None, Some(true), None, None, "FRISCO_ONLY_ANALYSIS"),
      (Some(true), Some(true), None, Some(30.0), "BOTH_WIFI_SUCCESS"),
      (Some(true), Some(false), Some("Insufficient access point data"), Some(400.0),
        "VLSS_CELL_FALLBACK_DETECTED"),
      (Some(true), Some(false), Some("timeout"), Some(400.0), "VLSS_SUCCESS_FRISCO_ERROR_CELL"),
      (Some(true), Some(false), Some("timeout"), Some(50.0), "VLSS_SUCCESS_FRISCO_ERROR_WIFI"),
      (Some(false), Some(true), None, None, "VLSS_ERROR_FRISCO_SUCCESS"),
      (Some(false), Some(false), None, None, "BOTH_INSUFFICIENT_DATA"))
    val df = cases.map(c => (c._1, c._2, c._3, c._4)).toDF("v", "f", "err", "acc")
    val got = df.select(Comparison.scenario(col("v"), col("f"), col("err"), col("acc")))
      .collect().map(_.getString(0))
    got shouldBe cases.map(_._5).toArray
  }

  test("C1/C2 metrics: haversine + quadrature uncertainty + verdict") {
    import spark.implicits._
    val paired = Seq((40.0, -75.0, 30.0, 40.0, -74.999, 40.0))
      .toDF("vlss_lat", "vlss_lon", "vlss_accuracy", "frisco_lat", "frisco_lon",
        "frisco_accuracy")
    val r = Comparison.withComparisonMetrics(paired).collect().head
    r.getAs[Double]("distance_m") shouldBe 85.0 +- 1.0 // ~85 m per 0.001° lon at 40N
    r.getAs[Double]("expected_uncertainty_m") shouldBe math.sqrt(30 * 30 + 40 * 40) +- 1e-9
    r.getAs[Boolean]("within_expected") shouldBe false // 85 > 50
  }

  test("C5 request mapping: explode + MAC normalization + renames") {
    import spark.implicits._
    val external = Seq(
      ("req1", "clientA", Seq(("AA-BB-CC-DD-EE-01", -60, 2437), ("AA:BB:CC:DD:EE:02", -70, 5180))))
      .toDF("id", "client", "wifiInfo")
      .withColumn("wifiInfo", transform(col("wifiInfo"),
        s => struct(s.getField("_1").as("macAddress"), s.getField("_2").as("rssi"),
          s.getField("_3").as("frequency"))))
    val mapped = Comparison.mapExternalRequest(external).collect()
    mapped.length shouldBe 2
    mapped.map(_.getAs[String]("mac")).sorted shouldBe
      Array("aa:bb:cc:dd:ee:01", "aa:bb:cc:dd:ee:02")
    mapped.head.getAs[Double]("signal_strength") shouldBe -60.0
  }

  test("C4 AP enrichment left-joins diagnostics onto request APs") {
    import spark.implicits._
    val req = Seq(("r1", "aa", -60), ("r1", "bb", -70)).toDF("request_id", "mac", "rssi")
    val calc = Seq(("r1", "aa", "active", "used", 40.0, -75.0))
      .toDF("request_id", "mac", "status", "usage", "lat", "lon")
    val enriched = Comparison.enrichAccessPoints(req, calc).collect()
    enriched.length shouldBe 2
    val byMac = enriched.map(r => r.getStruct(1).getAs[String]("mac") -> r.getStruct(1)).toMap
    byMac("aa").getAs[String]("status") shouldBe "active"
    byMac("bb").getAs[String]("status") shouldBe null // unknown AP: no diagnostics
  }
}
