package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class HotspotsSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def measurements = {
    import spark.implicits._
    val stationary = (0 until 30).map(i =>
      ("aa:bb:cc:dd:ee:01", "OfficeNet", 40.0 + i * 0.00001, -75.0))
    val roaming = (0 until 30).map(i =>
      ("aa:bb:cc:dd:ee:02", "CarWifi", 40.0 + i * 0.01, -75.0 + i * 0.01))
    val tethering = (0 until 5).map(_ =>
      ("aa:bb:cc:dd:ee:03", "Alice's iPhone", 40.0, -75.0))
    val blacklisted = (0 until 5).map(_ =>
      ("00:23:6c:11:22:33", "innocuous", 40.0, -75.0))
    (stationary ++ roaming ++ tethering ++ blacklisted)
      .toDF("bssid", "ssid", "latitude", "longitude")
  }

  test("A10: spread, SSID pattern, and OUI each flag independently") {
    val verdicts = Hotspots.detect(measurements).collect()
      .map(r => r.getAs[String]("bssid") -> r).toMap
    verdicts("aa:bb:cc:dd:ee:01").getAs[Boolean]("is_hotspot") shouldBe false
    verdicts("aa:bb:cc:dd:ee:02").getAs[Boolean]("wide_spread") shouldBe true
    verdicts("aa:bb:cc:dd:ee:03").getAs[Boolean]("ssid_pattern") shouldBe true
    verdicts("00:23:6c:11:22:33").getAs[Boolean]("blacklisted_oui") shouldBe true
    Seq("aa:bb:cc:dd:ee:02", "aa:bb:cc:dd:ee:03", "00:23:6c:11:22:33").foreach { b =>
      verdicts(b).getAs[Boolean]("is_hotspot") shouldBe true
    }
  }

  test("A9 local outliers: lone far point flagged, dense cluster kept") {
    import spark.implicits._
    val cluster = (0 until 50).map(i =>
      ("ap", 40.0 + (i % 5) * 0.0001, -75.0 + (i / 5) * 0.0001))
    val lone = Seq(("ap", 40.5, -74.5))
    val df = (cluster ++ lone).toDF("bssid", "latitude", "longitude")
    val scored = Hotspots.localOutliers(df)
    scored.where("local_outlier").count() shouldBe 1
    scored.where("local_outlier").head.getAs[Double]("latitude") shouldBe 40.5
    // bucketed: no cartesian product in the plan
    scored.queryExecution.executedPlan.toString should not include "CartesianProduct"
  }
}
