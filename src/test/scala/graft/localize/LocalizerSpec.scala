package graft.localize

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.localize.BatchLocalizer.{localize, localizeAll, Measurement}

/** Pins the R7 maturity-tier batch localization semantics (PAPER.md:127-169)
  * and the distributed flatMapGroups path. */
class LocalizerSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def cluster(bssid: String, n: Int, lat: Double = 40.0, lon: Double = -75.0) =
    (0 until n).map { i =>
      // ring of measurements around the true AP position; nearer → stronger
      val angle = 2 * math.Pi * i / n
      val r = 0.0005 * (1 + (i % 3)) // 55–165 m
      Measurement(bssid, lat + r * math.cos(angle), lon + r * math.sin(angle),
        rssi = -50.0 - 10 * (i % 3), qualityWeight = 1.0 + (i % 2))
    }

  test("below the N>=20 bootstrap gate nothing is emitted") {
    localize("ap1", cluster("ap1", 19)) shouldBe None
  }

  test("tier dispatch: 20→wcl, 50→mle, 100→bayesian") {
    localize("a", cluster("a", 20)).get.method shouldBe "wcl"
    localize("a", cluster("a", 49)).get.method shouldBe "wcl"
    localize("a", cluster("a", 50)).get.method shouldBe "mle"
    localize("a", cluster("a", 99)).get.method shouldBe "mle"
    localize("a", cluster("a", 100)).get.method shouldBe "bayesian"
  }

  test("WCL weight = quality_weight * 10^(rssi/10): strong signals dominate") {
    val near = (0 until 15).map(i =>
      Measurement("a", 40.0001, -75.0, -40, 1.0))
    val far = (0 until 15).map(i =>
      Measurement("a", 40.01, -75.0, -90, 1.0))
    val (lat, _) = BatchLocalizer.wcl(near ++ far)
    // 10^(-4) vs 10^(-9) weights → estimate pinned to the strong cluster
    lat shouldBe 40.0001 +- 1e-5
  }

  test("MLE gradient ascends: refinement strictly increases the log-likelihood") {
    // Asymmetric two-cluster data where the WCL start is NOT the optimum:
    // weighted B-measurements drag the likelihood optimum away from the
    // WCL start, so a correct ascent must move and must improve LL. (The
    // pre-fix inverted gradient froze at the start on exactly this input.)
    val a = (0 until 30).map(i =>
      Measurement("ap", 40.0 + (i % 3) * 0.00005, -75.0, rssi = -45, qualityWeight = 1.0))
    val b = (0 until 30).map(i =>
      Measurement("ap", 40.0 + (i % 3) * 0.00005, -74.9945, rssi = -85, qualityWeight = 500.0))
    val ms = a ++ b

    // Same model constants as BatchLocalizer.mle.
    def ll(lat: Double, lon: Double): Double = ms.map { m =>
      val d = math.max(1.0, graft.algo.AlgoUtil.distanceMeters(
        lat, lon, None, m.latitude, m.longitude, None))
      val e = m.rssi - (-40.0 - 30.0 * math.log10(d))
      -(e * e) / (2 * 6.0 * 6.0) * m.qualityWeight
    }.sum

    val start = BatchLocalizer.wcl(ms)
    val refined = BatchLocalizer.mle(ms, start)
    refined should not be start
    ll(refined._1, refined._2) should be > ll(start._1, start._2)
  }

  test("estimates land near the true AP position for a symmetric ring") {
    val est = localize("a", cluster("a", 60)).get
    est.lat shouldBe 40.0 +- 0.001
    est.lon shouldBe -75.0 +- 0.001
    est.n shouldBe 60
    est.confidence should (be >= 0.1 and be <= 0.95)
  }

  test("localizeAll: one grouped pass over a Dataset, cap bounds group size") {
    import spark.implicits._
    val ms = (cluster("ap1", 60) ++ cluster("ap2", 25, lat = 41.0) ++
      cluster("tiny", 5)).toDS()
    val out = localizeAll(spark, ms, maxMeasurementsPerAp = 30).collect()
      .map(r => r.bssid -> r).toMap
    out.keySet shouldBe Set("ap1", "ap2")      // "tiny" below gate
    out("ap1").n shouldBe 30                    // capped at 30 (skew bound)
    out("ap1").method shouldBe "wcl"            // tier decided AFTER the cap
    out("ap2").lat shouldBe 41.0 +- 0.001
  }

  test("plan: localizeAll shuffles once on the group key (no crossJoin, no collect)") {
    import spark.implicits._
    val ms = cluster("ap1", 60).toDS()
    val plan = localizeAll(spark, ms).queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should include("Exchange") // exactly the one hash partitioning
  }
}
