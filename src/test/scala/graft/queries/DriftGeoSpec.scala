package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Invariants for the chi-square drift monitor and forward geodesy. */
class DriftGeoSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("chi-square: matches an independent contingency-table computation") {
    val r = LlmQueries.driftChi2.build(spark, sfDir).head()
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang").collect()
      .map(x => (if (x.getString(0) == "src0") "a" else "b", x.getString(1)))
    val obs = docs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val groups = docs.map(_._1).distinct
    val langs = docs.map(_._2).distinct
    val rowT = groups.map(g => g -> docs.count(_._1 == g).toLong).toMap
    val colT = langs.map(l => l -> docs.count(_._2 == l).toLong).toMap
    val n = docs.length.toDouble
    val chi2Micro = (for (g <- groups; l <- langs) yield {
      val o = obs.getOrElse((g, l), 0L).toDouble
      val e = rowT(g).toDouble * colT(l).toDouble / n
      math.floor(((o - e) * (o - e) / e) * 1e6).toLong
    }).sum
    r.getLong(0) shouldBe rowT("a")
    r.getLong(1) shouldBe rowT("b")
    r.getLong(2) shouldBe (langs.length - 1).toLong
    r.getLong(3) shouldBe chi2Micro
  }

  test("geodesy: destination points land 500 m from their origins") {
    val rows = AnalyticsQueries.c7GeodesicOps.build(spark, sfDir).collect()
    rows.length should be > 0
    // rebuild each origin from the synthesis rule, then check the
    // haversine distance to the emitted destination is 500 m (± the
    // micro-degree quantization)
    val ev = Tables.events(spark, sfDir)
      .where(org.apache.spark.sql.functions.col("event_id") % 101 === 0)
      .select("event_id", "user_id").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
      val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
      val (dp, dl) = (math.toRadians(lat2 - lat1), math.toRadians(lon2 - lon1))
      val a = math.pow(math.sin(dp / 2), 2) +
        math.cos(p1) * math.cos(p2) * math.pow(math.sin(dl / 2), 2)
      2 * 6371000.0 * math.asin(math.sqrt(a))
    }
    for (r <- rows) {
      val (id, u) = (r.getLong(0), ev(r.getLong(0)))
      val lat = (u % 90) + (id % 25) * 0.0003
      val lon = ((u % 180) - 90) + (id % 23) * 0.0003
      val d = hav(lat, lon, r.getLong(2) / 1e6, r.getLong(3) / 1e6)
      withClue(s"point $id") { d shouldBe 500.0 +- 0.5 }
      // bearing toward a point north-east of the origin stays in (0°, 90°)
      r.getLong(1) should (be > 0L and be < 90000000L)
    }
  }
}
