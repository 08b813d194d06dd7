package graft.queries

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSuite, Tables}

/** Invariants for the KMV sketch, expectations suite, and Holt smoothing. */
class SketchSmoothingSpec extends AnyFunSuite with Matchers with SparkSuite {

  test("KMV: exact below k, and set-algebra bounds hold") {
    val r = AnalyticsQueries.o27KmvDistinct.build(spark, sfDir).head()
    val Seq(estA, estB, estU, estI, trueA, trueB, trueU, trueI) =
      (0 to 7).map(r.getLong)
    // sf0.001 has fewer than k=256 distinct customers per status: the
    // sketch holds every hash, so estimates must be EXACT
    if (trueA < 256 && trueB < 256 && trueU < 256) {
      estA shouldBe trueA
      estB shouldBe trueB
      estU shouldBe trueU
      estI shouldBe trueI
    }
    estU should be >= math.max(estA, estB)
    estI should be <= math.min(estA, estB)
    estI should be >= 0L
  }

  test("expectations: fused counts equal independently-computed violations") {
    val rows = AnalyticsQueries.a29Expectations.build(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    rows.size shouldBe 8
    val liDf = Tables.lineitem(spark, sfDir)
    val ordDf = Tables.orders(spark, sfDir)
    val li = liDf.count()
    val ord = ordDf.count()
    // independent per-constraint computations (un-fused, separate scans)
    val expect = Map(
      "lineitem.pk_unique" -> (li, li -
        liDf.select("l_orderkey", "l_linenumber").distinct().count()),
      "lineitem.quantity_range" -> (li,
        liDf.where(F.col("l_quantity") < 1 || F.col("l_quantity") > 50).count()),
      "lineitem.price_nonneg" -> (li,
        liDf.where(F.col("l_extendedprice") < 0).count()),
      "lineitem.orderkey_complete" -> (li,
        liDf.where(F.col("l_orderkey").isNull).count()),
      "lineitem.discount_policy" -> (li,
        liDf.where(F.col("l_discount") > 0.08).count()),
      "lineitem.fk_orders" -> (li,
        liDf.join(ordDf, F.col("l_orderkey") === F.col("o_orderkey"),
          "left_anti").count()),
      "orders.status_domain" -> (ord,
        ordDf.where(!F.col("o_orderstatus").isin("O", "F", "P")).count()),
      "orders.date_range" -> (ord, 0L))
    for ((name, (total, viol)) <- expect) withClue(name) {
      rows(name) shouldBe ((total, viol, if (viol == 0) "PASS" else "FAIL"))
    }
    // the generator's discounts reach 0.10 — the 0.08 policy must FAIL
    rows("lineitem.discount_policy")._3 shouldBe "FAIL"
  }

  test("Holt smoothing: matches an independent sequential Scala recursion") {
    val events = Tables.events(spark, sfDir)
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getDouble(3)))
    val expect = events.groupBy(_._1).view.mapValues { es =>
      val xs = es.sortBy(e => (e._2, e._3))
        .map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact)
      var l = xs(0).toDouble
      var b = (xs(1) - xs(0)).toDouble
      for (i <- 1 until xs.length) {
        val lNew = 0.5 * xs(i).toDouble + 0.5 * (l + b)
        b = 0.5 * (lNew - l) + 0.5 * b
        l = lNew
      }
      (xs.length.toLong, math.floor(l).toLong, math.floor(b).toLong,
        math.floor(l + b).toLong)
    }.toMap
    val got = AnalyticsQueries.o28HoltLinear.build(spark, sfDir).collect()
    got.length shouldBe expect.size
    for (r <- got) withClue(s"user ${r.getLong(0)}") {
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) shouldBe
        expect(r.getLong(0))
    }
  }
}
