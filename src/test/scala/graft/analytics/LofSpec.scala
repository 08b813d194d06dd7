package graft.analytics

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** True LOF over geocell buckets: a planted point just outside a uniform
  * grid must get the top score, deep-cluster points must sit near 1, and a
  * point isolated by more than a cell is unscoreable (NULL, k_used 0). */
class LofSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def score(points: Seq[(String, Long, Double, Double)]) = {
    import spark.implicits._
    Lof.score(points.toDF("bssid", "point_id", "latitude", "longitude"))
      .collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getLong(4)))
      .toMap
  }

  // 7×7 grid at 30 m pitch (0.00027°), one AP.
  private val grid = for {
    i <- 0 until 7; j <- 0 until 7
  } yield ("ap1", (i * 7 + j).toLong, 40.0 + i * 0.00027, -75.0 + j * 0.00027)

  test("planted point outside the grid has the highest LOF, well above 1") {
    val planted = ("ap1", 900L, 40.0 + 6 * 0.00027 + 0.0012, -75.0 + 3 * 0.00027)
    val scores = score(grid :+ planted)
    val lofs = scores.collect { case (id, (Some(l), _)) => id -> l }
    lofs(900L) shouldBe lofs.values.max
    lofs(900L) should be > 2.0
    // interior grid points are locally normal
    val interior = lofs(3 * 7 + 3)
    interior should be < 1.2
  }

  test("a point isolated by more than a cell gets NULL lof and k_used 0") {
    val lonely = ("ap1", 901L, 40.5, -75.5)
    val scores = score(grid :+ lonely)
    scores(901L) shouldBe ((None, 0L))
  }

  test("neighborhoods never cross APs") {
    val other = ("ap2", 902L, 40.0 + 3 * 0.00027, -75.0 + 3 * 0.00027)
    val scores = score(grid :+ other)
    scores(902L) shouldBe ((None, 0L)) // alone on its own AP
  }

  test("over-dense cells are dropped whole by the guardrail") {
    val dense = (0 until 50).map(n =>
      ("ap3", (1000 + n).toLong, 40.0 + n * 1e-6, -75.0))
    import spark.implicits._
    val out = Lof.score(
      (grid ++ dense).toDF("bssid", "point_id", "latitude", "longitude"),
      Lof.Config(maxCellPoints = 40))
    out.where("bssid = 'ap3'").count() shouldBe 0 // dropped, not mis-scored
    out.where("bssid = 'ap1'").count() shouldBe grid.size.toLong
  }

  test("single-pass and two-phase-pruned kNN plans score bit-identically") {
    // mixed shape: a dense blob (interior points prune all 8 neighbors),
    // a sparse ring (own-cell < k, probes everything), cell-edge hoverers
    // (the prune's boundary case), a planted outlier, and a second AP
    val pts = grid ++
      (0 until 40).map(n => // dense blob inside one cell
        ("ap1", (2000 + n).toLong,
          40.00300 + (n % 7) * 1e-5, -75.00300 + (n / 7) * 1e-5)) ++
      (0 until 12).map(n => // points hugging a cell boundary
        ("ap1", (3000 + n).toLong,
          40.0015 + (n % 2) * 2e-6 - 1e-6, -75.0 + n * 3e-4)) :+
      ("ap1", 900L, 40.0 + 6 * 0.00027 + 0.0012, -75.0 + 3 * 0.00027) :+
      ("ap2", 902L, 40.0001, -75.0001) :+
      ("ap2", 903L, 40.0002, -75.0002)
    import spark.implicits._
    val df = pts.toDF("bssid", "point_id", "latitude", "longitude")
    def rows(minMean: Double) =
      Lof.score(df, Lof.Config(minMeanCellForPrune = minMean))
        .orderBy("bssid", "point_id").collect().toSeq
    // threshold 0 forces the two-phase prune; MaxValue forces single-pass
    val pruned = rows(0.0)
    val single = rows(Double.MaxValue)
    pruned.length shouldBe single.length
    pruned.zip(single).foreach { case (a, b) =>
      // identical points, identical kNN sets (k_used exact); the LOF float
      // itself may differ by ~1 ulp because the two plans feed the lrd/avg
      // sums in different row orders — the oracle's 4-decimal round
      // absorbs it, and this gate pins it to strictly tighter than that
      (a.getString(0), a.getLong(1), a.getLong(4)) shouldBe
        (b.getString(0), b.getLong(1), b.getLong(4))
      (a.isNullAt(5), b.isNullAt(5)) match {
        case (false, false) =>
          math.abs(a.getDouble(5) - b.getDouble(5)) should be <=
            1e-12 * math.max(1.0, math.abs(b.getDouble(5)))
        case (na, nb) => na shouldBe nb
      }
    }
  }
}
