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
}
