package graft.functions

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** Point-in-polygon: the column expression must agree with an independent
  * scalar ray-caster on randomized lattice points over a NON-CONVEX
  * polygon, and get the hand-checkable cases right. */
class GeoSpec extends AnyFunSuite with Matchers with SparkSuite {

  // non-convex hexagon (notch at (10, -1))
  private val poly = Seq(
    (-8L, -6L), (9L, -7L), (7L, 2L), (1L, -1L), (3L, 8L), (-6L, 5L))

  /** Independent scalar reference: textbook ray cast with the same
    * cross-multiplied strict comparisons. */
  private def refInside(px: Long, py: Long): Boolean = {
    var k = 0
    for (i <- poly.indices) {
      val (x1, y1) = poly(i)
      val (x2, y2) = poly((i + 1) % poly.length)
      if ((y1 > py) != (y2 > py)) {
        val lhs = (px - x1) * (y2 - y1)
        val rhs = (x2 - x1) * (py - y1)
        if (if (y2 - y1 > 0) lhs < rhs else lhs > rhs) k += 1
      }
    }
    k % 2 == 1
  }

  test("pointInPolygon agrees with the scalar ray-caster on a lattice sweep") {
    import spark.implicits._
    val pts = for (x <- -10L to 10L; y <- -10L to 10L) yield (x, y)
    val out = pts.toDF("px", "py")
      .withColumn("inside", Geo.pointInPolygon(F.col("px"), F.col("py"), poly))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2))
      .toMap
    pts.foreach { case (x, y) =>
      withClue(s"($x, $y): ") { out((x, y)) shouldBe refInside(x, y) }
    }
  }

  test("pointInPolygonT ≡ static pointInPolygon under translation") {
    import spark.implicits._
    // T with offsets (dx, dy) on point (px, py) must equal the static
    // form on the back-shifted point (px − dx, py − dy)
    val rnd = new scala.util.Random(77)
    val rows = Seq.fill(300)((rnd.nextInt(41) - 20L, rnd.nextInt(41) - 20L,
      (rnd.nextInt(5) - 2L) * 7L, (rnd.nextInt(5) - 2L) * 9L))
    val out = rows.toDF("px", "py", "dx", "dy")
      .withColumn("t", Geo.pointInPolygonT(
        F.col("px"), F.col("py"), F.col("dx"), F.col("dy"), poly))
      .withColumn("ref", Geo.pointInPolygon(
        F.col("px") - F.col("dx"), F.col("py") - F.col("dy"), poly))
    out.where(F.col("t") =!= F.col("ref")).count() shouldBe 0
    // and the translated polygons genuinely contain some of the sweep
    out.where(F.col("t")).count() should be > 0L
  }

  test("hand-checked containment: deep inside, outside, and inside the notch") {
    import spark.implicits._
    val cases = Seq(
      (0L, 0L, true), // well inside the hull, left of the notch vertex
      (-20L, 0L, false), // far west
      (0L, 20L, false), // far north
      (5L, 1L, true), // east lobe
      (4L, 4L, false) // inside the hull's bounding box but in the notch
    )
    val out = cases.map(c => (c._1, c._2)).toDF("px", "py")
      .withColumn("inside", Geo.pointInPolygon(F.col("px"), F.col("py"), poly))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
    cases.foreach { case (x, y, want) =>
      withClue(s"($x, $y): ") { out((x, y)) shouldBe want }
    }
  }
}
