package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

class ZOrderSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def morton(x: Long, y: Long): Long = {
    import spark.implicits._
    Seq((x, y)).toDF("x", "y")
      .select(ZOrder.mortonCode(col("x"), col("y")).as("z"))
      .as[Long].head()
  }

  test("morton code interleaves x on even bits, y on odd bits") {
    morton(0L, 0L) shouldBe 0L
    morton(1L, 0L) shouldBe 1L
    morton(0L, 1L) shouldBe 2L
    morton(1L, 1L) shouldBe 3L
    morton(2L, 0L) shouldBe 4L
    morton(0xFFFFL, 0L) shouldBe 0x55555555L
    morton(0L, 0xFFFFL) shouldBe 0xAAAAAAAAL
    morton(0xFFFFL, 0xFFFFL) shouldBe 0xFFFFFFFFL
    // bit 7 of x -> bit 14; bit 7 of y -> bit 15
    morton(128L, 0L) shouldBe (1L << 14)
    morton(0L, 128L) shouldBe (1L << 15)
  }

  test("clusterBy yields compact rectangles per output partition on a grid") {
    import spark.implicits._
    val grid = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val clustered = ZOrder.clusterBy(
      grid.toDF("x", "y").repartition(8), col("x"), col("y"), numFiles = 16)
    val spans = clustered
      .groupBy(spark_partition_id().as("pid"))
      .agg((max("x") - min("x")).as("xs"), (max("y") - min("y")).as("ys"),
        count(lit(1)).as("cnt"))
      .collect()
    spans.length should be <= 16
    spans.map(_.getAs[Long]("cnt")).sum shouldBe 4096L
    // Z-ranges of a 64x64 grid cover block-ish regions: every partition must
    // be far more compact than a row-major layout (which pins one dim's
    // span at 63 in every slice).
    spans.foreach { r =>
      r.getAs[Long]("xs") should be <= 48L
      r.getAs[Long]("ys") should be <= 48L
    }
    // and at least one dimension is tight somewhere (true block structure)
    spans.map(r => math.min(r.getAs[Long]("xs"), r.getAs[Long]("ys"))).min should be <= 16L
  }
}
