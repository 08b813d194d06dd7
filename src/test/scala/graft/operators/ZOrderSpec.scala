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

  test("clustered layout skips row groups that a row-major layout must read") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_zorder_skip").toString
    try {
      val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
        .toDF("x", "y")
      // row-major: sorted by x only, 16 files — every file spans all of y
      grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
        .write.parquet(root + "/rowmajor")
      ZOrder.clusterBy(grid.repartition(8), col("x"), col("y"), numFiles = 16)
        .write.parquet(root + "/zordered")

      def rowsScanned(path: String): Long = {
        val df = spark.read.parquet(path)
          .where(col("x") >= 8 && col("x") <= 15 && col("y") >= 8 && col("y") <= 15)
        df.collect().length shouldBe 64 // the 8x8 box, either layout
        df.queryExecution.executedPlan.collectLeaves()
          .map(_.metrics("numOutputRows").value).sum
      }
      val rowMajor = rowsScanned(root + "/rowmajor")
      val zOrdered = rowsScanned(root + "/zordered")
      // The x-range prunes both layouts to ~2/16 of files; only z-order ALSO
      // prunes on y (row-group min/max), so it must scan strictly less.
      zOrdered should be < rowMajor
      zOrdered should be < 4096L / 4
    } finally {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(root))
    }
  }
}
