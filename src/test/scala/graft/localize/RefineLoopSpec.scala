package graft.localize

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite

/** The persisted-state feedback loop: fuse-with-prior, relocation reset,
  * and replay idempotence over a real parquet state table. */
class RefineLoopSpec extends AnyFunSuite with Matchers with SparkSuite {

  /** 30 fixes tightly around (40, -75) for one AP. */
  private def measurements(bssid: String) = {
    import spark.implicits._
    (0 until 30).map { k =>
      BatchLocalizer.Measurement(bssid,
        40.0 + (k % 5) * 0.00005, -75.0 + (k % 7) * 0.00005, -60.0 - (k % 10), 1.0)
    }.toDS()
  }

  test("no prior: state initializes to the batch estimate; replay is a no-op") {
    val statePath = Files.createTempDirectory("graft_rl").toString + "/state"
    val r1 = RefineLoop.run(spark, measurements("ap1"), statePath).collect()
    r1 should have size 1
    r1.head.getAs[Boolean]("applied") shouldBe true
    r1.head.getAs[Boolean]("relocated") shouldBe false
    r1.head.getAs[Double]("state_lat") shouldBe r1.head.getAs[Double]("est_lat")

    val r2 = RefineLoop.run(spark, measurements("ap1"), statePath).collect()
    r2.head.getAs[Boolean]("applied") shouldBe false
    // state survives untouched on disk
    val st = RefineLoop.readState(spark, statePath).toDF().collect()
    st should have size 1
    st.head.getAs[Long]("n") shouldBe r1.head.getAs[Long]("state_n")
  }

  test("nearby prior fuses (variance shrinks, no relocation)") {
    import spark.implicits._
    val statePath = Files.createTempDirectory("graft_rl").toString + "/state"
    RefineLoop.initState(spark, statePath,
      Seq(RefineLoop.StateRow("ap1", 40.00005, -75.00005, 400.0, 100L, 0, 0L))
        .toDS().toDF())
    val r = RefineLoop.run(spark, measurements("ap1"), statePath).collect().head
    r.getAs[Boolean]("relocated") shouldBe false
    r.getAs[Boolean]("applied") shouldBe true
    r.getAs[Double]("var_lat_m2") should be < 400.0 // posterior tighter than prior
    r.getAs[Double]("var_lon_m2") should be < 400.0
    r.getAs[Long]("state_n") shouldBe (100L + 30L)
  }

  test("far prior triggers the relocation reset") {
    import spark.implicits._
    val statePath = Files.createTempDirectory("graft_rl").toString + "/state"
    RefineLoop.initState(spark, statePath, // ~5.5 km away
      Seq(RefineLoop.StateRow("ap1", 40.05, -75.0, 100.0, 100L, 2, 0L))
        .toDS().toDF())
    val r = RefineLoop.run(spark, measurements("ap1"), statePath).collect().head
    r.getAs[Boolean]("relocated") shouldBe true
    r.getAs[Int]("relocations") shouldBe 3
    r.getAs[Double]("state_lat") shouldBe r.getAs[Double]("est_lat") // reset, not fused
    r.getAs[Double]("innovation_m") should be > 5000.0
  }

  test("below-bootstrap groups leave existing state untouched") {
    import spark.implicits._
    val statePath = Files.createTempDirectory("graft_rl").toString + "/state"
    RefineLoop.initState(spark, statePath,
      Seq(RefineLoop.StateRow("ap1", 40.0, -75.0, 100.0, 100L, 0, 7L))
        .toDS().toDF())
    val tiny = (0 until 5).map(k =>
      BatchLocalizer.Measurement("ap1", 40.0, -75.0, -60.0, 1.0)).toDS()
    RefineLoop.run(spark, tiny, statePath).count() shouldBe 0
    val st = RefineLoop.readState(spark, statePath).toDF().collect().head
    st.getAs[Long]("last_sig") shouldBe 7L // untouched
  }
}
