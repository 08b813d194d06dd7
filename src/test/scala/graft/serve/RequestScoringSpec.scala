package graft.serve

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.serve.RequestScoring.{Request, ScanInput}

class RequestScoringSpec extends AnyFunSuite with Matchers with SparkSuite {

  private def apDim = {
    import spark.implicits._
    Seq(
      ("AA:BB:CC:DD:EE:01", 40.0018, -75.0000, Some(12.0), Some(8.0), Some(0.9), "cisco", "active"),
      ("AA:BB:CC:DD:EE:02", 39.9991, -75.0018, Some(10.0), Some(9.0), Some(0.8), "aruba", "active"),
      ("AA:BB:CC:DD:EE:03", 39.9991, -74.9982, None, Some(7.0), Some(0.85), "", "active"),
      ("AA:BB:CC:DD:EE:04", 45.0000, -70.0000, None, Some(7.0), Some(0.85), "", "expired"))
      .toDF("mac_addr", "latitude", "longitude", "altitude", "horizontal_accuracy",
        "confidence", "vendor", "status")
  }

  test("batch scoring: broadcast AP join + per-request positioner") {
    import spark.implicits._
    val requests = Seq(
      Request("good", Seq(
        ScanInput("aa:bb:cc:dd:ee:01", -58, 2437),
        ScanInput("AA-BB-CC-DD-EE-02", -66, 2437), // hyphen/case normalized
        ScanInput("aa:bb:cc:dd:ee:03", -71, 5180))),
      Request("unknown_aps", Seq(ScanInput("ff:00:00:00:00:01", -60, 2437))),
      Request("expired_only", Seq(ScanInput("aa:bb:cc:dd:ee:04", -50, 2437)))).toDS()

    val responses = RequestScoring.score(spark, requests, apDim)
    val byId = responses.collect().map(r => r.requestId -> r).toMap

    byId("good").ok shouldBe true
    byId("good").latitude shouldBe 40.0 +- 0.01
    byId("good").longitude shouldBe -75.0 +- 0.01
    byId("good").apCount shouldBe 3
    byId("good").methodsUsed should not be empty

    byId("unknown_aps").ok shouldBe false
    byId("expired_only").ok shouldBe false // J3 status filter leaves nothing

    val plan = RequestScoring.score(spark, requests, apDim)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }
}
